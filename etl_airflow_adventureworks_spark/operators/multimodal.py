"""Multimodal (binary) column plumbing: decode/feature-extract via mapInPandas."""

from __future__ import annotations
