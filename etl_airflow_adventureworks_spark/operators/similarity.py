"""Similarity search over embedding columns: brute-force cosine top-k, LSH-bucketed ANN."""

from __future__ import annotations
