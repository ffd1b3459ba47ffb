"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard, embedding."""

from __future__ import annotations
