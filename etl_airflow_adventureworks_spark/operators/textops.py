"""Text analysis operators: tokenization, language-ID, quality scoring, fingerprinting."""

from __future__ import annotations
