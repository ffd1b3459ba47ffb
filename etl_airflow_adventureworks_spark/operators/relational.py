"""Relational core operators (SURVEY.md §2 ops 7-18, 26-27) as declared queries."""

from __future__ import annotations
