"""Sessionization / event-window operators over the events table."""

from __future__ import annotations
