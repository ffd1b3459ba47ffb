"""Vector math over embedding array columns — native Catalyst expressions.

All folds run left-to-right in float64 (`aggregate` over `zip_with`), keeping
the arithmetic inside whole-stage codegen — no Python, no UDF, no Arrow
round-trip. At 100 TB the embedding scans dominate; these expressions add
zero serialization cost on top of the columnar read.
"""

from __future__ import annotations

#: SQL expression fragments (selectExpr-able) — single source of truth.


def to_double_array(col: str) -> str:
    """array<float> → array<double> (compute in f64 for cross-engine parity)."""
    return f"transform({col}, x -> CAST(x AS DOUBLE))"


def dot(a: str, b: str) -> str:
    """Sequential-fold dot product of two array<double> columns."""
    return f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)"


def norm(a: str) -> str:
    return f"sqrt({dot(a, a)})"


def cosine(a: str, b: str) -> str:
    return f"({dot(a, b)} / ({norm(a)} * {norm(b)}))"
