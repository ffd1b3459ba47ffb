"""Star-schema ETL plans (dimension + fact builds) over testdata."""

from __future__ import annotations
