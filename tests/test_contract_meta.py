"""Contract meta-tests: invariants the driver relies on, guarded so future
rounds can't silently drift (names, docstrings, oracle view usage)."""

from __future__ import annotations

import re

import __spark_entry__ as entrymod

TABLES = {
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
}


def test_every_query_documented():
    for name, fn in entrymod.queries().items():
        assert fn.__doc__ and len(fn.__doc__) > 20, f"{name} lacks a docstring"


def test_oracles_reference_only_registered_views():
    # every FROM/JOIN target in oracle SQL must be a driver-registered view
    # (or a CTE defined in the same statement)
    for name, sql in entrymod.oracle_sql().items():
        ctes = set(re.findall(r"(\w+)\s+AS\s*\(", sql))
        targets = set(
            t.lower()
            for t in re.findall(r"(?:FROM|JOIN)\s+([A-Za-z_][A-Za-z0-9_]*)", sql, re.I)
        )
        unknown = targets - TABLES - {c.lower() for c in ctes} - {"generate_series"}
        assert not unknown, f"{name}: oracle references unknown tables {unknown}"


def test_names_are_stable_identifiers():
    for name in entrymod.queries():
        assert re.fullmatch(r"[a-z0-9_]+", name), name


def test_entry_uses_registered_query():
    # entry() must stay wired to a declared query (smoke + correctness agree)
    assert "kpi05_top5_products" in entrymod.queries()
