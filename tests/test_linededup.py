"""Line-level boilerplate removal: exact DuckDB parity on planted
corpora (scrub/decontam precedent — driver-gate strictness, no registry
slot), semantic edge cases, and the zero-Python plan contract."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from etl_airflow_adventureworks_spark.operators.linededup import (
    boilerplate_lines,
    remove_boilerplate_lines,
)

BANNER = "Accept cookies to continue"
FOOTER = "(c) 2024 Example Corp — all rights reserved"
NAV = "Home | Products | About"


def _corpus():
    """12 docs: shared banner/footer/nav boilerplate, unique bodies,
    empty lines, a whitespace/case variant of the banner, one doc that is
    pure boilerplate, one empty doc, one doc with no boilerplate."""
    rows = []
    for i in range(8):
        rows.append(
            (
                i,
                f"{BANNER}\nbody {i} alpha\n\nbody {i} beta\n{FOOTER}",
                "web",
            )
        )
    rows.append((8, f"  {BANNER.upper()}  \nunique eight", "web"))  # variant
    rows.append((9, f"{BANNER}\n{NAV}\n{FOOTER}", "web"))  # pure boilerplate
    rows.append((10, "", "web"))  # empty doc
    rows.append((11, "totally unique\nno boilerplate here", "books"))
    rows.append((12, f"{NAV}\nbody twelve", "books"))
    return rows


def _duck_expect(rows, min_docs, normalize=True, keep_first=False):
    con = duckdb.connect()
    con.register("docs", pd.DataFrame(rows, columns=["doc_id", "text", "source"]))
    key = "lower(trim(line))" if normalize else "line"
    first = " OR doc_id = first_doc" if keep_first else ""
    out = con.execute(
        f"""
        WITH lines AS (
          SELECT doc_id,
                 unnest(string_split(text, chr(10))) AS line,
                 generate_subscripts(string_split(text, chr(10)), 1) AS pos
          FROM docs
        ), keyed AS (
          SELECT doc_id, pos, line, {key} AS k FROM lines
        ), counts AS (
          SELECT k, count(DISTINCT doc_id) AS n_docs, min(doc_id) AS first_doc
          FROM keyed WHERE trim(k) <> '' GROUP BY k HAVING count(DISTINCT doc_id) >= {min_docs}
        ), kept AS (
          SELECT doc_id, pos, line FROM keyed LEFT JOIN counts USING (k)
          WHERE n_docs IS NULL{first}
        )
        SELECT d.doc_id, coalesce(s.t, '') AS text
        FROM docs d LEFT JOIN (
          SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS t
          FROM kept GROUP BY doc_id
        ) s USING (doc_id)
        """
    ).df()
    con.close()
    return dict(zip(out["doc_id"], out["text"]))


def _spark_result(spark, rows, **kw):
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = remove_boilerplate_lines(docs, **kw)
    return {r["doc_id"]: r["text"] for r in got.collect()}, got


@pytest.mark.parametrize("min_docs", [2, 3, 9])
def test_duckdb_parity(spark, min_docs):
    rows = _corpus()
    got, _ = _spark_result(spark, rows, min_docs=min_docs)
    want = _duck_expect(rows, min_docs)
    assert got == want


def test_duckdb_parity_keep_first(spark):
    rows = _corpus()
    got, _ = _spark_result(spark, rows, min_docs=2, keep_first=True)
    want = _duck_expect(rows, 2, keep_first=True)
    assert got == want
    # the surviving banner copy sits in the smallest doc id (0)
    assert BANNER in got[0]
    assert BANNER not in got[3]


def test_semantics_on_planted_corpus(spark):
    rows = _corpus()
    got, out_df = _spark_result(spark, rows, min_docs=2)
    # banner/footer/nav removed everywhere (incl. case/space variant docs)
    for i in range(8):
        assert got[i] == f"body {i} alpha\n\nbody {i} beta"
    assert got[8] == "unique eight"  # normalized variant matched
    assert got[9] == ""  # pure-boilerplate doc survives, empty
    assert got[10] == ""  # empty doc round-trips
    assert got[11] == "totally unique\nno boilerplate here"  # untouched
    # every document survives; non-text columns pass through; schema stable
    assert len(got) == len(rows)
    assert out_df.columns == ["doc_id", "text", "source"]
    assert {r["source"] for r in out_df.collect()} == {"web", "books"}


def test_no_boilerplate_roundtrips_byte_identical(spark):
    rows = _corpus()
    got, _ = _spark_result(spark, rows, min_docs=99)
    assert got == {i: t for i, t, _ in rows}


def test_normalize_off_is_exact_match(spark):
    rows = _corpus()
    got, _ = _spark_result(spark, rows, min_docs=2, normalize=False)
    # the upper-case variant no longer matches the banner → doc 8 keeps it
    assert got[8] == f"  {BANNER.upper()}  \nunique eight"
    assert BANNER not in got[0]


def test_literal_separator_with_regex_metachar(spark):
    rows = [
        (1, f"{BANNER}.unique one.end", "s"),
        (2, f"{BANNER}.unique two.end", "s"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        r["doc_id"]: r["text"]
        for r in remove_boilerplate_lines(docs, sep=".", min_docs=2).collect()
    }
    # '.' split literally (not regex-any-char); banner and 'end' recur in
    # both docs → removed; the unique middles survive
    assert got == {1: "unique one", 2: "unique two"}


def test_boilerplate_lines_standalone(spark):
    docs = spark.createDataFrame(
        _corpus(), "doc_id long, text string, source string"
    )
    b = {
        r["line_key"]: (r["n_docs"], r["first_doc"])
        for r in boilerplate_lines(docs, min_docs=2).collect()
    }
    assert b[BANNER.lower()] == (10, 0)
    assert b[FOOTER.lower()] == (9, 0)
    assert b[NAV.lower()] == (2, 9)
    assert "body 0 alpha" not in b


def test_reserved_column_collision_raises(spark):
    docs = spark.createDataFrame(
        [(1, "x", "y")], "doc_id long, text string, line_key string"
    )
    with pytest.raises(ValueError, match="collide"):
        remove_boilerplate_lines(docs)


def test_plan_is_python_free(spark):
    docs = spark.createDataFrame(
        _corpus(), "doc_id long, text string, source string"
    )
    df = remove_boilerplate_lines(docs, min_docs=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Generate posexplode" in plan  # the narrow line explode


def test_whitespace_only_lines_survive_without_normalize(spark):
    # ADVICE r7: with normalize=False a raw '  ' line passed the
    # line_key != '' guard and could be removed corpus-wide, breaking the
    # byte-identical round-trip guarantee; whitespace-only lines are
    # structure under either normalize mode
    rows = [
        (1, "alpha\n  \nbeta", "s"),
        (2, "gamma\n  \ndelta", "s"),
        (3, "shared line\n  \nend one", "s"),
        (4, "shared line\n  \nend two", "s"),
    ]
    got, _ = _spark_result(spark, rows, min_docs=2, normalize=False)
    want = _duck_expect(rows, 2, normalize=False)
    assert got == want
    # docs with no (non-whitespace) boilerplate round-trip byte-identical
    assert got[1] == "alpha\n  \nbeta"
    assert got[2] == "gamma\n  \ndelta"
    # real boilerplate still removed, whitespace line untouched
    assert got[3] == "  \nend one" and got[4] == "  \nend two"


def test_null_text_stays_null(spark):
    # r7 review finding: NULL text (no lines) must stay NULL — '' would
    # make downstream exact-dedup merge never-had-text docs with emptied
    # ones
    docs = spark.createDataFrame(
        [(1, None, "s"), (2, f"{BANNER}\nkeep", "s"), (3, f"{BANNER}\nx", "s")],
        "doc_id long, text string, source string",
    )
    got = {
        r["doc_id"]: r["text"]
        for r in remove_boilerplate_lines(docs, min_docs=2).collect()
    }
    assert got[1] is None
    assert got[2] == "keep" and got[3] == "x"
