"""Source-layer unit tests: CSV null semantics, JSON payload source."""

from __future__ import annotations

from etl_airflow_adventureworks_spark.sources.csv import read_csv_columns
from etl_airflow_adventureworks_spark.sources.http_json import read_json_payload


def test_csv_empty_string_is_null_like_pandas(spark, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text('id,name,color\n1,"Widget",""\n2,"",red\n3,Plain,\n')
    df = read_csv_columns(
        spark, str(p), {"id": "int", "name": "string", "color": "string"}
    )
    rows = {r["id"]: r for r in df.collect()}
    # quoted-empty AND unquoted-empty both become NULL (pandas NaN parity)
    assert rows[1]["color"] is None
    assert rows[2]["name"] is None
    assert rows[3]["color"] is None
    assert rows[1]["name"] == "Widget"


def test_json_payload_source(spark):
    df = read_json_payload(
        spark, [{"id": 1, "tag": "a"}, {"id": 2, "tag": "b"}]
    )
    assert sorted(map(tuple, df.select("id", "tag").collect())) == [(1, "a"), (2, "b")]
    single = read_json_payload(spark, {"id": 9, "tag": "x"})
    assert single.count() == 1
