"""etl_airflow_adventureworks_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference repo
Cgmc18/ETL-AirFlow-AdventureWorks (a pandas + Airflow + Postgres star-schema
ETL pipeline, see /root/repo/SURVEY.md) as an idiomatic PySpark library:

- ``sources``    — scans: parquet/CSV (explicit schemas), row generators, JDBC.
- ``functions``  — scalar/expression layer: null policies, name concat, date
                   parts, YYYYMMDD smart keys, exact-decimal money math,
                   text analysis, vector math.
- ``operators``  — relational + LLM-pipeline operators: joins, dedup (exact,
                   MinHash-LSH, SimHash, n-gram Jaccard, embedding),
                   similarity search, sessionization, multimodal plumbing.
- ``plans``      — composed pipelines: the star-schema dimension/fact builds
                   and the 10 KPI analytical queries.
- ``streaming``  — Structured Streaming equivalents over the events table.
- ``registry``   — the declared-query registry consumed by __spark_entry__.

Everything is lazy DataFrame composition — no Python UDFs on reference
semantics, no collect() in transforms; Catalyst owns the physical plan.
"""

__version__ = "0.1.0"
