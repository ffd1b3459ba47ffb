"""The reference's own ETL pipelines on the original AdventureWorks CSVs.

Faithful re-expression (not translation) of the six reference DAGs
(dags/etl_dim_*.py, dags/etl_fato_vendas.py) as lazy Catalyst plans, run
against the reference's CSV extracts where present. Golden row counts from
the reference's recorded run (SURVEY.md §6): dim_produto 504,
dim_localidade 19,614, dim_tempo 5,844, dim_cliente 19,820, dim_vendedor 17,
fato_vendas 121,317.

The snapshot at /root/reference/dags/data/ lacks `Person Person.csv`,
`Sales SalesOrderHeader.csv` and `Sales SalesOrderDetail.csv` (large blobs),
so dim_cliente / dim_vendedor / fato_vendas are buildable only when those
files exist — each builder raises FileNotFoundError otherwise and the tests
skip.

PERMANENT SKIP (adjudicated round 4): the three files cannot be
regenerated in this environment — no other AdventureWorks distribution is
present and the container has no network, and the remaining 85 CSVs don't
contain the person/order data. The builders stay correct-by-construction:
their logic is fully exercised against synthetic schema twins with planted
edge cases in tests/test_adventureworks_synthetic.py, and the golden-count
tests activate automatically on any checkout that carries the full CSV set.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalar import (
    classify_nullable,
    default_if_empty,
    full_name,
    month_name_pt,
    semester,
    yyyymmdd_key,
)
from ..sources.csv import read_csv_columns

REFERENCE_DATA = "/root/reference/dags/data"


def _csv(spark: SparkSession, data_path: str, table: str, columns: dict[str, str]) -> DataFrame:
    path = f"{data_path}/{table}.csv"
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    return read_csv_columns(spark, path, columns)


def dim_produto(spark: SparkSession, data_path: str = REFERENCE_DATA) -> DataFrame:
    """Product dimension (dags/etl_dim_produto.py:12-61): product left-join
    subcategory left-join category (op 14, shared keys), project+rename
    (ops 7, 9), fillna N/A / Sem Subcategoria / Sem Categoria (op 28)."""
    product = _csv(
        spark,
        data_path,
        "Production Product",
        {"ProductID": "int", "Name": "string", "Color": "string", "ProductSubcategoryID": "int"},
    )
    subcat = _csv(
        spark,
        data_path,
        "Production ProductSubcategory",
        {"ProductSubcategoryID": "int", "ProductCategoryID": "int", "Name": "string"},
    )
    cat = _csv(
        spark, data_path, "Production ProductCategory", {"ProductCategoryID": "int", "Name": "string"}
    )
    # qualify name collisions via aliases instead of pandas _x/_y suffixes
    subcat = subcat.withColumnRenamed("Name", "Nome_Subcategoria")
    cat = cat.withColumnRenamed("Name", "Nome_Categoria")
    return (
        product.join(F.broadcast(subcat), "ProductSubcategoryID", "left")
        .join(F.broadcast(cat), "ProductCategoryID", "left")
        .select(
            F.col("ProductID").alias("id_produto_original"),
            F.col("Name").alias("nome_produto"),
            F.col("Nome_Subcategoria").alias("nome_subcategoria"),
            F.col("Nome_Categoria").alias("nome_categoria"),
            F.col("Color").alias("cor"),
        )
        .na.fill(
            {
                "cor": "N/A",
                "nome_subcategoria": "Sem Subcategoria",
                "nome_categoria": "Sem Categoria",
            }
        )
    )


def dim_localidade(spark: SparkSession, data_path: str = REFERENCE_DATA) -> DataFrame:
    """Geography dimension (dags/etl_dim_localidade.py:11-72): address →
    state → country snowflake flattening (op 16), early rename to predisarm
    key collisions (op 9), fills (op 28), keyed dedup (op 27)."""
    address = _csv(
        spark,
        data_path,
        "Person Address",
        {"AddressID": "int", "City": "string", "StateProvinceID": "int"},
    )
    state = _csv(
        spark,
        data_path,
        "Person StateProvince",
        {"StateProvinceID": "int", "CountryRegionCode": "string", "Name": "string"},
    ).withColumnRenamed("Name", "Nome_Estado")
    country = _csv(
        spark, data_path, "Person CountryRegion", {"CountryRegionCode": "string", "Name": "string"}
    ).withColumnRenamed("Name", "Nome_Pais")
    return (
        address.join(F.broadcast(state), "StateProvinceID", "left")
        .join(F.broadcast(country), "CountryRegionCode", "left")
        .select(
            F.col("AddressID").alias("id_endereco_original"),
            F.col("City").alias("cidade"),
            F.col("Nome_Estado").alias("estado"),
            F.col("Nome_Pais").alias("pais"),
        )
        .na.fill({"cidade": "Desconhecida", "estado": "Não Informado", "pais": "Não Informado"})
        .dropDuplicates(["id_endereco_original"])
    )


def dim_cliente(spark: SparkSession, data_path: str = REFERENCE_DATA) -> DataFrame:
    """Customer dimension (dags/etl_dim_cliente.py:9-64): customer left-join
    person on differing keys (op 15), name concat (op 29), empty→corporate
    default (op 12), Individual/Store classification (op 13), dedup (op 27)."""
    customer = _csv(
        spark, data_path, "Sales Customer", {"CustomerID": "int", "PersonID": "int"}
    )
    person = _csv(
        spark,
        data_path,
        "Person Person",
        {
            "BusinessEntityID": "int",
            "FirstName": "string",
            "MiddleName": "string",
            "LastName": "string",
        },
    )
    joined = customer.join(
        F.broadcast(person), customer["PersonID"] == person["BusinessEntityID"], "left"
    )
    nome = full_name(F.col("FirstName"), F.col("MiddleName"), F.col("LastName"))
    return (
        joined.select(
            F.col("CustomerID").alias("id_cliente_original"),
            default_if_empty(nome, "Cliente Corporativo / Loja").alias("nome_completo"),
            classify_nullable(F.col("PersonID"), "Individual", "Store").alias("tipo_cliente"),
        )
        .dropDuplicates(["id_cliente_original"])
    )


def dim_vendedor(spark: SparkSession, data_path: str = REFERENCE_DATA) -> DataFrame:
    """Salesperson dimension (dags/etl_dim_vendedor.py:10-75): salesperson →
    employee → person chained left joins (op 16), 3-part name concat with
    double-space collapse (op 29), fills (op 28), dedup (op 27)."""
    sp = _csv(spark, data_path, "Sales SalesPerson", {"BusinessEntityID": "int"})
    emp = _csv(
        spark,
        data_path,
        "HumanResources Employee",
        {"BusinessEntityID": "int", "JobTitle": "string"},
    )
    person = _csv(
        spark,
        data_path,
        "Person Person",
        {
            "BusinessEntityID": "int",
            "FirstName": "string",
            "MiddleName": "string",
            "LastName": "string",
        },
    )
    joined = (
        sp.join(F.broadcast(emp), "BusinessEntityID", "left")
        .join(F.broadcast(person), "BusinessEntityID", "left")
    )
    return (
        joined.select(
            F.col("BusinessEntityID").alias("id_vendedor_original"),
            full_name(F.col("FirstName"), F.col("MiddleName"), F.col("LastName")).alias(
                "nome_vendedor"
            ),
            F.col("JobTitle").alias("cargo"),
        )
        .na.fill({"cargo": "Não Informado"})
        .dropDuplicates(["id_vendedor_original"])
    )


def dim_tempo(spark: SparkSession, start: str = "2010-01-01", end: str = "2025-12-31") -> DataFrame:
    """Calendar dimension (dags/etl_dim_tempo.py:8-46): generated date range
    (op 3) with parts (op 31), pt-BR names (op 33), semester (op 32) and the
    YYYYMMDD surrogate (op 34). 5,844 rows for the reference range."""
    d = F.col("data_completa")
    return spark.range(1).select(
        F.explode(
            F.sequence(F.lit(start).cast("date"), F.lit(end).cast("date"), F.expr("interval 1 day"))
        ).alias("data_completa")
    ).select(
        yyyymmdd_key(d).alias("sk_tempo"),
        d,
        F.year(d).alias("ano"),
        F.month(d).alias("mes"),
        month_name_pt(F.month(d)).alias("nome_mes"),
        F.quarter(d).alias("trimestre"),
        semester(F.month(d)).alias("semestre"),
    )


def fato_vendas(
    spark: SparkSession,
    dims: dict[str, DataFrame],
    data_path: str = REFERENCE_DATA,
) -> DataFrame:
    """Sales fact (dags/etl_fato_vendas.py:9-123): header×detail inner join
    (op 17), OrderDate→sk_tempo (ops 30, 34), four broadcast dimension
    lookups on natural keys (op 18), money metrics in exact decimals
    (op 35), referential-integrity dropna (op 10). NULL SalesPersonID rows
    survive with a null FK (online sales, KPIs.sql:75 semantics).

    ``dims`` carries the materialized dimension DataFrames keyed
    produto/cliente/localidade/vendedor with (sk, natural id) columns —
    the reference reads these back from Postgres (etl_fato_vendas.py:17-24).
    """
    header = _csv(
        spark,
        data_path,
        "Sales SalesOrderHeader",
        {
            "SalesOrderID": "int",
            "OrderDate": "string",
            "CustomerID": "int",
            "SalesPersonID": "int",
            "ShipToAddressID": "int",
        },
    )
    detail = _csv(
        spark,
        data_path,
        "Sales SalesOrderDetail",
        {
            "SalesOrderID": "int",
            "ProductID": "int",
            "OrderQty": "int",
            "UnitPrice": "decimal(18,2)",
            "UnitPriceDiscount": "decimal(18,4)",
        },
    )
    dp = dims["produto"].select("sk_produto", "id_produto_original")
    dc = dims["cliente"].select("sk_cliente", "id_cliente_original")
    dl = dims["localidade"].select("sk_localidade", "id_endereco_original")
    dv = dims["vendedor"].select("sk_vendedor", "id_vendedor_original")

    fact = header.join(detail, "SalesOrderID", "inner").withColumn(
        "sk_tempo", yyyymmdd_key(F.to_timestamp("OrderDate"))
    )
    fact = (
        fact.join(F.broadcast(dp), fact["ProductID"] == dp["id_produto_original"], "left")
        .join(F.broadcast(dc), fact["CustomerID"] == dc["id_cliente_original"], "left")
        .join(F.broadcast(dl), fact["ShipToAddressID"] == dl["id_endereco_original"], "left")
        .join(F.broadcast(dv), fact["SalesPersonID"] == dv["id_vendedor_original"], "left")
    )
    bruto = F.col("UnitPrice") * F.col("OrderQty")
    return (
        fact.na.drop(subset=["sk_produto", "sk_cliente", "sk_tempo"])
        .select(
            "sk_produto",
            "sk_cliente",
            "sk_tempo",
            "sk_localidade",
            "sk_vendedor",
            F.col("OrderQty").alias("qtd_vendida"),
            F.col("UnitPrice").alias("valor_unitario"),
            (bruto * F.col("UnitPriceDiscount")).cast("decimal(18,2)").alias("valor_desconto"),
            (bruto * (F.lit(1) - F.col("UnitPriceDiscount")))
            .cast("decimal(18,2)")
            .alias("valor_total"),
        )
    )
