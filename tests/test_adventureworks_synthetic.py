"""The reference pipelines whose input CSVs are absent from the snapshot
(Person / SalesOrderHeader / SalesOrderDetail), run on synthetic CSVs that
encode every FIXTURES.md §5 edge case: dup business keys, NULL PersonID,
matched-but-empty names, missing middle names (double-space collapse),
orphan FK lines, NULL SalesPersonID surviving with null FK, discount 0/>0.
"""

from __future__ import annotations

import pytest

from etl_airflow_adventureworks_spark.plans import adventureworks as aw


@pytest.fixture(scope="module")
def data_path(tmp_path_factory):
    d = tmp_path_factory.mktemp("aw_csv")
    (d / "Sales Customer.csv").write_text(
        "CustomerID,PersonID,StoreID\n"
        "1,11,\n"  # individual with full name
        "2,,201\n"  # store: NULL PersonID
        "3,12,\n"  # person exists but all-empty names
        "3,12,\n"  # duplicate business key (dedup keeps one)
        "4,99,\n"  # PersonID with no Person row (left join miss)
    )
    (d / "Person Person.csv").write_text(
        "BusinessEntityID,FirstName,MiddleName,LastName\n"
        '11,"Ana","M.","Silva"\n'
        '12,"","",""\n'  # empty strings → empty concat → corporate default
        '21,"Bo",,"Chen"\n'  # NULL middle name (no double space)
        '22,"Li","K","Wu"\n'
    )
    (d / "Sales SalesPerson.csv").write_text(
        "BusinessEntityID,TerritoryID\n21,1\n22,2\n23,\n"
    )
    (d / "HumanResources Employee.csv").write_text(
        "BusinessEntityID,JobTitle\n21,\"Sales Rep\"\n22,\"Manager\"\n"
        # 23 missing → cargo filled 'Não Informado'
    )
    (d / "Sales SalesOrderHeader.csv").write_text(
        "SalesOrderID,OrderDate,CustomerID,SalesPersonID,ShipToAddressID\n"
        "100,2011-05-31 00:00:00,1,21,333\n"
        "101,2011-07-01 00:00:00,2,,334\n"  # online sale: NULL SalesPersonID
        "102,2011-12-31 00:00:00,999,21,333\n"  # orphan CustomerID → dropped
    )
    (d / "Sales SalesOrderDetail.csv").write_text(
        "SalesOrderID,SalesOrderDetailID,ProductID,OrderQty,UnitPrice,UnitPriceDiscount\n"
        "100,1,1,2,100.50,0\n"
        "100,2,2,1,50.00,0.10\n"
        "101,3,1,3,100.50,0.05\n"
        "102,4,1,1,10.00,0\n"  # belongs to orphan header
    )
    # minimal geo chain for dim_localidade lookups
    (d / "Person Address.csv").write_text(
        "AddressID,City,StateProvinceID\n333,\"Concord\",9\n334,\"Lyon\",87\n"
    )
    (d / "Person StateProvince.csv").write_text(
        "StateProvinceID,CountryRegionCode,Name\n9,US,\"California\"\n87,FR,\"Ain\"\n"
    )
    (d / "Person CountryRegion.csv").write_text(
        'CountryRegionCode,Name\nUS,"United States"\nFR,"France"\n'
    )
    return str(d)


def test_dim_cliente_edge_cases(spark, data_path):
    rows = {r["id_cliente_original"]: r for r in aw.dim_cliente(spark, data_path).collect()}
    assert len(rows) == 4  # dup CustomerID=3 deduped
    assert rows[1]["nome_completo"] == "Ana M. Silva"
    assert rows[1]["tipo_cliente"] == "Individual"
    assert rows[2]["tipo_cliente"] == "Store"
    assert rows[2]["nome_completo"] == "Cliente Corporativo / Loja"
    assert rows[3]["nome_completo"] == "Cliente Corporativo / Loja"  # empty concat
    assert rows[4]["tipo_cliente"] == "Individual"  # PersonID present, person missing
    assert rows[4]["nome_completo"] == "Cliente Corporativo / Loja"


def test_dim_vendedor_edge_cases(spark, data_path):
    rows = {r["id_vendedor_original"]: r for r in aw.dim_vendedor(spark, data_path).collect()}
    assert len(rows) == 3
    assert rows[21]["nome_vendedor"] == "Bo Chen"  # NULL middle → single space
    assert rows[22]["nome_vendedor"] == "Li K Wu"
    assert rows[21]["cargo"] == "Sales Rep"
    assert rows[23]["cargo"] == "Não Informado"  # no employee row


def test_fato_vendas_edge_cases(spark, data_path):
    dims = {
        "produto": spark.createDataFrame(
            [(1, 1), (2, 2)], "sk_produto int, id_produto_original int"
        ),
        "cliente": spark.createDataFrame(
            [(1, 1), (2, 2)], "sk_cliente int, id_cliente_original int"
        ),
        "localidade": spark.createDataFrame(
            [(1, 333), (2, 334)], "sk_localidade int, id_endereco_original int"
        ),
        "vendedor": spark.createDataFrame(
            [(1, 21), (2, 22)], "sk_vendedor int, id_vendedor_original int"
        ),
    }
    fact = aw.fato_vendas(spark, dims, data_path).collect()
    # orphan header 102 (CustomerID=999 → sk_cliente null) dropped: 3 lines
    assert len(fact) == 3
    by_key = {(r["sk_tempo"], float(r["valor_unitario"])): r for r in fact}
    # online sale (NULL SalesPersonID) SURVIVES with null sk_vendedor
    online = [r for r in fact if r["sk_vendedor"] is None]
    assert len(online) == 1 and online[0]["sk_tempo"] == 20110701
    # money math: (100.50*2)*(1-0) = 201.00 ; (50*1)*0.10 = 5.00 discount
    r0 = by_key[(20110531, 100.50)]
    assert float(r0["valor_total"]) == 201.00 and float(r0["valor_desconto"]) == 0.00
    r1 = by_key[(20110531, 50.00)]
    assert float(r1["valor_desconto"]) == 5.00 and float(r1["valor_total"]) == 45.00
