"""LIVE JDBC end-to-end round trip (VERDICT r01 missing item #1).

The image ships no Oracle/ClickHouse driver jar, but Spark's own
classpath bundles the embedded Apache Derby engine (for the Hive
metastore). These tests drive the REAL reader/writer code paths —
``sources.jdbc.jdbc_reader`` → ``operators.load_ops`` →
``sinks.jdbc.jdbc_export`` — against a live Derby database:

    S1 (JDBC read, pushed filters) → O1/O3 (load ops) → store
    store → S5 (JDBC export) → S10 (truncate-before re-export)

matching the reference's live paths ``jdbsChSession.scala:284-298``
(bridge read-insert) and ``:400-414`` (export). Only the Oracle URL
scheme itself remains untestable here.
"""

from __future__ import annotations

import os
import tempfile

import pytest

from ora_ch_spark.io import load_table
from ora_ch_spark.operators.load_ops import apply_operation
from ora_ch_spark.sinks.jdbc import JdbcSinkConfig, jdbc_export
from ora_ch_spark.sources.jdbc import JdbcSourceConfig, jdbc_reader
from ora_ch_spark.specs import Operation, TableSpec
from ora_ch_spark.store import TableStore

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby_url(spark, sf_smoke):
    """A live Derby DB seeded with the orders table (plays Oracle)."""
    db = os.path.join(tempfile.mkdtemp(prefix="derby_e2e_"), "oradb")
    url = f"jdbc:derby:{db};create=true"
    orders = load_table(spark, sf_smoke, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    (
        orders.coalesce(1)
        .write.format("jdbc")
        .mode("overwrite")
        .option("url", url)
        .option("dbtable", "ORDERS_SRC")
        .option("driver", DERBY_DRIVER)
        .save()
    )
    return url


def _cfg(url: str) -> JdbcSourceConfig:
    # Derby resolves unqualified tables against the username schema —
    # the seed write ran as the default APP user
    return JdbcSourceConfig(
        ip="unused", url=url, driver=DERBY_DRIVER, use_dbtable=True,
        fetch_size=500, user="APP",
    )


def test_s1_live_jdbc_read_with_pushdown(spark, sf_smoke, derby_url):
    spec = TableSpec(
        schema="ch", name="orders_jdbc", operation=Operation.RECREATE,
        src_table_full_name="ORDERS_SRC",
    )
    df = jdbc_reader(spark, _cfg(derby_url), spec).load()
    shaped = df.filter("o_totalprice > 100000").select("o_orderkey", "o_totalprice")
    plan = shaped._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThan" in plan
    expected = (
        load_table(spark, sf_smoke, "orders").filter("o_totalprice > 100000").count()
    )
    assert shaped.count() == expected


def test_o1_o3_live_load_ops_from_jdbc(spark, sf_smoke, derby_url):
    """O1 recreate then O3 watermark append, source = live JDBC."""
    store = TableStore(spark, tempfile.mkdtemp(prefix="jdbc_store_"))
    store.create_database("ch")
    cfg = _cfg(derby_url)
    spec1 = TableSpec(
        schema="ch", name="orders_j", operation=Operation.RECREATE,
        src_table_full_name="ORDERS_SRC", where_filter="o_orderkey <= 1000",
    )
    n1 = apply_operation(store, spec1, jdbc_reader(spark, cfg, spec1).load())
    orders = load_table(spark, sf_smoke, "orders")
    assert n1 == orders.filter("o_orderkey <= 1000").count()

    # O3: the watermark predicate pushes into the live JDBC scan
    spec3 = TableSpec(
        schema="ch", name="orders_j", operation=Operation.APPEND_BY_MAX,
        src_table_full_name="ORDERS_SRC", sync_by_column_max="o_orderkey",
    )
    n3 = apply_operation(store, spec3, jdbc_reader(spark, cfg, spec3).load())
    assert n3 == orders.filter("o_orderkey > 1000").count()
    assert store.row_count("ch", "orders_j") == orders.count()


def test_s5_s10_live_export_and_truncate_reexport(spark, sf_smoke, derby_url):
    """S5 export to JDBC target; S10 truncate-before on re-export
    (ora/jdbcSession.scala:131-140): same rows after running twice."""
    store = TableStore(spark, tempfile.mkdtemp(prefix="jdbc_store2_"))
    store.create_database("ch")
    region = load_table(spark, sf_smoke, "region")
    store.write("ch", "region", region)
    sink = JdbcSinkConfig(
        url=derby_url, driver=DERBY_DRIVER, truncate_before=True, batch_size=100
    )
    jdbc_export(store.read("ch", "region"), sink, "REGION_TGT")
    jdbc_export(store.read("ch", "region"), sink, "REGION_TGT")  # idempotent
    back = (
        spark.read.format("jdbc")
        .option("url", derby_url)
        .option("dbtable", "REGION_TGT")
        .option("driver", DERBY_DRIVER)
        .load()
    )
    assert back.count() == 5
    assert {r["r_name"] for r in back.collect()} == {
        r["r_name"] for r in region.collect()
    }


def test_s6_live_sliced_export(spark, sf_smoke, derby_url):
    """S6: hash-sliced parallel export (cityHash64+NTILE analogue) —
    4 partition writers against the live endpoint."""
    store = TableStore(spark, tempfile.mkdtemp(prefix="jdbc_store3_"))
    store.create_database("ch")
    orders = load_table(spark, sf_smoke, "orders")
    store.write("ch", "o", orders)
    sink = JdbcSinkConfig(
        url=derby_url, driver=DERBY_DRIVER, truncate_before=False, batch_size=500
    )
    jdbc_export(store.read("ch", "o"), sink, "ORDERS_TGT", parts=4, parts_key="o_orderkey")
    back = (
        spark.read.format("jdbc")
        .option("url", derby_url)
        .option("dbtable", "ORDERS_TGT")
        .option("driver", DERBY_DRIVER)
        .load()
    )
    assert back.count() == orders.count()


def test_s2_live_partitioned_parallel_read(spark, sf_smoke, derby_url):
    """S2: per-split parallel JDBC read (partitionColumn/bounds/
    numPartitions) against the live endpoint — 4 concurrent range
    cursors, one per split, union == full table."""
    from dataclasses import replace

    orders = load_table(spark, sf_smoke, "orders")
    hi = orders.agg({"o_orderkey": "max"}).first()[0]
    cfg = replace(
        _cfg(derby_url),
        partition_column='"o_orderkey"',
        lower_bound=0,
        upper_bound=int(hi) + 1,
        num_partitions=4,
    )
    # the partitioned path splices raw SQL (the reference's
    # hand-assembled SELECT); the seeded columns are quoted lowercase,
    # so the filter quotes its identifier for the case-sensitive engine
    spec = TableSpec(
        schema="ch", name="orders_par", operation=Operation.RECREATE,
        src_table_full_name="ORDERS_SRC",
        where_filter='"o_totalprice" > 0',
    )
    df = jdbc_reader(spark, cfg, spec).load()
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == orders.count()
    # every split contributed (bounds stride covers the key range)
    sizes = df.rdd.mapPartitions(lambda it: [sum(1 for _ in it)]).collect()
    assert sum(1 for s in sizes if s > 0) >= 2


def test_p7_live_session_init_statement(spark, sf_smoke, derby_url):
    """P7: the per-connection session-init mechanism runs e2e — the
    init statement leaves an observable side effect (an INSERT into a
    log table), mirroring the Oracle deployment's context-setting
    side effect (``ora/jdbcSession.scala:271-286``). Spark executes
    it on each read connection before the scan; note it does NOT run
    on the driver's schema-resolution connection, so inits must not
    be required for name resolution."""
    from dataclasses import replace

    spark.createDataFrame([(0,)], "marker int").coalesce(1).write.format(
        "jdbc"
    ).mode("overwrite").option("url", derby_url).option(
        "dbtable", "INIT_LOG"
    ).option("driver", DERBY_DRIVER).save()

    cfg = replace(
        _cfg(derby_url), session_init_override="INSERT INTO INIT_LOG VALUES (7)"
    )
    spec = TableSpec(
        schema="ch", name="orders_init", operation=Operation.RECREATE,
        src_table_full_name="ORDERS_SRC",
    )
    assert jdbc_reader(spark, cfg, spec).load().count() > 0

    log = (
        spark.read.format("jdbc")
        .option("url", derby_url)
        .option("dbtable", "INIT_LOG")
        .option("driver", DERBY_DRIVER)
        .load()
    )
    assert log.filter("marker = 7").count() >= 1  # init ran on the read connection


def test_session_tagging_in_init_statement():
    """Oracle MODULE/ACTION session tagging (the reference sets
    OCSID.MODULE='ORATOCH' / OCSID.ACTION per task via client info;
    jdbcSession.scala:58-59,336-337) rides the sessionInitStatement as
    DBMS_APPLICATION_INFO.SET_MODULE, composed with the P7 context
    init, and quotes embedded apostrophes."""
    import dataclasses

    from ora_ch_spark.sources.jdbc import JdbcSourceConfig, session_init_sql

    cfg = JdbcSourceConfig(
        ip="127.0.0.1",
        module_tag="ORATOCH",
        action_tag="SLAVE_42",
        curr_date_context="17.01.2024",
    )
    sql = session_init_sql(cfg)
    assert sql.startswith("BEGIN ") and sql.endswith("; END;")
    assert "DBMS_APPLICATION_INFO.SET_MODULE('ORATOCH','SLAVE_42')" in sql
    assert "set_curr_date_context" in sql
    # module defaults to the reference's tag; quoting is safe
    cfg2 = JdbcSourceConfig(ip="127.0.0.1", action_tag="calc_6184'x")
    assert (
        "DBMS_APPLICATION_INFO.SET_MODULE('ORATOCH','calc_6184''x')"
        in session_init_sql(cfg2)
    )
    # no tags → unchanged behavior (None when nothing else configured)
    assert session_init_sql(JdbcSourceConfig(ip="127.0.0.1")) is None
    assert dataclasses.fields(JdbcSourceConfig)  # dataclass intact
