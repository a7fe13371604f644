"""CSV / JSON-lines sources: explicit-schema reads with corrupt-row
quarantine, and the full load-operation path (O1 recreate + O3
watermark append) running unchanged over a text-format landing zone
via the ``source_loader`` contract."""

from __future__ import annotations

import os
import tempfile

import pytest

from ora_ch_spark.io import load_table
from ora_ch_spark.operators.load_ops import apply_operation
from ora_ch_spark.sources.files import (
    csv_source,
    ddl_of,
    read_csv,
    read_jsonl,
    split_quarantine,
)
from ora_ch_spark.specs import Operation, TableSpec
from ora_ch_spark.store import TableStore


@pytest.fixture(scope="module")
def csv_dir(spark, sf_smoke):
    d = tempfile.mkdtemp(prefix="csv_src_")
    orders = load_table(spark, sf_smoke, "orders")
    orders.coalesce(1).write.option("header", True).csv(os.path.join(d, "orders_csv"))
    # single file named orders.csv for the source convention
    part = next(
        f for f in os.listdir(os.path.join(d, "orders_csv")) if f.endswith(".csv")
    )
    os.rename(os.path.join(d, "orders_csv", part), os.path.join(d, "orders.csv"))
    # plant one malformed row (unparsable bigint in o_orderkey)
    with open(os.path.join(d, "orders.csv"), "a") as f:
        f.write("not_a_number,oops,X,abc,2024-99-99T00:00:00,BAD\n")
    return d, ddl_of(orders)


def test_csv_quarantine_and_clean_read(spark, sf_smoke, csv_dir):
    d, schema = csv_dir
    raw = read_csv(spark, os.path.join(d, "orders.csv"), schema)
    clean, bad = split_quarantine(raw)
    expected = load_table(spark, sf_smoke, "orders").count()
    assert clean.count() == expected
    assert bad.count() == 1
    assert "not_a_number" in bad.collect()[0]["_corrupt_record"]


def test_load_ops_run_from_csv_source(spark, sf_smoke, csv_dir):
    d, schema = csv_dir
    loader = csv_source(spark, d, {"orders": schema})
    store = TableStore(spark, tempfile.mkdtemp(prefix="csv_store_"))
    store.create_database("ch")
    spec1 = TableSpec(
        schema="ch", name="orders_c", operation=Operation.RECREATE,
        src_table_full_name="orders", where_filter="o_orderkey <= 1000",
    )
    n1 = apply_operation(store, spec1, loader(spec1))
    orders = load_table(spark, sf_smoke, "orders")
    assert n1 == orders.filter("o_orderkey <= 1000").count()
    spec3 = TableSpec(
        schema="ch", name="orders_c", operation=Operation.APPEND_BY_MAX,
        src_table_full_name="orders", sync_by_column_max="o_orderkey",
    )
    apply_operation(store, spec3, loader(spec3))
    assert store.row_count("ch", "orders_c") == orders.count()
    # values survived the text round-trip (spot-check a timestamp col)
    got = {
        r["o_orderkey"]: r["o_orderdate"]
        for r in store.read("ch", "orders_c").filter("o_orderkey <= 5").collect()
    }
    want = {
        r["o_orderkey"]: r["o_orderdate"]
        for r in orders.filter("o_orderkey <= 5").collect()
    }
    assert got == want


def test_jsonl_quarantine_read(spark, sf_smoke):
    d = tempfile.mkdtemp(prefix="jsonl_src_")
    region = load_table(spark, sf_smoke, "region")
    region.coalesce(1).write.json(os.path.join(d, "region_json"))
    part = next(
        f for f in os.listdir(os.path.join(d, "region_json")) if f.endswith(".json")
    )
    os.rename(os.path.join(d, "region_json", part), os.path.join(d, "region.jsonl"))
    with open(os.path.join(d, "region.jsonl"), "a") as f:
        f.write('{"r_regionkey": broken json\n')
    raw = read_jsonl(spark, os.path.join(d, "region.jsonl"), ddl_of(region))
    clean, bad = split_quarantine(raw)
    assert clean.count() == region.count()
    assert bad.count() == 1


def test_stream_ingest_exactly_once(spark, sf_smoke, tmp_path):
    """Streaming ingestion into the TableStore: availableNow run lands
    all files; re-run with the same checkpoint is a no-op; a new file
    appends only its rows; a replayed epoch is skipped by the guard."""
    import shutil

    from ora_ch_spark.io import load_table
    from ora_ch_spark.streaming.ingest import EPOCH_COL, stream_ingest_files
    from ora_ch_spark.syncstate import SyncState

    src = tmp_path / "src"
    src.mkdir()
    region = load_table(spark, sf_smoke, "region")
    region_cols = region.columns
    nation = load_table(spark, sf_smoke, "nation").selectExpr(
        "n_regionkey as r_regionkey", "n_name as r_name"
    )
    for c in region_cols:
        if c not in nation.columns:
            from pyspark.sql import functions as F

            nation = nation.withColumn(c, F.lit("x"))
    nation = nation.select(*region_cols)
    region.coalesce(1).write.parquet(str(tmp_path / "a"))
    part = next((tmp_path / "a").glob("*.parquet"))
    shutil.copy(part, src / "f1.parquet")

    store_root = str(tmp_path / "store")
    from ora_ch_spark.store import TableStore

    store = TableStore(spark, store_root)
    store.create_database("ch")
    ckpt = str(tmp_path / "ckpt")

    out = stream_ingest_files(spark, str(src), store, "ch", "r_stream", ckpt)
    assert out.count() == region.count()

    # same checkpoint, no new files → no change
    out = stream_ingest_files(spark, str(src), store, "ch", "r_stream", ckpt)
    assert out.count() == region.count()

    # new file → only its rows append
    nation.coalesce(1).write.parquet(str(tmp_path / "b"))
    part2 = next((tmp_path / "b").glob("*.parquet"))
    shutil.copy(part2, src / "f2.parquet")
    out = stream_ingest_files(spark, str(src), store, "ch", "r_stream", ckpt)
    assert out.count() == region.count() + nation.count()

    # epoch replay: re-deliver the last committed epoch by hand —
    # the guard must skip the append
    state = SyncState(store.root)
    before = store.row_count("ch", "r_stream")
    last = int(state.get_watermark("ch", "r_stream", EPOCH_COL))
    from ora_ch_spark.streaming.ingest import stream_ingest_files as _  # noqa: F401

    # simulate what a crashed-after-append retry does
    def replay(batch_df, epoch_id):
        lastw = state.get_watermark("ch", "r_stream", EPOCH_COL)
        if lastw is not None and int(lastw) >= epoch_id:
            return
        store.append("ch", "r_stream", batch_df)
        state.set_watermark("ch", "r_stream", EPOCH_COL, epoch_id)

    replay(region, last)  # same epoch id → must be skipped
    assert store.row_count("ch", "r_stream") == before


def test_csv_sink_roundtrip(spark, sf_smoke, tmp_path):
    """S5-shaped file export: write orders to CSV, read back through
    the matching source with ddl_of — values survive byte-exactly."""
    from ora_ch_spark.sinks.files import write_csv, write_jsonl

    orders = load_table(spark, sf_smoke, "orders")
    out = str(tmp_path / "orders_csv")
    write_csv(orders, out, num_files=1)
    back, bad = split_quarantine(
        read_csv(spark, out, ddl_of(orders))
    )
    assert bad.count() == 0
    assert back.count() == orders.count()
    a = {r["o_orderkey"]: r for r in orders.filter("o_orderkey <= 5").collect()}
    b = {r["o_orderkey"]: r for r in back.filter("o_orderkey <= 5").collect()}
    assert a.keys() == b.keys()
    for k in a:
        assert a[k]["o_orderdate"] == b[k]["o_orderdate"]
        assert a[k]["o_totalprice"] == b[k]["o_totalprice"]

    outj = str(tmp_path / "orders_jsonl")
    write_jsonl(orders, outj, num_files=2)
    import os

    files = [f for f in os.listdir(outj) if f.endswith(".json")]
    assert len(files) == 2  # num_files controls write parallelism


def test_orc_roundtrip_and_pushdown(spark, sf_smoke, tmp_path):
    """ORC export → read back: exact schema and values (columnar, no
    text-loss), and filters reach the ORC scan as PushedFilters."""
    from ora_ch_spark.sinks.files import write_orc
    from ora_ch_spark.sources.files import read_orc

    orders = load_table(spark, sf_smoke, "orders")
    out = str(tmp_path / "orders_orc")
    write_orc(orders, out, num_files=2)
    back = read_orc(spark, out)
    assert back.schema == orders.schema
    assert back.count() == orders.count()
    a = sorted(map(tuple, orders.filter("o_orderkey <= 5").collect()))
    b = sorted(map(tuple, back.filter("o_orderkey <= 5").collect()))
    assert a == b
    plan = (
        back.filter("o_orderkey <= 5")
        .select("o_orderkey")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(o_orderkey), LessThanOrEqual(o_orderkey,5)" in plan
    assert "ReadSchema: struct<o_orderkey:bigint>" in plan


def test_load_ops_run_from_orc_source(spark, sf_smoke, tmp_path):
    """O1 recreate + O3 watermark append over an ORC landing zone via
    the source_loader contract — same path the CSV source proves."""
    from ora_ch_spark.sinks.files import write_orc
    from ora_ch_spark.sources.files import orc_source

    orders = load_table(spark, sf_smoke, "orders")
    d = str(tmp_path / "zone")
    os.makedirs(d)
    write_orc(orders, os.path.join(d, "orders.orc"))
    loader = orc_source(spark, d)
    store = TableStore(spark, str(tmp_path / "store"))
    store.create_database("ch")
    spec1 = TableSpec(
        schema="ch", name="orders_o", operation=Operation.RECREATE,
        src_table_full_name="orders", where_filter="o_orderkey <= 1000",
    )
    n1 = apply_operation(store, spec1, loader(spec1))
    assert n1 == orders.filter("o_orderkey <= 1000").count()
    spec3 = TableSpec(
        schema="ch", name="orders_o", operation=Operation.APPEND_BY_MAX,
        src_table_full_name="orders", sync_by_column_max="o_orderkey",
    )
    apply_operation(store, spec3, loader(spec3))
    assert store.row_count("ch", "orders_o") == orders.count()
