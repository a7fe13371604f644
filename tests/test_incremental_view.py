"""Incremental aggregate view maintenance: refresh reads ONLY the
manifest delta, a no-op refresh reads nothing new, and a shrunken
source file set (delete/compact) falls back to a full recompute —
with every path ending bit-identical to a from-scratch aggregation."""

from __future__ import annotations

from pyspark.sql import functions as F

from ora_ch_spark.operators.incremental import refresh_agg_view
from ora_ch_spark.store import TableStore


def _full(store):
    return sorted(
        map(
            tuple,
            store.read("ch", "src")
            .groupBy("k")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col("v").cast("decimal(18,2)"))
                .cast("decimal(30,2)")
                .alias("val_sum"),
            )
            .collect(),
        )
    )


def _view(store):
    return sorted(map(tuple, store.read("ch", "agg").collect()))


def _mk(spark, root):
    store = TableStore(spark, root, keep_versions=3)
    store.create_database("ch")
    df = spark.range(1000).select(
        F.col("id"), F.pmod("id", F.lit(7)).alias("k"), (F.col("id") * 0.25).alias("v")
    )
    store.write("ch", "src", df)
    return store, df


def test_refresh_reads_only_delta_files(spark, tmp_path, monkeypatch):
    store, _ = _mk(spark, str(tmp_path / "s"))
    refresh_agg_view(store, ("ch", "src"), ("ch", "agg"), ["k"], "v")
    assert _view(store) == _full(store)

    delta = spark.range(1000, 1400).select(
        F.col("id"), F.pmod("id", F.lit(7)).alias("k"), (F.col("id") * 0.25).alias("v")
    )
    store.append("ch", "src", delta)
    pre_files = {fe["path"] for fe in store._manifest("ch", "src")["files"]}

    read_paths: list[list[str]] = []
    orig = TableStore.read_files

    def spy(self, schema, table, rel_paths):
        read_paths.append(list(rel_paths))
        return orig(self, schema, table, rel_paths)

    monkeypatch.setattr(TableStore, "read_files", spy)
    refresh_agg_view(store, ("ch", "src"), ("ch", "agg"), ["k"], "v")
    assert _view(store) == _full(store)
    # exactly one delta read, covering only the appended group's files
    assert len(read_paths) == 1
    assert set(read_paths[0]) < pre_files
    n_delta = sum(
        fe["rows"]
        for fe in store._manifest("ch", "src")["files"]
        if fe["path"] in set(read_paths[0])
    )
    assert n_delta == 400


def test_noop_refresh_skips_rewrite(spark, tmp_path):
    store, _ = _mk(spark, str(tmp_path / "s"))
    refresh_agg_view(store, ("ch", "src"), ("ch", "agg"), ["k"], "v")
    before = store._manifest("ch", "agg")["groups"]
    out = refresh_agg_view(store, ("ch", "src"), ("ch", "agg"), ["k"], "v")
    assert store._manifest("ch", "agg")["groups"] == before  # no new snapshot
    assert sorted(map(tuple, out.collect())) == _full(store)


def test_source_shrink_triggers_full_recompute(spark, tmp_path):
    store, _ = _mk(spark, str(tmp_path / "s"))
    refresh_agg_view(store, ("ch", "src"), ("ch", "agg"), ["k"], "v")
    store.delete_where("ch", "src", "k = 3")
    refresh_agg_view(store, ("ch", "src"), ("ch", "agg"), ["k"], "v")
    full = _full(store)
    assert _view(store) == full
    assert all(t[0] != 3 for t in full)
