"""SCD type-2 merge semantics on tiny hand-built frames: close-out +
insert for changes, passthrough for no-ops (including NULL-safe
equality), insert-only for new keys, and idempotence of re-applying
the same batch."""

from __future__ import annotations

from pyspark.sql import functions as F

from ora_ch_spark.operators.scd import as_scd2_base, scd2_merge


def _dim(spark):
    return spark.createDataFrame(
        [(1, 10.0, "A"), (2, 20.0, "B"), (3, None, "C")],
        "k bigint, bal double, seg string",
    )


def _merge(spark, updates_rows):
    base = as_scd2_base(_dim(spark), "k", ["bal", "seg"], "2000-01-01")
    upd = spark.createDataFrame(updates_rows, "k bigint, bal double, seg string")
    return scd2_merge(
        base, upd, key_col="k", tracked_cols=["bal", "seg"], batch_date="2001-06-15"
    )


def test_scd2_change_closes_and_inserts(spark):
    rows = _merge(spark, [(1, 11.0, "A")]).collect()
    k1 = sorted(
        (r for r in rows if r["k"] == 1), key=lambda r: (r["eff_from"],)
    )
    assert len(k1) == 2
    closed, opened = k1
    assert not closed["is_current"] and closed["bal"] == 10.0
    assert str(closed["eff_to"]).startswith("2001-06-15")
    assert opened["is_current"] and opened["bal"] == 11.0
    assert opened["eff_to"] is None
    # untouched keys pass through exactly once, still open
    assert sum(1 for r in rows if r["k"] == 2) == 1
    assert len(rows) == 4


def test_scd2_noop_and_null_safe_passthrough(spark):
    # key 1 identical, key 3 has NULL bal on both sides → both no-ops
    rows = _merge(spark, [(1, 10.0, "A"), (3, None, "C")]).collect()
    assert len(rows) == 3
    assert all(r["is_current"] for r in rows)
    # NULL -> value IS a change
    rows = _merge(spark, [(3, 30.0, "C")]).collect()
    assert sum(1 for r in rows if r["k"] == 3) == 2


def test_scd2_new_key_inserts_open_row(spark):
    rows = _merge(spark, [(9, 90.0, "Z")]).collect()
    k9 = [r for r in rows if r["k"] == 9]
    assert len(k9) == 1 and k9[0]["is_current"] and k9[0]["eff_to"] is None
    assert len(rows) == 4


def test_scd2_reapplying_same_batch_is_idempotent(spark):
    base = as_scd2_base(_dim(spark), "k", ["bal", "seg"], "2000-01-01")
    upd = spark.createDataFrame([(1, 11.0, "A")], "k bigint, bal double, seg string")
    once = scd2_merge(base, upd, "k", ["bal", "seg"], "2001-06-15")
    twice = scd2_merge(once, upd, "k", ["bal", "seg"], "2002-01-01")
    # second application sees identical current attrs → no new rows
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))
