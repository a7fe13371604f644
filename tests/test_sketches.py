"""Mergeable-sketch operator properties (operators/sketches.py).

Value parity vs DuckDB is covered by test_parity (hll_distinct_rollup /
hist_quantile_sketch); these tests pin the SKETCH contracts the parity
hash can't see: bounded size, merge associativity/idempotence, and
accuracy bounds of the estimators.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ora_ch_spark.io import load_table
from ora_ch_spark.operators import sketches as SK


def _reg(spark, sf):
    ev = load_table(spark, sf, "events")
    key = F.concat_ws(
        ":", F.col("user_id"), F.col("ts").cast("date").cast("string")
    )
    base = ev.select(F.col("event_type").alias("grp"), key.alias("k"))
    return base, SK.hll_registers(base, F.col("k"), ["grp"])


def test_hll_register_table_bounded(spark, sf_correct):
    _, reg = _reg(spark, sf_correct)
    sizes = reg.groupBy("grp").count().collect()
    assert sizes and all(r["count"] <= SK.HLL_M for r in sizes)


def test_hll_merge_equals_direct_global_sketch(spark, sf_correct):
    """Merging per-group registers must equal the sketch computed on
    the ungrouped data — the property that lets a 100 TB rollup merge
    per-day sketches instead of re-scanning."""
    base, reg = _reg(spark, sf_correct)
    merged = SK.hll_merge(reg.drop("grp"), [])
    direct = SK.hll_registers(
        base.withColumn("g", F.lit(1)), F.col("k"), ["g"]
    ).drop("g")
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0
    # idempotence: merging the merged sketch with itself is a no-op
    twice = SK.hll_merge(merged.unionByName(merged), [])
    assert twice.exceptAll(merged).count() == 0


def test_hll_estimate_accuracy(spark, sf_correct):
    """Raw HLL with m=64 has σ ≈ 1.04/√64 ≈ 13%; assert every
    per-group estimate lands within 3σ of the exact distinct."""
    base, reg = _reg(spark, sf_correct)
    est = {r["grp"]: r["est_distinct"] for r in SK.hll_estimate(reg, ["grp"]).collect()}
    exact = {
        r["grp"]: r["n"]
        for r in base.groupBy("grp").agg(F.countDistinct("k").alias("n")).collect()
    }
    assert set(est) == set(exact)
    for g, n in exact.items():
        assert abs(est[g] - n) / n < 0.40, (g, est[g], n)


def test_histogram_merge_and_quantile_bound(spark, sf_correct):
    ev = load_table(spark, sf_correct, "events").withColumnRenamed(
        "event_type", "grp"
    )
    width = 5.0
    hist = SK.histogram_sketch(ev, "value", ["grp"], width)
    # merge = count sum: global histogram from per-group histograms
    merged = (
        hist.groupBy("bin").agg(F.sum("cnt").alias("cnt"))
        .withColumn("grp", F.lit("__all__"))
        .select("grp", "bin", "cnt")
    )
    direct = (
        SK.histogram_sketch(
            ev.withColumn("grp", F.lit("__all__")), "value", ["grp"], width
        )
    )
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0
    # quantile error ≤ bin width vs the exact percentile
    q = SK.histogram_quantiles(merged, ["grp"], width).collect()[0]
    exact = ev.agg(
        F.expr("percentile(value, 0.5)").alias("p50"),
        F.expr("percentile(value, 0.99)").alias("p99"),
    ).collect()[0]
    assert abs(q["p50"] - exact["p50"]) <= width
    assert abs(q["p99"] - exact["p99"]) <= width


def test_histogram_sketch_rows_bounded(spark, sf_correct):
    ev = load_table(spark, sf_correct, "events").withColumnRenamed(
        "event_type", "grp"
    )
    hist = SK.histogram_sketch(ev, "value", ["grp"], 5.0)
    n_bins = hist.groupBy("grp").count().collect()
    # value range ~[0, 500) / width 5 → ≤ ~100 bins per group
    assert all(r["count"] <= 120 for r in n_bins)


def test_cms_one_sided_error_and_merge(spark, sf_correct):
    """CMS estimates are upper bounds (est ≥ exact for EVERY key), and
    merging two half-sketches by counter sum equals the sketch of the
    whole input."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_correct, "events")
    base = ev.select(F.col("user_id").cast("string").alias("k")).persist()
    cms = SK.cms_build(base, F.col("k"))
    exact = base.groupBy("k").agg(F.count(F.lit(1)).alias("exact"))
    est = SK.cms_estimate(cms, exact.select("k"), "k")
    j = exact.join(est, "k", "inner")
    assert j.filter(F.col("est_cnt") < F.col("exact")).count() == 0
    assert j.count() == exact.count()
    # merge: split on a deterministic predicate, sketch halves, sum
    h1 = SK.cms_build(base.filter(F.md5(F.col("k")).startswith("a") == False), F.col("k"))  # noqa: E712
    h2 = SK.cms_build(base.filter(F.md5(F.col("k")).startswith("a")), F.col("k"))
    merged = SK.cms_merge(h1.unionByName(h2))
    assert merged.exceptAll(cms).count() == 0
    assert cms.exceptAll(merged).count() == 0
    base.unpersist()


def test_bloom_prune_superset_and_fp_bound(spark, sf_correct):
    """Bloom pruning never drops a true match (exact ⊆ pruned ⊆ fact)
    and the false-positive rate stays within ~2x the analytic bound."""
    import math

    from pyspark.sql import functions as F

    from ora_ch_spark.operators import bloomjoin as BJ

    orders = load_table(spark, sf_correct, "orders").filter(
        F.col("o_totalprice") > 400000.0
    )
    li = load_table(spark, sf_correct, "lineitem")
    bloom = BJ.bloom_build(orders, "o_orderkey").persist()
    pruned = BJ.bloom_prune(li, "l_orderkey", bloom).persist()
    dim = orders.select(F.col("o_orderkey").alias("l_orderkey"))
    exact = li.join(F.broadcast(dim), "l_orderkey", "left_semi")
    # no true match lost
    assert exact.join(pruned, ["l_orderkey", "l_linenumber"], "left_anti").count() == 0
    n_keys = orders.count()
    n_fact, n_pass, n_exact = li.count(), pruned.count(), exact.count()
    assert n_exact <= n_pass <= n_fact
    p_fp = (1 - math.exp(-BJ.BLOOM_K * n_keys / BJ.BLOOM_M)) ** BJ.BLOOM_K
    observed = (n_pass - n_exact) / max(1, n_fact - n_exact)
    assert observed <= 2 * p_fp + 0.01, (observed, p_fp)
    bloom.unpersist()
    pruned.unpersist()


def test_cms_estimate_unseen_key_is_zero_or_collision(spark):
    """A probe key absent from the build input must yield a row (not
    be dropped) with the min-counter estimate — 0 when its cells are
    all empty."""
    from pyspark.sql import functions as F

    base = spark.createDataFrame([("a",), ("a",), ("b",)], "k string")
    cms = SK.cms_build(base, F.col("k"))
    keys = spark.createDataFrame([("a",), ("zzz_unseen",)], "k string")
    est = {r["k"]: r["est_cnt"] for r in SK.cms_estimate(cms, keys, "k").collect()}
    assert set(est) == {"a", "zzz_unseen"}
    assert est["a"] >= 2
    assert 0 <= est["zzz_unseen"] <= 3  # 0 unless all 4 cells collide


def test_histogram_sketch_excludes_nulls(spark):
    from pyspark.sql import functions as F  # noqa: F401

    df = spark.createDataFrame(
        [("g", 1.0), ("g", None), ("g", 9.0)], "grp string, v double"
    )
    hist = SK.histogram_sketch(df, "v", ["grp"], 5.0).collect()
    assert sorted((r["bin"], r["cnt"]) for r in hist) == [(0, 1), (1, 1)]
    q = SK.histogram_quantiles(
        SK.histogram_sketch(df, "v", ["grp"], 5.0), ["grp"], 5.0
    ).collect()[0]
    assert q["n"] == 2  # the NULL row is not counted


def test_hll_intersect_estimate(spark, sf_correct):
    """Inclusion-exclusion over registers approximates the true
    intersection: users doing 'click' vs 'purchase' overlap almost
    completely in the dense testdata."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_correct, "events")
    key = F.col("user_id").cast("string")

    def reg(et):
        return SK.hll_registers(
            ev.filter(F.col("event_type") == et).select(key.alias("k")),
            F.col("k"),
            [],
        )

    out = SK.hll_intersect_estimate(reg("click"), reg("purchase")).collect()[0]
    a = ev.filter("event_type = 'click'").select("user_id").distinct()
    b = ev.filter("event_type = 'purchase'").select("user_id").distinct()
    true_i = a.intersect(b).count()
    true_u = a.union(b).distinct().count()
    assert abs(out["est_union"] - true_u) / true_u < 0.40
    # intersection error amplifies; allow a loose band but demand the
    # estimate lands in the right order of magnitude
    assert out["est_intersect"] > 0.3 * true_i
    assert out["est_intersect"] < 3.0 * true_i


def test_connected_components_star_equals_label_and_beats_cap(spark):
    """Star CC must (a) match min-label propagation wherever the
    latter converges, and (b) solve chain graphs whose diameter
    exceeds label propagation's round cap."""
    import random

    from ora_ch_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    def run(fn, rows):
        pairs = spark.createDataFrame(rows, "id_a bigint, id_b bigint")
        return {(r["doc_id"], r["component"]) for r in fn(pairs).collect()}

    # (b) 120-link chain: diameter 120 > the label form's max_iter=50
    star = run(connected_components_star, [(i, i + 1) for i in range(120)])
    assert star == {(i, 0) for i in range(121)}
    # (a) equality on random multi-component graphs + a mixed shape
    random.seed(7)
    rows = []
    for comp in range(8):
        base = comp * 1000
        ids = [base + i for i in range(random.randint(2, 25))]
        rows += [(ids[i], ids[random.randrange(i)]) for i in range(1, len(ids))]
    assert run(connected_components, rows) == run(connected_components_star, rows)
    mixed = [(5, 1), (5, 9), (5, 7), (2, 3), (3, 4), (4, 2), (100, 50)]
    assert run(connected_components, mixed) == run(connected_components_star, mixed)


def test_update_components_equals_full_recompute(spark):
    """Folding new pairs into an existing labeling must equal solving
    the union of all pairs from scratch — including cross-component
    merges and previously-singleton nodes."""
    from ora_ch_spark.operators.dedup import (
        connected_components_star,
        update_components,
    )

    old = [(1, 2), (2, 3), (10, 11), (20, 21)]
    new = [(3, 10), (30, 31), (21, 22)]  # bridge, brand-new, extension

    def df(rows):
        return spark.createDataFrame(rows, "id_a bigint, id_b bigint")

    labels = connected_components_star(df(old))
    inc = {
        (r["doc_id"], r["component"])
        for r in update_components(labels, df(new)).collect()
    }
    full = {
        (r["doc_id"], r["component"])
        for r in connected_components_star(df(old + new)).collect()
    }
    assert inc == full
    # the bridged cluster collapsed to one min id
    comp = {d: c for d, c in inc}
    assert comp[11] == comp[1] == 1


def test_assign_splits_stability_under_growth(spark):
    """A document's split never changes when the corpus grows — the
    decontamination-audit property hash splits have and shuffles lack."""
    from pyspark.sql import functions as F

    from ora_ch_spark.operators.sampling import assign_splits

    small = spark.range(0, 200).withColumnRenamed("id", "doc_id")
    big = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["split"] for r in assign_splits(small).collect()}
    b = {r["doc_id"]: r["split"] for r in assign_splits(big).collect()}
    assert all(b[k] == v for k, v in a.items())
    # proportions roughly honored at n=2000
    from collections import Counter

    c = Counter(b.values())
    assert 0.85 < c["train"] / 2000 < 0.95
    assert c["train"] + c["val"] + c["test"] == 2000
    # weights must sum to 1
    import pytest

    with pytest.raises(ValueError):
        assign_splits(small, weights=(("a", 0.5), ("b", 0.2)))
