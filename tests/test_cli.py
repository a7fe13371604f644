"""CLI surface tests — drive __main__.main(argv) in-process (the same
session-scoped Spark fixture backs the store commands)."""

from __future__ import annotations

import datetime
import json

from ora_ch_spark.__main__ import main


def test_cli_catalog_lists_all_entries(capsys):
    assert main(["catalog"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    from ora_ch_spark.catalog import all_queries

    assert len(out) == len(all_queries())
    assert "[gate]" in out[0] and "[tail]" in out[-1]
    assert sum("[gate]" in ln for ln in out) == 50


def test_cli_explain_prints_plan(capsys, sf_smoke):
    assert main(["explain", "q1_pricing_summary", "--data", sf_smoke]) == 0
    out = capsys.readouterr().out
    assert "Physical Plan" in out and "Scan parquet" in out


def test_cli_explain_unknown_query(capsys):
    assert main(["explain", "no_such_query"]) == 2


def test_cli_ttl_and_deduplicate(tmp_path, capsys, spark):
    from ora_ch_spark.store import TableStore

    wh = str(tmp_path / "cliwh")
    store = TableStore(spark, wh)
    store.create_database("ch")
    rows = [
        (i, datetime.datetime(2024, 1, 1 + (i % 10)), float(i % 3))
        for i in range(60)
    ] + [(0, datetime.datetime(2024, 1, 1), 0.0)]  # duplicate row
    store.write(
        "ch", "t",
        spark.createDataFrame(rows, "id bigint, ts timestamp, v double"),
    )
    assert main([
        "ttl", "ch.t", "--ts-col", "ts",
        "--older-than", "2024-01-06T00:00:00", "--warehouse", wh,
    ]) == 0
    n1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])["rows"]
    assert n1 == sum(1 for _, ts, _ in rows if ts >= datetime.datetime(2024, 1, 6))
    assert main(["deduplicate", "ch.t", "--warehouse", wh]) == 0
    n2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])["rows"]
    assert n2 == n1  # the duplicate row was already expired by TTL


def test_gate_window_invariants():
    """The driver's correctness gate checks the FIRST 50 catalog
    entries; since r5 the order is COMPUTED from gate history
    (never-proven first, then stalest-proof-first). Pin the
    structural rules: unique names, every entry has an oracle, and a
    core entry may leave the window ONLY on the strength of a
    historical green CORRECTNESS row."""
    from ora_ch_spark.catalog import _gate_history, all_queries

    qs = all_queries()
    names = [q.name for q in qs]
    assert len(names) == len(set(names)), "duplicate catalog names"
    assert all(q.oracle for q in qs), "every entry needs an oracle"
    window = set(names[:50])
    hist = _gate_history()
    for core in (
        "q1_pricing_summary", "flagship_star", "op_recreate",
        "op_append_where", "op_append_bymax", "op_append_notin",
        "op_update", "calc_pipeline", "calc_replica_6184",
    ):
        assert core in window or core in hist, (
            f"{core} is outside the gate window without a historical "
            f"green CORRECTNESS row"
        )
    assert len(qs) >= 50


def test_cli_vacuum(tmp_path, capsys, spark):
    import os

    from ora_ch_spark.store import TableStore

    wh = str(tmp_path / "cliwh_vac")
    store = TableStore(spark, wh)
    store.create_database("ch")
    store.write(
        "ch", "t",
        spark.createDataFrame([(1, 2.0)], "id bigint, v double"),
    )
    orphan = os.path.join(store._tdir("ch", "t"), "data", "g-crash")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "p.parquet"), "w") as f:
        f.write("x")
    # a sub-60s grace disables the only cross-process in-flight
    # protection (mtime) — the CLI refuses it without --force (r13)
    assert main([
        "vacuum", "ch.t", "--older-than-sec", "0", "--warehouse", wh,
    ]) == 2
    assert os.path.isdir(orphan)
    capsys.readouterr()
    assert main([
        "vacuum", "ch.t", "--older-than-sec", "0", "--force",
        "--warehouse", wh,
    ]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["removed"]["groups"] == 1
    assert not os.path.isdir(orphan)
    assert store.read("ch", "t").count() == 1
