"""windowFunnel / retention operator semantics on handcrafted event
chains (catalog parity covers the full-table replay; these pin the
rules: strict ordering, window anchoring at first step-1 event, null
cascade, retention flag algebra)."""

from __future__ import annotations

import datetime

from ora_ch_spark.operators.funnel import funnel_counts, retention, window_funnel


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (u, datetime.datetime(2024, 1, 1, 0, 0, s), et)
            for u, s, et in rows
        ],
        "user_id bigint, ts timestamp, event_type string",
    )


def test_funnel_levels_and_ordering(spark):
    ev = _ev(
        spark,
        [
            # u1: full chain in order -> level 3
            (1, 0, "view"), (1, 10, "click"), (1, 20, "purchase"),
            # u2: purchase BEFORE click -> chain stops at 2
            (2, 0, "view"), (2, 10, "purchase"), (2, 20, "click"),
            # u3: view only -> 1
            (3, 0, "view"),
            # u4: click/purchase but never view -> not in funnel
            (4, 0, "click"), (4, 5, "purchase"),
        ],
    )
    got = {
        r["user_id"]: r["level"]
        for r in window_funnel(ev, ["view", "click", "purchase"], 3600).collect()
    }
    assert got == {1: 3, 2: 2, 3: 1}
    counts = {
        r["level"]: r["n_users"]
        for r in funnel_counts(
            window_funnel(ev, ["view", "click", "purchase"], 3600)
        ).collect()
    }
    assert counts == {3: 1, 2: 1, 1: 1}


def test_funnel_window_anchors_at_first_step1(spark):
    # first view at t=0; click lands at t=50 — outside a 30 s window
    # even though a SECOND view at t=40 would have caught it (the
    # documented first-anchor deviation from CH's retry rule)
    ev = _ev(spark, [(1, 0, "view"), (1, 40, "view"), (1, 50, "click")])
    got = window_funnel(ev, ["view", "click"], 30).collect()
    assert got[0]["level"] == 1
    # inside the window → level 2 (strictly after the anchor)
    ev2 = _ev(spark, [(1, 0, "view"), (1, 30, "click")])
    assert window_funnel(ev2, ["view", "click"], 30).collect()[0]["level"] == 2


def test_retention_flag_algebra(spark):
    ev = _ev(
        spark,
        [
            (1, 0, "signup"), (1, 10, "view"),   # cohort + week1
            (2, 0, "signup"),                     # cohort only
            (3, 10, "view"),                      # never signed up
        ],
    )
    out = {
        r["cond_index"]: r["n_users"]
        for r in retention(
            ev,
            [
                "event_type = 'signup'",
                "event_type = 'view' AND ts >= timestamp'2024-01-01 00:00:05'",
            ],
        ).collect()
    }
    # cond0 cohort = {1,2}; of those, only u1 satisfies cond1
    assert out == {0: 2, 1: 1}


def test_chunk_documents_overlap_and_coverage(spark):
    from ora_ch_spark.operators.text import chunk_documents

    docs = spark.createDataFrame(
        [(1, "abcdefghijklmnopqrstuvwxyz"), (2, "tiny"), (3, "")],
        "doc_id bigint, text string",
    )
    out = chunk_documents(docs, chunk_chars=10, overlap=4).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_id"])
    # stride 6: ceil((26-4)/6) = 4 chunks
    assert [r["chunk_text"] for r in c1] == [
        "abcdefghij", "ghijklmnop", "mnopqrstuv", "stuvwxyz",
    ]
    assert all(r["n_chunks"] == 4 for r in c1)
    # neighbors share exactly `overlap` characters
    for a, b in zip(c1, c1[1:]):
        assert a["chunk_text"][-4:] == b["chunk_text"][:4]
    # reassembly: stitching de-overlapped chunks recovers the doc
    stitched = c1[0]["chunk_text"] + "".join(r["chunk_text"][4:] for r in c1[1:])
    assert stitched == "abcdefghijklmnopqrstuvwxyz"
    # short and empty docs still yield exactly one chunk
    assert [r["chunk_text"] for r in by_doc[2]] == ["tiny"]
    assert [r["chunk_text"] for r in by_doc[3]] == [""]
