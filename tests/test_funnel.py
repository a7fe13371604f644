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


def test_funnel_mode_equal_timestamps(spark):
    """CH's unmodified windowFunnel lets equal timestamps chain
    (mode='default'); the historical strict_increase default demands
    strictly greater — a same-instant view+click chains only under
    'default'."""
    ev = _ev(spark, [(1, 0, "view"), (1, 0, "click"), (2, 0, "view"),
                     (2, 1, "click")])
    strict = {
        r["user_id"]: r["level"]
        for r in window_funnel(ev, ["view", "click"], 3600).collect()
    }
    loose = {
        r["user_id"]: r["level"]
        for r in window_funnel(
            ev, ["view", "click"], 3600, mode="default"
        ).collect()
    }
    assert strict == {1: 1, 2: 2}
    assert loose == {1: 2, 2: 2}
    import pytest as _pt
    with _pt.raises(ValueError):
        window_funnel(ev, ["view", "click"], 3600, mode="bogus")


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


def _make_png(px, filters):
    """Reference PNG encoder for tests: px = HxWx3 uint8 array,
    filters = per-row filter type (applied per spec)."""
    import struct
    import zlib

    import numpy as np

    h, w, _ = px.shape
    raw = bytearray()
    prev = np.zeros(w * 3, dtype=np.int64)
    for y in range(h):
        line = px[y].reshape(-1).astype(np.int64)
        f = filters[y % len(filters)]
        raw.append(f)
        if f == 0:
            enc = line
        elif f == 1:
            left = np.concatenate([np.zeros(3, np.int64), line[:-3]])
            enc = (line - left) % 256
        elif f == 2:
            enc = (line - prev) % 256
        else:
            enc = np.zeros(w * 3, np.int64)
            for x in range(w * 3):
                a = line[x - 3] if x >= 3 else 0
                b = prev[x]
                if f == 3:
                    enc[x] = (line[x] - (a + b) // 2) % 256
                else:
                    c = prev[x - 3] if x >= 3 else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    enc[x] = (line[x] - pred) % 256
        raw.extend(int(v) for v in enc)
        prev = line

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_png_decode_all_filters(spark):
    import numpy as np

    from ora_ch_spark.operators.multimodal import (
        decode_image_png,
        extract_image_features_raster,
    )

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(8, 5, 3), dtype=np.uint8)
    for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
        data = _make_png(px, filters)
        w, h, r, g, b = decode_image_png(data)
        assert (w, h) == (5, 8)
        exp = px.astype(np.float64).mean(axis=(0, 1))
        assert abs(r - exp[0]) < 1e-9 and abs(g - exp[1]) < 1e-9 and abs(b - exp[2]) < 1e-9
    # distributed dispatcher handles PNG blobs end-to-end
    media = spark.createDataFrame(
        [(1, bytearray(_make_png(px, [0, 1, 2, 3, 4])))],
        "doc_id bigint, media binary",
    )
    row = extract_image_features_raster(media).collect()[0]
    exp = px.astype(np.float64).mean(axis=(0, 1))
    assert row["width"] == 5 and abs(row["mean_r"] - exp[0]) < 1e-9


def test_sequence_match_ordered_conditions(spark):
    ev = _ev(
        spark,
        [
            (1, 0, "view"), (1, 10, "purchase"),      # view then purchase
            (2, 0, "purchase"), (2, 10, "view"),      # wrong order
            (3, 0, "view"),                            # second cond never
        ],
    )
    from ora_ch_spark.operators.funnel import sequence_match

    got = {
        r["user_id"]: r["matched"]
        for r in sequence_match(
            ev, ["event_type = 'view'", "event_type = 'purchase'"]
        ).collect()
    }
    assert got == {1: True, 2: False, 3: False}


def test_window_funnel_step_conds(spark):
    # conditions over arbitrary columns, not just event_type
    import datetime

    ev = spark.createDataFrame(
        [
            (1, datetime.datetime(2024, 1, 1, 0, 0, 0), "view", 5.0),
            (1, datetime.datetime(2024, 1, 1, 0, 0, 10), "view", 50.0),
        ],
        "user_id bigint, ts timestamp, event_type string, value double",
    )
    from ora_ch_spark.operators.funnel import window_funnel

    got = window_funnel(
        ev, steps=[], window_seconds=60,
        step_conds=["value < 10", "value > 40"],
    ).collect()
    assert got[0]["level"] == 2
