"""Streaming windows (D8/D9/D6), state storage (S4), multimodal plumbing."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from elasticsearch_assets_spark.streaming import windows as W


# ---- pure window math (reference semantics) -------------------------------
def test_delayed_window_bounds():
    now = datetime(2024, 1, 10, 12, 0, 45)
    delay = timedelta(seconds=30)
    interval = timedelta(minutes=1)
    s, e = W.delayed_window_bounds(now, delay, interval)
    # watermark = 12:00:15 → newest complete minute window is [11:59, 12:00)
    assert (s, e) == (datetime(2024, 1, 10, 11, 59), datetime(2024, 1, 10, 12, 0))


def test_window_holes():
    iv = timedelta(minutes=1)
    start = datetime(2024, 1, 1, 0, 0)
    wm = datetime(2024, 1, 1, 0, 5)
    all_w = W.covered_windows(start, wm, iv)
    assert len(all_w) == 5
    processed = [all_w[0], all_w[2], all_w[4]]
    holes = W.window_holes(processed, start, wm, iv)
    assert holes == [all_w[1], all_w[3]]


def test_window_scan_half_open(spark):
    rows = [
        (1, datetime(2024, 1, 1, 0, 0, 0)),
        (2, datetime(2024, 1, 1, 0, 0, 59)),
        (3, datetime(2024, 1, 1, 0, 1, 0)),  # end-exclusive → excluded
    ]
    df = spark.createDataFrame(rows, "id long, ts timestamp")
    w = (datetime(2024, 1, 1, 0, 0), datetime(2024, 1, 1, 0, 1))
    got = {r["id"] for r in W.window_scan(df, "ts", w).collect()}
    assert got == {1, 2}


def test_structured_streaming_windows(spark, tmp_path):
    """readStream → watermark(delay) → tumbling window agg, availableNow."""
    src = str(tmp_path / "stream_src")
    rows = [
        (i, datetime(2024, 1, 1, 0, 0, 0) + timedelta(seconds=7 * i))
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, "id long, ts timestamp")
    df.write.mode("overwrite").parquet(src)

    out = W.stream_delayed_windows(
        spark, src, df.schema, "ts", delay="30 seconds", interval="10 seconds"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("win_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["count"])
        for r in spark.sql("select * from win_test").collect()
    }
    # 20 events at 7s spacing over 133s → 10s windows with 1-2 events each
    assert sum(c for _, c in got) == 20
    assert all(c in (1, 2) for _, c in got)


def test_stateful_sessionization(spark, tmp_path):
    """applyInPandasWithState custom operator: gap-based sessions."""
    from elasticsearch_assets_spark.streaming.sessions import stream_sessions

    src = str(tmp_path / "sess_src")
    base = datetime(2024, 1, 1)
    rows = []
    # user 1: two sessions (3 events, gap, 2 events); user 2: one session
    for sec in [0, 10, 20, 5000, 5010]:
        rows.append((1, base + timedelta(seconds=sec)))
    for sec in [0, 30]:
        rows.append((2, base + timedelta(seconds=sec)))
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    df.write.mode("overwrite").parquet(src)

    out = stream_sessions(spark, src, df.schema, gap_sec=60.0)
    q = (
        out.writeStream.format("memory")
        .queryName("sess_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    # pending state timeouts keep the query alive past availableNow
    # (state-cleanup batch loop) — stop once the data batch commits
    from elasticsearch_assets_spark.streaming.sessions import (
        drain_closed_sessions,
    )

    drain_closed_sessions(q)
    got = {
        (r["user_id"], r["n_events"])
        for r in spark.sql("select * from sess_test").collect()
    }
    # closed sessions emitted within the batch: user 1's first session
    # (3 events) closed by the in-batch gap; open sessions (1x2 events,
    # 2x2 events) remain in state awaiting timeout
    assert (1, 3) in got


# ---- state storage ---------------------------------------------------------
def test_state_storage_roundtrip(spark, tmp_path):
    from elasticsearch_assets_spark.sources.state_storage import StateStorage

    st = StateStorage(spark, str(tmp_path / "state"), key="doc_id")
    assert st.table() is None
    assert st.get(1) is None

    st.mset(spark.createDataFrame([(1, "a"), (2, "b")], "doc_id long, v string"))
    assert st.get(1)["v"] == "a"

    # upsert: key 2 overwritten, key 3 added (last write wins)
    st.mset(spark.createDataFrame([(2, "B"), (3, "c")], "doc_id long, v string"))
    assert st.get(2)["v"] == "B"
    assert st.table().count() == 3

    keys = spark.createDataFrame([(2,), (3,), (99,)], "doc_id long")
    got = {r["doc_id"] for r in st.mget(keys).collect()}
    assert got == {2, 3}

    # first mset materialized a base snapshot; the second wrote ONLY a
    # delta (no full-table rewrite per call — the LSM write path)
    import os

    root = str(tmp_path / "state")
    assert len([d for d in os.listdir(root) if d.startswith("snapshot-")]) == 1
    assert len([d for d in os.listdir(root) if d.startswith("delta-")]) == 2


def test_state_storage_compaction(spark, tmp_path):
    from elasticsearch_assets_spark.sources.state_storage import StateStorage

    st = StateStorage(spark, str(tmp_path / "state"), key="doc_id", compact_every=3)
    for i in range(7):
        st.mset(
            spark.createDataFrame([(i % 4, f"v{i}")], "doc_id long, v string")
        )
    # last-write-wins survives compaction: keys 0..3, latest values
    got = {r["doc_id"]: r["v"] for r in st.table().collect()}
    assert got == {0: "v4", 1: "v5", 2: "v6", 3: "v3"}
    # deltas retire into fresh base snapshots every compact_every msets
    state = st._state()
    assert state["base"] is not None
    assert len(state["deltas"]) < 3


def test_commit_cas_single_winner_per_version(tmp_path):
    """The CAS primitive (hard-link claim): N threads race every
    version for 100 rounds — exactly one winner per version, and the
    committed file always carries the winner's fully-written state."""
    import threading

    from elasticsearch_assets_spark.sources.state_storage import StateStorage

    st = StateStorage.__new__(StateStorage)  # pointer layer only
    st.path = str(tmp_path / "cas")
    import os

    os.makedirs(st.path)
    for version in range(1, 101):
        wins = []
        lock = threading.Lock()

        def attempt(writer_id, version=version):
            ok = st._try_commit(version, {"base": f"w{writer_id}", "deltas": []})
            if ok:
                with lock:
                    wins.append(writer_id)

        threads = [
            threading.Thread(target=attempt, args=(w,)) for w in range(4)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert len(wins) == 1, f"version {version}: winners {wins}"
        state, ver = st._versioned_state()
        assert ver == version
        assert state == {"base": f"w{wins[0]}", "deltas": []}
    # no temp litter
    assert not [f for f in os.listdir(st.path) if f.startswith("_tmp-")]


def test_concurrent_writers_lose_no_delta(spark, tmp_path):
    """K1.i retry-on-conflict: two writers mset interleaved batches
    through their OWN storage handles over the same path — every key
    from both writers must survive (the old last-pointer-write-wins
    commit dropped the loser's delta)."""
    import threading

    from elasticsearch_assets_spark.sources.state_storage import StateStorage

    path = str(tmp_path / "race")
    errs = []

    def writer(wid):
        try:
            st = StateStorage(spark, path, key="doc_id", compact_every=3)
            for b in range(4):
                st.mset(
                    spark.createDataFrame(
                        [(wid * 1000 + b * 10 + i, f"w{wid}b{b}") for i in range(3)],
                        "doc_id long, v string",
                    )
                )
        except Exception as e:  # surface in main thread
            errs.append(e)

    threads = [threading.Thread(target=writer, args=(w,)) for w in (1, 2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs
    st = StateStorage(spark, path, key="doc_id")
    got = {r["doc_id"] for r in st.table().collect()}
    want = {
        w * 1000 + b * 10 + i for w in (1, 2) for b in range(4) for i in range(3)
    }
    assert got == want  # 24 keys, none lost to the commit race


# ---- multimodal plumbing ----------------------------------------------------
def test_multimodal_features(spark):
    from elasticsearch_assets_spark.operators import multimodal as MM

    docs = spark.createDataFrame(
        [(i, f"payload-{i}") for i in range(50)], "doc_id long, text string"
    )
    media = MM.synth_media(docs)
    feats = MM.extract_features(media)
    rows = feats.collect()
    assert len(rows) == 50
    for r in rows:
        assert len(r["features"]) == MM.FEATURE_DIM
        assert all(0.0 <= f <= 1.0 for f in r["features"])
        assert r["n_bytes"] > 0
    # determinism: same payload → same features
    again = {r["doc_id"]: r["features"] for r in MM.extract_features(media).collect()}
    assert again == {r["doc_id"]: r["features"] for r in rows}


def test_multimodal_decode_stub():
    from elasticsearch_assets_spark.operators import multimodal as MM

    with pytest.raises(NotImplementedError):
        MM.decode_image(b"xx", "image/png")


def test_frame_sample_plan(spark):
    from elasticsearch_assets_spark.operators import multimodal as MM

    docs = spark.createDataFrame([(2500, "x")], "doc_id long, text string")
    media = MM.synth_media(docs)
    plan = MM.frame_sample_plan(media, every_ms=1000).collect()[0]
    dur = plan["media_meta"]["duration_ms"]
    assert plan["frame_ts_ms"] == list(range(0, dur, 1000))


def test_media_header_parse_goldens():
    # pure-byte header parse (VERDICT r5 #6): PNG/JPEG/GIF dims without
    # an imaging library; garbage/truncated -> None
    from elasticsearch_assets_spark.operators import multimodal as MM

    assert MM.parse_media_header(MM.synth_png_bytes(640, 480)) == (
        "image/png", 640, 480,
    )
    assert MM.parse_media_header(MM.synth_jpeg_bytes(123, 77)) == (
        "image/jpeg", 123, 77,
    )
    # width past the 16-bit JPEG limit exercises the uint32 PNG path
    assert MM.parse_media_header(MM.synth_png_bytes(70000, 1)) == (
        "image/png", 70000, 1,
    )
    gif = b"GIF89a" + (320).to_bytes(2, "little") + (200).to_bytes(2, "little") + b"\x00" * 4
    assert MM.parse_media_header(gif) == ("image/gif", 320, 200)
    assert MM.parse_media_header(b"") is None
    assert MM.parse_media_header(b"not an image at all") is None
    assert MM.parse_media_header(MM.synth_png_bytes(1, 1)[:10]) is None
    # JPEG with EOI before any SOF (no frame header)
    assert MM.parse_media_header(b"\xff\xd8\xff\xd9") is None
    # JPEG with restart markers + fill bytes before the SOF still parses
    weird = (
        b"\xff\xd8" + b"\xff\xff" + b"\xff\xd0"
        + b"\xff\xc0" + (11).to_bytes(2, "big") + b"\x08"
        + (9).to_bytes(2, "big") + (7).to_bytes(2, "big") + b"\x01\x11\x00"
        + b"\xff\xd9"
    )
    assert MM.parse_media_header(weird) == ("image/jpeg", 7, 9)


def test_media_meta_from_payload(spark):
    from elasticsearch_assets_spark.operators import multimodal as MM

    docs = spark.createDataFrame(
        [(i,) for i in range(20)] , "doc_id long"
    )
    out = {
        r["doc_id"]: (r["mime"], r["width"], r["height"])
        for r in MM.media_meta_from_payload(MM.synth_real_media(docs)).collect()
    }
    for i in range(20):
        mime = "image/png" if i % 2 == 0 else "image/jpeg"
        assert out[i] == (mime, i % 640 + 1, i % 480 + 1), (i, out[i])
    # unparseable payloads surface as NULL metadata, not dropped rows
    bad = spark.createDataFrame(
        [(99, bytearray(b"junk"))], "doc_id long, media binary"
    )
    row = MM.media_meta_from_payload(bad).collect()[0]
    assert (row["mime"], row["width"], row["height"]) == (None, None, None)


def test_window_state_barrier_unit():
    # WindowState unit goldens (test/unit/window_state-spec.ts)
    from elasticsearch_assets_spark.streaming.windows import WindowState

    one = WindowState(1)
    assert one.checkin(0) is True
    assert one.checkin(0) is True  # single slicer always proceeds

    st = WindowState(2)
    assert st.checkin(0) is False  # waiting on slicer 1
    assert st.checkin(0) is False
    assert st.checkin(1) is True   # window complete → 1 restarts
    assert st.checkin(1) is False  # now 1 waits on 0
    assert st.checkin(0) is True
    assert st.checkin(1) is True
    assert st.checkin(1) is False
    assert st.checkin(0) is True


def test_state_storage_gc_prunes_metadata(spark, tmp_path):
    """ADVICE r4: commits, retired deltas, and superseded snapshots must
    not grow unboundedly. With keep_commits=2 and no grace window, after
    many msets only the retained commits and the dirs they reference
    remain; the surviving state stays correct."""
    import glob
    import os

    from elasticsearch_assets_spark.sources.state_storage import StateStorage

    path = str(tmp_path / "gc")
    st = StateStorage(
        spark, path, key="doc_id", compact_every=3,
        keep_commits=2, gc_grace_seconds=0.0,
    )
    for i in range(10):
        st.mset(
            spark.createDataFrame([(i % 4, f"v{i}")], "doc_id long, v string")
        )
    commits = glob.glob(os.path.join(path, "_commit-*.json"))
    assert len(commits) <= 3, commits  # newest + keep_commits
    # every surviving data dir is referenced by a retained commit
    import json as _json

    referenced = set()
    for c in commits:
        with open(c) as f:
            s = _json.load(f)
        if s.get("base"):
            referenced.add(os.path.basename(s["base"]))
        referenced.update(os.path.basename(d) for d in s.get("deltas", []))
    data_dirs = {
        n for n in os.listdir(path)
        if n.startswith(("delta-", "snapshot-"))
    }
    assert data_dirs == referenced, (data_dirs, referenced)
    # state is still the right last-write-wins view
    got = {r["doc_id"]: r["v"] for r in st.table().collect()}
    assert got == {0: "v8", 1: "v9", 2: "v6", 3: "v7"}
    # a FRESH handle (cold cache, full listing) resolves identically
    st2 = StateStorage(spark, path, key="doc_id")
    got2 = {r["doc_id"]: r["v"] for r in st2.table().collect()}
    assert got2 == got
