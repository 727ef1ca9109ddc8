"""Unit tests for the multimodal payload/feature plumbing."""

from __future__ import annotations

import pytest

from flink_cdc_fluss_quickstart_spark.functions import multimodal


def test_decode_media_real_is_gated():
    with pytest.raises(NotImplementedError):
        multimodal.decode_media(b"abc", "image/png", mode="real")


def test_decode_media_stub_deterministic():
    a = multimodal.decode_media(b"hello", "text/plain")
    b = multimodal.decode_media(b"hello", "text/plain")
    assert a == b
    assert len(a) == multimodal.FEATURE_DIMS
    assert all(0.0 <= x <= 1.0 for x in a)
    assert multimodal.decode_media(b"other", "text/plain") != a


def test_frame_sample_fanout(spark):
    docs = spark.createDataFrame(
        [(1, "abcdefghij" * 10), (2, "x"), (3, "")], "doc_id long, text string"
    )
    out = multimodal.frame_sample(multimodal.attach_payload(docs)).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # every payload fans out to exactly N_FRAMES rows, even empty ones
    assert {k: len(v) for k, v in by_doc.items()} == {1: 4, 2: 4, 3: 4}
    # frames are evenly spaced and frame_len-capped
    r1 = sorted(by_doc[1], key=lambda r: r["frame_idx"])
    assert [r["frame_chars"] for r in r1] == [16, 16, 16, 16]
    import hashlib

    assert r1[1]["frame_digest"] == hashlib.md5(("abcdefghij" * 10)[25:41].encode()).hexdigest()
    # empty payload: empty frames with the md5("") digest
    assert by_doc[3][0]["frame_digest"] == hashlib.md5(b"").hexdigest()


def test_resize_payload(spark):
    docs = spark.createDataFrame([(1, "abcdef"), (2, "ab")], "doc_id long, text string")
    out = multimodal.resize_payload(multimodal.attach_payload(docs), 4).collect()
    got = {r["doc_id"]: (bytes(r["payload"]), r["n_bytes"]) for r in out}
    assert got == {1: (b"abcd", 4), 2: (b"ab", 2)}


def test_extract_features_pipeline(spark):
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "naïve café"), (3, "")],
        "doc_id long, text string",
    )
    frame = multimodal.attach_payload(docs)
    assert dict(frame.dtypes)["payload"] == "binary"

    out = multimodal.extract_features(frame)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(out.columns) == {"doc_id", "media_type", "n_bytes", "f0", "f1", "f2", "f3"}
    # multi-byte chars: n_bytes counts utf-8 octets, not characters
    assert rows[2]["n_bytes"] == len("naïve café".encode("utf-8"))
    # features equal the python-side stub on the same bytes
    expected = multimodal.decode_media("hello world".encode(), "text/plain")
    assert [rows[1][f"f{k}"] for k in range(4)] == expected
    # re-running is deterministic (no per-partition / per-batch state leaks)
    assert out.collect() == out.collect()
