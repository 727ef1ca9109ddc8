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


def test_raster_features_respond_to_signal_structure():
    """mode="raster" computes real signal statistics over the byte raster:
    a constant payload has zero contrast and zero edge energy, a smooth ramp
    concentrates its AC energy in the low-frequency DCT block, and an
    alternating (max-frequency) payload shows high edge energy with almost
    no low-frequency share -- the orderings a quality gate thresholds on."""
    import itertools

    const = bytes([128]) * 400
    ramp = bytes(range(200)) + bytes(range(200))
    alt = bytes(itertools.islice(itertools.cycle([0, 255]), 400))
    f_const = multimodal.decode_media(const, "image/png", mode="raster")
    f_ramp = multimodal.decode_media(ramp, "image/png", mode="raster")
    f_alt = multimodal.decode_media(alt, "image/png", mode="raster")
    assert f_const[1] == 0.0 and f_const[3] == 0.0      # no contrast, no edges
    assert f_ramp[2] > 0.8                               # low-frequency dominated
    assert f_ramp[3] < 0.01                              # smooth
    assert f_alt[3] > 0.25                               # edge-dominated
    assert f_alt[2] < 0.01                               # no low-frequency mass
    assert f_ramp[2] > f_text_low_share() > f_alt[2]     # text sits between


def f_text_low_share():
    payload = ("the spark engine rewrites every query plan " * 10).encode()
    return multimodal.decode_media(payload, "text/plain", mode="raster")[2]


def test_raster_mode_flows_through_extract_features(spark):
    """The Arrow mapInPandas seam accepts the raster mode unchanged: same
    schema, per-row features equal the local function's output."""
    docs = spark.createDataFrame(
        [(1, "constant constant constant"), (2, "a b c d e f g h i j")],
        "doc_id bigint, text string",
    )
    frame = multimodal.attach_payload(docs)
    rows = {
        r["doc_id"]: [r[f"f{k}"] for k in range(multimodal.FEATURE_DIMS)]
        for r in multimodal.extract_features(frame, mode="raster").collect()
    }
    for doc_id, text in [(1, "constant constant constant"), (2, "a b c d e f g h i j")]:
        assert rows[doc_id] == multimodal.raster_features(text.encode())
