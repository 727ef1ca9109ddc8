"""mode="real" codec-free decode: the BMP/PPM/PGM payload classes run the
ACTUAL decode -> grayscale -> resize -> DCT feature/hash path (no byte-raster
stand-in), closing the last `partial` in the operator inventory. Reference
parity target: the reference treats media payloads as opaque lake blobs;
these tests pin the exact pixel semantics of the native decoders."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from flink_cdc_fluss_quickstart_spark.functions import multimodal as mm


def make_bmp(pixels: np.ndarray, bpp: int = 24, top_down: bool = False) -> bytes:
    """Hand-assembled uncompressed BMP from an (h, w, 3) uint8 RGB array."""
    h, w, _ = pixels.shape
    nb = bpp // 8
    stride = ((w * nb + 3) // 4) * 4
    rows = []
    order = range(h) if top_down else range(h - 1, -1, -1)
    for y in order:
        row = bytearray()
        for x in range(w):
            r, g, b = (int(v) for v in pixels[y, x])
            row += bytes((b, g, r)) + (b"\xff" if nb == 4 else b"")
        row += b"\x00" * (stride - len(row))
        rows.append(bytes(row))
    data = b"".join(rows)
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(data), 0, 0, off)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, -h if top_down else h, 1, bpp, 0, len(data), 2835, 2835, 0, 0
    )
    return header + dib + data


def make_ppm(pixels: np.ndarray, maxval: int = 255, comment: bool = False) -> bytes:
    h, w, _ = pixels.shape
    head = b"P6\n" + (b"# planted\n" if comment else b"") + f"{w} {h}\n{maxval}\n".encode()
    return head + pixels.astype(np.uint8).tobytes()


def make_pgm(gray: np.ndarray, maxval: int = 255) -> bytes:
    h, w = gray.shape
    return f"P5\n{w} {h}\n{maxval}\n".encode() + gray.astype(np.uint8).tobytes()


def luma(px: np.ndarray) -> np.ndarray:
    px = px.astype(np.float64)
    return (299.0 * px[..., 0] + 587.0 * px[..., 1] + 114.0 * px[..., 2]) / 1000.0


def gradient_rgb(h: int = 48, w: int = 40) -> np.ndarray:
    y, x = np.mgrid[0:h, 0:w]
    return np.stack(
        [(x * 255) // max(w - 1, 1), (y * 255) // max(h - 1, 1), (x + y) % 256], axis=-1
    ).astype(np.uint8)


# --- decode_image pixel-exactness ------------------------------------------


def test_bmp_bottom_up_exact_pixels_and_stride():
    # 2x2 with distinct corners; w=2 at 24bpp -> 6 bytes/row padded to 8
    px = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 255, 255]]], dtype=np.uint8
    )
    img = mm.decode_image(make_bmp(px))
    assert img.shape == (2, 2)
    np.testing.assert_allclose(img, luma(px))


def test_bmp_top_down_matches_bottom_up():
    px = gradient_rgb(5, 7)
    up = mm.decode_image(make_bmp(px))
    down = mm.decode_image(make_bmp(px, top_down=True))
    np.testing.assert_allclose(up, down)
    np.testing.assert_allclose(up, luma(px))


def test_bmp_32bpp_matches_24bpp():
    px = gradient_rgb(6, 6)
    np.testing.assert_allclose(
        mm.decode_image(make_bmp(px, bpp=32)), mm.decode_image(make_bmp(px, bpp=24))
    )


def test_ppm_with_comment_and_maxval_scaling():
    px = gradient_rgb(4, 4)
    np.testing.assert_allclose(mm.decode_image(make_ppm(px, comment=True)), luma(px))
    # maxval 127 scales samples to the [0, 255] range
    half = (px // 2).astype(np.uint8)
    np.testing.assert_allclose(
        mm.decode_image(make_ppm(half, maxval=127)), luma(half) * (255.0 / 127.0)
    )


def test_pgm_grayscale_exact():
    g = np.arange(12, dtype=np.uint8).reshape(3, 4) * 20
    np.testing.assert_allclose(mm.decode_image(make_pgm(g)), g.astype(np.float64))


def test_netpbm_crlf_header_terminator_is_one_separator():
    """A header whose post-maxval terminator is '\\r\\n' (CRLF-written file)
    must not read the '\\n' as the first pixel sample -- that shifted every
    sample by one byte into a plausible-but-wrong raster (r9 advice)."""
    g = np.arange(12, dtype=np.uint8).reshape(3, 4) * 20
    crlf = b"P5\r\n4 3\r\n255\r\n" + g.tobytes()
    np.testing.assert_allclose(mm.decode_image(crlf), g.astype(np.float64))
    # bare-'\r' terminator (no LF) still consumes exactly one byte
    cr_only = b"P5\n4 3\n255\r" + g.tobytes()
    np.testing.assert_allclose(mm.decode_image(cr_only), g.astype(np.float64))
    # and the P6 color path agrees with its LF twin on the same pixels
    px = gradient_rgb(4, 4)
    lf = make_ppm(px)
    crlf6 = b"P6\r\n4 4\r\n255\r\n" + px.astype(np.uint8).tobytes()
    np.testing.assert_allclose(mm.decode_image(crlf6), mm.decode_image(lf))


def test_netpbm_bare_cr_with_lf_first_sample_disambiguated_by_size():
    """The netpbm spec allows a bare '\\r' header terminator; a file whose
    FIRST SAMPLE is legitimately 0x0A then looks byte-identical to a CRLF
    header. Size disambiguates (r10 advice): skipping only the '\\r' leaves
    exactly w*h samples here, so the 0x0A must be read as pixel data --
    the old heuristic consumed both bytes and rejected the valid file."""
    g = np.arange(12, dtype=np.uint8).reshape(3, 4) * 20
    g[0, 0] = 0x0A  # first raster byte is LF
    ambiguous = b"P5\n4 3\n255\r" + g.tobytes()  # exact fit after one byte
    np.testing.assert_allclose(mm.decode_image(ambiguous), g.astype(np.float64))
    # the CRLF exact-fit twin still skips both separator bytes
    crlf = b"P5\n4 3\n255\r\n" + g.tobytes()
    np.testing.assert_allclose(mm.decode_image(crlf), g.astype(np.float64))


def test_non_image_and_truncated_payloads_return_none():
    assert mm.decode_image(b"plain text payload") is None
    assert mm.decode_image(b"\x89PNG\r\n\x1a\n....") is None  # codec format
    bmp = make_bmp(gradient_rgb(8, 8))
    assert mm.decode_image(bmp[: len(bmp) // 2]) is None  # truncated pixel data
    ppm = make_ppm(gradient_rgb(8, 8))
    assert mm.decode_image(ppm[:-10]) is None


# --- decode_media(mode="real") ----------------------------------------------


def test_real_features_constant_image_has_zero_contrast():
    px = np.full((16, 16, 3), 200, dtype=np.uint8)
    f = mm.decode_media(make_bmp(px), "image/bmp", mode="real")
    assert f[0] == pytest.approx(200.0 / 255.0)
    assert f[1] == 0.0  # std of a constant raster
    assert f[3] == 0.0  # no horizontal gradient


def test_real_mode_still_raises_for_codec_formats():
    with pytest.raises(NotImplementedError, match="codec"):
        mm.decode_media(b"\xff\xd8\xff\xe0 jpeg-ish", "image/jpeg", mode="real")


def test_real_features_match_hand_computed_raster():
    px = gradient_rgb()
    expected = mm._features_from_raster(mm._resize_gray(luma(px), mm.PHASH_RASTER))
    assert mm.decode_media(make_bmp(px), "image/bmp", mode="real") == expected


# --- real pHash over decoded payloads ----------------------------------------


def test_phash_same_image_across_formats_is_identical():
    """The whole point of a perceptual hash: one image, three encodings
    (BMP bottom-up, BMP top-down, PPM) -> one hash; brightness shift -> one
    hash (DC excluded from the median threshold)."""
    px = (gradient_rgb().astype(int) * 200 // 255).astype(np.uint8)  # <= 200
    h1, h2, h3, h4 = mm.phash_real_batch(
        [
            make_bmp(px),
            make_bmp(px, top_down=True),
            make_ppm(px),
            make_bmp((px.astype(int) + 30).astype(np.uint8)),  # no saturation
        ]
    )
    assert h1 == h2 == h3
    # uniform +30 brightness moves only the DC coefficient, which is
    # excluded from the median threshold -> identical hash
    assert h1 == h4


def test_phash_different_images_differ():
    px = gradient_rgb()
    other = px[::-1].copy()  # vertical flip: different low-frequency structure
    h1, h2 = mm.phash_real_batch([make_bmp(px), make_bmp(other)])
    assert h1 != h2


# --- Spark-side real-mode pipeline -------------------------------------------


def test_real_mode_pipeline_finds_cross_format_pairs(spark):
    """End-to-end on the executor: binary BMP/PPM payloads of the same image
    under different encodings collide through perceptual_hash(mode='real') +
    phash_pairs -- the image-dedup shape the stub mode stands in for."""
    import pyspark.sql.functions as F

    px_a, px_b = gradient_rgb(), gradient_rgb(32, 52)
    rows = [
        (1, bytearray(make_bmp(px_a))),
        (2, bytearray(make_ppm(px_a))),       # same image, different format
        (3, bytearray(make_bmp(px_b))),       # different image
        (4, bytearray(b"not an image at all")),  # byte-raster fallback
    ]
    frame = spark.createDataFrame(rows, "doc_id long, payload binary").select(
        "doc_id", "payload", F.lit("image/bmp").alias("media_type"),
        F.length("payload").cast("long").alias("n_bytes"),
    )
    hashes = mm.perceptual_hash(frame, mode="real")
    pairs = {(r.id_a, r.id_b) for r in mm.phash_pairs(hashes).collect()}
    assert (1, 2) in pairs
    assert all(p == (1, 2) for p in pairs)


# --- property-based round-trips (pure numpy, no Spark) ------------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    dims = st.tuples(st.integers(1, 23), st.integers(1, 23))

    @settings(max_examples=40, deadline=None)
    @given(dims=dims, seed=st.integers(0, 2**31 - 1), bpp=st.sampled_from([24, 32]),
           top_down=st.booleans())
    def test_bmp_roundtrip_any_shape(dims, seed, bpp, top_down):
        """encode(decode) identity over arbitrary (h, w) incl. stride-padding
        widths, both bit depths and both row orders."""
        h, w = dims
        px = np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
        img = mm.decode_image(make_bmp(px, bpp=bpp, top_down=top_down))
        np.testing.assert_allclose(img, luma(px))

    @settings(max_examples=40, deadline=None)
    @given(dims=dims, seed=st.integers(0, 2**31 - 1), maxval=st.integers(1, 255),
           gray=st.booleans())
    def test_netpbm_roundtrip_any_shape_and_maxval(dims, seed, maxval, gray):
        h, w = dims
        rng = np.random.default_rng(seed)
        if gray:
            g = rng.integers(0, maxval + 1, (h, w), dtype=np.uint8)
            img = mm.decode_image(make_pgm(g, maxval=maxval))
            np.testing.assert_allclose(img, g.astype(np.float64) * (255.0 / maxval))
        else:
            px = rng.integers(0, maxval + 1, (h, w, 3), dtype=np.uint8)
            img = mm.decode_image(make_ppm(px, maxval=maxval))
            np.testing.assert_allclose(img, luma(px) * (255.0 / maxval))

    @settings(max_examples=30, deadline=None)
    @given(payload=st.binary(min_size=0, max_size=200))
    def test_arbitrary_bytes_never_crash_decode(payload):
        """decode_image on arbitrary bytes returns an array or None, never
        raises -- malformed headers, truncations, random magic included."""
        img = mm.decode_image(payload)
        assert img is None or img.ndim == 2

except ImportError:  # pragma: no cover - hypothesis is in the test env
    pass


# --- optional-PIL codec seam (skip-if-absent) --------------------------------


def test_png_routes_through_real_decode_when_pil_present():
    """The production wiring point for codec-bound formats, kept honest
    without faking a codec: WITH Pillow installed (absent in this
    container, so this skips here and runs elsewhere), a real PNG payload
    must route through decode_media(mode='real') -- PIL decode, mode-'L'
    luma (the same ITU-R 601 weights as the native paths), then the shared
    raster feature math -- instead of hitting the NotImplementedError
    seam."""
    PIL = pytest.importorskip("PIL")
    import io

    from PIL import Image

    px = gradient_rgb(24, 24)
    buf = io.BytesIO()
    Image.fromarray(px, mode="RGB").save(buf, format="PNG")
    payload = buf.getvalue()
    assert payload[:8] == b"\x89PNG\r\n\x1a\n"

    img = mm.decode_image(payload)
    assert img is not None and img.shape == (24, 24)
    # PIL mode-'L' is integer-rounded 601 luma; stay within rounding of ours
    assert np.abs(img - luma(px)).max() <= 1.0

    feats = mm.decode_media(payload, "image/png", mode="real")
    expect = mm._features_from_raster(mm._resize_gray(img, mm.PHASH_RASTER))
    assert feats == expect

    # a corrupt payload still falls through to the documented seam
    with pytest.raises(NotImplementedError, match="codec"):
        mm.decode_media(payload[:20], "image/png", mode="real")
