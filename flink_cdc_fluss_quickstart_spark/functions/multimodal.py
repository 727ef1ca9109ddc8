"""Multimodal column plumbing: opaque binary payloads + typed metadata, with
Arrow-batched (mapInPandas) decode / feature-extract operators.

Design for 100 TB: the payload column is opaque BINARY and never leaves the
executor -- all per-row work happens inside `mapInPandas` over Arrow batches
(controlled by spark.sql.execution.arrow.maxRecordsPerBatch), so the Python
boundary is vectorized, and the output drops the payload so downstream
shuffles move only metadata + features.

mode="real" natively decodes the codec-free raster formats in pure numpy
(uncompressed 24/32-bit BMP, binary PPM/PGM -> grayscale -> resize -> the
same DCT feature/hash math) and raises a clearly-marked NotImplementedError
for formats that genuinely need codec libraries absent here (JPEG/PNG/
audio/video -- wire PIL/ffmpeg at that seam in production). mode="stub"
derives a deterministic digest-based fake so the full pipeline (schema,
batching, partitioning, feature columns) is exercised end-to-end and
oracle-checkable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from flink_cdc_fluss_quickstart_spark.tables import spread

FEATURE_DIMS = 4
_HEX = "0123456789abcdef"

# metadata the engine types alongside every payload column
PAYLOAD_META_COLS = ("media_type", "n_bytes")

FEATURE_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, "
    + ", ".join(f"f{k} double" for k in range(FEATURE_DIMS))
)


def attach_payload(documents: DataFrame, media_type: str = "text/plain") -> DataFrame:
    """Typed multimodal frame from the documents table: the utf-8 bytes of
    `text` stand in for an opaque media payload. All JVM-side."""
    return documents.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.lit(media_type).alias("media_type"),
        F.length(F.encode(F.col("text"), "utf-8")).cast("long").alias("n_bytes"),
    )


def decode_media(payload: bytes, media_type: str, mode: str = "stub") -> list[float]:
    """Decode one payload into a FEATURE_DIMS-dim feature vector.

    mode="real" REALLY decodes the codec-free raster formats (decode_image:
    uncompressed BMP, binary PPM/PGM) -> grayscale -> resize -> the raster
    feature math, and raises NotImplementedError for payloads needing codec
    libraries (JPEG/PNG/audio/video -- the PIL/ffmpeg integration point).
    mode="raster" runs real signal math
    over the deterministic byte raster (the pHash precedent: only the
    decode step is stood in for): mean level, contrast (std), low-frequency
    DCT energy share, and edge energy -- the feature set a quality gate
    thresholds on. mode="stub" (default, SQL-expressible) is a
    deterministic fake: feature k is the k-th 4-hex-digit group of
    md5(payload) scaled to [0, 1].
    """
    if mode == "real":
        img = decode_image(payload)
        if img is None:
            raise NotImplementedError(
                "mode='real' decodes the codec-free raster formats natively"
                " (uncompressed 24/32-bit BMP, binary PPM/PGM); this payload"
                " is none of those -- wire PIL/torchaudio/ffmpeg here for"
                " JPEG/PNG/audio/video in production"
            )
        return _features_from_raster(_resize_gray(img, PHASH_RASTER))
    if mode == "raster":
        return raster_features(payload)
    digest = hashlib.md5(payload).hexdigest()
    return [int(digest[4 * k : 4 * k + 4], 16) / 65535.0 for k in range(FEATURE_DIMS)]


def raster_features(payload: bytes) -> list[float]:
    """Real signal statistics over the byte raster (the decoded-image twin is
    decode_media(mode='real') -> _features_from_raster; the math is shared):

    f0 mean level in [0, 1]         -- brightness
    f1 std dev in [0, 1]            -- contrast (0 for a constant payload)
    f2 low-frequency DCT energy share -- structure vs noise (AC coeffs of the
       8x8 low block over total AC energy; DC excluded from both sides)
    f3 mean absolute horizontal gradient in [0, 1] -- edge energy
    """
    return _features_from_raster(_byte_raster(payload, PHASH_RASTER))


def _features_from_raster(img) -> list[float]:
    """The raster_features math over an (n, n) float64 grayscale array in
    [0, 255] -- one implementation whether the raster came from the byte
    stand-in (_byte_raster) or a real decoded image (decode_image)."""
    import numpy as np

    d = _dct_matrix(img.shape[0])
    coeffs = d @ img @ d.T
    ac = coeffs**2
    ac[0, 0] = 0.0
    total = float(ac.sum())
    low_share = float(ac[:8, :8].sum()) / total if total > 0 else 0.0
    grad = float(np.abs(np.diff(img, axis=1)).mean()) / 255.0
    return [float(img.mean()) / 255.0, float(img.std()) / 255.0, low_share, grad]


def decode_image(payload: bytes):
    """Pure-numpy decode of the CODEC-FREE raster image formats into an
    (h, w) float64 grayscale array in [0, 255], or None when the payload is
    not one of them (JPEG/PNG/... genuinely need codec libraries and stay
    behind the NotImplementedError seam):

    - BMP ('BM'): uncompressed (BI_RGB) 24/32-bit, bottom-up or top-down,
      4-byte row stride honored; BGR(A) -> integer-milli luma.
    - PPM ('P6') / PGM ('P5'): binary netpbm with whitespace/comment
      header handling, maxval <= 255.

    Luma = (299 R + 587 G + 114 B) / 1000 (ITU-R BT.601 in exact
    milli-weights, so the grayscale is deterministic float64).
    """
    import numpy as np

    if payload[:2] == b"BM" and len(payload) >= 54:
        off = int.from_bytes(payload[10:14], "little")
        w = int.from_bytes(payload[18:22], "little", signed=True)
        h = int.from_bytes(payload[22:26], "little", signed=True)
        bpp = int.from_bytes(payload[28:30], "little")
        comp = int.from_bytes(payload[30:34], "little")
        if comp != 0 or bpp not in (24, 32) or w <= 0 or h == 0:
            return None
        bottom_up, ah = h > 0, abs(h)
        nb = bpp // 8
        stride = ((w * nb + 3) // 4) * 4
        if len(payload) < off + stride * ah:
            return None
        rows = np.frombuffer(payload, np.uint8, count=stride * ah, offset=off)
        px = rows.reshape(ah, stride)[:, : w * nb].reshape(ah, w, nb).astype(np.float64)
        gray = (299.0 * px[..., 2] + 587.0 * px[..., 1] + 114.0 * px[..., 0]) / 1000.0
        return gray[::-1] if bottom_up else gray
    if payload[:2] in (b"P5", b"P6"):
        vals, i = [], 2
        while len(vals) < 3 and i < len(payload):
            c = payload[i : i + 1]
            if c == b"#":  # comment to end of line
                nl = payload.find(b"\n", i)
                i = len(payload) if nl == -1 else nl + 1
            elif c.isspace():
                i += 1
            elif c.isdigit():
                j = i
                while j < len(payload) and payload[j : j + 1].isdigit():
                    j += 1
                vals.append(int(payload[i:j]))
                i = j
            else:
                return None
        if len(vals) < 3 or i >= len(payload) or not payload[i : i + 1].isspace():
            return None
        w, h, maxval = vals
        if w <= 0 or h <= 0 or not 0 < maxval <= 255:
            return None
        nch = 3 if payload[:2] == b"P6" else 1
        # single whitespace after maxval, then binary samples. The spec says
        # ONE whitespace byte, so a '\r\n' pair is ambiguous: CRLF-written
        # header (skip both) vs bare-'\r' terminator whose first sample is
        # legitimately 0x0A (skip one). Disambiguate by size: if skipping
        # just the '\r' leaves EXACTLY w*h*nch payload bytes, the 0x0A is a
        # sample; otherwise it is separator residue from a CRLF writer.
        i += 1
        if payload[i - 1 : i + 1] == b"\r\n" and len(payload) - i != w * h * nch:
            i += 1
        if len(payload) < i + w * h * nch:
            return None
        px = np.frombuffer(payload, np.uint8, count=w * h * nch, offset=i).astype(np.float64)
        scale = 255.0 / maxval
        if nch == 1:
            return px.reshape(h, w) * scale
        px = px.reshape(h, w, 3)
        return (299.0 * px[..., 0] + 587.0 * px[..., 1] + 114.0 * px[..., 2]) / 1000.0 * scale
    return _decode_with_pil(payload)


def _decode_with_pil(payload: bytes):
    """The PRODUCTION wiring point for codec-bound formats (JPEG/PNG/...):
    when the optional PIL dependency is importable, decode through it and
    convert with mode 'L' -- Pillow's ITU-R 601 luma, the same
    (299 R + 587 G + 114 B)/1000 weights the native paths use. Returns None
    when PIL is absent (this container) or the payload is not an image it
    can decode, which keeps the documented NotImplementedError seam for
    genuinely codec-bound payloads. Exercised by the skip-if-absent test in
    tests/test_multimodal_real_decode.py so the wiring stays honest without
    faking a codec."""
    try:
        from PIL import Image
    except ImportError:
        return None
    import io

    import numpy as np

    try:
        with Image.open(io.BytesIO(payload)) as im:
            return np.asarray(im.convert("L"), dtype=np.float64)
    except Exception:  # noqa: BLE001 -- not decodable: fall through to the seam
        return None


def _resize_gray(img, n: int):
    """Deterministic nearest-index downsample/upsample of an (h, w) array to
    (n, n): index map i_src = floor(i * h / n) -- integer arithmetic, no
    interpolation ambiguity across platforms."""
    import numpy as np

    h, w = img.shape
    return img[(np.arange(n) * h) // n][:, (np.arange(n) * w) // n]


def _decoded_or_byte_raster(payload: bytes, n: int):
    """The shared raster entry for mode='real' paths: a decodable codec-free
    image payload becomes its real grayscale raster resized to (n, n); any
    other payload keeps the deterministic byte-raster stand-in."""
    img = decode_image(payload)
    return _byte_raster(payload, n) if img is None else _resize_gray(img, n)


def extract_features(frame: DataFrame, mode: str = "stub") -> DataFrame:
    """Arrow-batched feature extraction over the payload column.

    Output drops the payload (features + metadata only), so everything after
    this operator shuffles narrow rows.
    """

    def run(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            feats = [decode_media(p, m, mode) for p, m in zip(pdf["payload"], pdf["media_type"])]
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                }
            )
            for k in range(FEATURE_DIMS):
                out[f"f{k}"] = [f[k] for f in feats]
            yield out

    return spread(frame).mapInPandas(run, schema=FEATURE_SCHEMA)


N_FRAMES = 4
FRAME_LEN = 16  # characters per sampled frame

FRAME_SCHEMA = "doc_id long, frame_idx int, frame_chars long, frame_digest string"


def frame_sample(frame: DataFrame, n_frames: int = N_FRAMES, frame_len: int = FRAME_LEN) -> DataFrame:
    """Frame sampling: each payload fans out to `n_frames` evenly-spaced
    sample windows (the video-frame / audio-chunk extraction shape). One
    input row -> n_frames output rows, produced inside mapInPandas so the
    payload never crosses the boundary more than once.

    The decoder stub samples by utf-8 CODE POINTS (a real media build slices
    byte ranges instead -- swap inside `windows`): window k of a payload with
    L units starts at floor(k*L/n) and spans `frame_len` units; the emitted
    digest is md5 of the window.
    """

    def run(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:  # noqa: F821
        import pandas as pd

        def windows(payload: bytes) -> list[tuple[int, int, str]]:
            s = payload.decode("utf-8")
            out = []
            for k in range(n_frames):
                w = s[(k * len(s)) // n_frames :][:frame_len]
                out.append((k, len(w), hashlib.md5(w.encode("utf-8")).hexdigest()))
            return out

        for pdf in batches:
            rows = [
                (doc_id, k, n, dig)
                for doc_id, payload in zip(pdf["doc_id"], pdf["payload"])
                for (k, n, dig) in windows(payload)
            ]
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame_chars", "frame_digest"])

    return spread(frame).mapInPandas(run, schema=FRAME_SCHEMA)


def resize_payload(frame: DataFrame, n_bytes: int) -> DataFrame:
    """'Resize' stub: truncate every payload to its first `n_bytes` bytes,
    JVM-side (a real image build replaces this with a decode-resize-encode
    pandas UDF). Keeps metadata in sync."""
    return frame.withColumn(
        "payload", F.expr(f"substring(payload, 1, {int(n_bytes)})")
    ).withColumn("n_bytes", F.least(F.col("n_bytes"), F.lit(int(n_bytes)).cast("long")))


def hex4_sql(expr: str, group: int) -> str:
    """DuckDB spelling of one stub feature: parse the 4-hex-digit group
    `group` of md5(expr) into an int via positional digit lookup (no
    hex-literal casts, so it is portable op-for-op)."""
    start = 4 * group + 1
    digits = [
        f"(instr('{_HEX}', substr(md5({expr}), {start + j}, 1)) - 1) * {16 ** (3 - j)}"
        for j in range(4)
    ]
    return "(" + " + ".join(digits) + ") / 65535.0"


PHASH_BANDS = 4  # 16-bit bands over the 64-bit hash (LSH candidate blocking)
# Verify-stage acceptance radius. RECALL CONTRACT: the band blocking only
# GUARANTEES a shared band for pairs at Hamming distance < PHASH_BANDS
# (pigeonhole); pairs at distance 4..PHASH_HAMMING_MAX are found only when
# their differing bits cluster into <= 3 bands -- likely for real perceptual
# edits (a local change perturbs adjacent DCT coefficients, which land in the
# same band), but not guaranteed. Raising PHASH_BANDS to cover d=8 exactly
# would need 9+ bands of <8 bits, whose tiny key space (<=2^7 values) makes
# every bucket corpus/128-sized -- a quadratic blow-up at scale. The 4x16-bit
# layout is the standard pHash-dedup trade: exact recall below 4 bits,
# clustered-error recall up to the verify radius, bounded bucket sizes.
PHASH_HAMMING_MAX = 8

PHASH_SCHEMA = "doc_id long, phash string"

PHASH_RASTER = 32  # real-mode raster side: payload bytes -> 32x32 grayscale
PHASH_DCT_LOW = 8  # low-frequency DCT block kept (classic pHash keeps 8x8)


def _byte_raster(payload: bytes, n: int):
    """Deterministic bytes -> n x n float64 grayscale raster
    (linear-interpolated resample of the byte sequence): the shared
    stand-in for a decoded, resized image. A production image build swaps
    EXACTLY this function for `decode -> grayscale -> resize`; both the
    pHash recipe and the raster quality features consume it, so the swap
    happens in one place."""
    import numpy as np

    b = np.frombuffer(bytes(payload), dtype=np.uint8).astype(np.float64)
    if b.size == 0:
        b = np.zeros(1, dtype=np.float64)
    pos = np.linspace(0.0, b.size - 1.0, n * n)
    return np.interp(pos, np.arange(b.size, dtype=np.float64), b).reshape(n, n)


def _dct_matrix(n: int):
    """DCT-II basis matrix: D[k, i] = cos(pi * (2i + 1) * k / (2n)), so
    D @ x is the (unnormalized) 1-D DCT-II of x. Median thresholding makes
    the hash invariant to any positive per-row scaling, so orthonormal
    scaling factors are unnecessary."""
    import numpy as np

    i = np.arange(n, dtype=np.float64)
    return np.cos(np.pi * (2.0 * i[None, :] + 1.0) * i[:, None] / (2.0 * n))


def phash_real_batch(payloads) -> list[str]:
    """The classic 8x8-DCT median pHash over a whole Arrow batch at once.

    Per payload: bytes -> PHASH_RASTER^2 grayscale raster -- a REAL
    decode -> grayscale -> resize for the codec-free image formats
    (decode_image: BMP/PPM/PGM), the deterministic byte-sequence resample
    stand-in for everything else (_byte_raster; swap in PIL/ffmpeg there
    for codec formats, the DCT hashing below is unchanged)
    -> 2-D DCT-II (one batched matmul pair, D @ imgs @ D.T) -> top-left
    PHASH_DCT_LOW^2 low-frequency block -> threshold each coefficient at the
    MEDIAN of the block (DC excluded from the median so a uniform brightness
    shift cannot drag the threshold) -> 64 bits, MSB-first, as 16 hex chars.
    """
    import numpy as np

    n = PHASH_RASTER
    d = _dct_matrix(n)
    imgs = np.empty((len(payloads), n, n), dtype=np.float64)
    for r, p in enumerate(payloads):
        imgs[r] = _decoded_or_byte_raster(p, n)
    coeffs = d @ imgs @ d.T  # batched 2-D DCT-II ((n,n) broadcasts over the batch dim)
    low = coeffs[:, :PHASH_DCT_LOW, :PHASH_DCT_LOW].reshape(len(payloads), -1)
    med = np.median(low[:, 1:], axis=1, keepdims=True)
    bits = low > med
    out = []
    for row in bits:
        v = 0
        for bit in row:
            v = (v << 1) | int(bit)
        out.append(f"{v:016x}")
    return out


def perceptual_hash(frame: DataFrame, mode: str = "stub") -> DataFrame:
    """Arrow-batched 64-bit perceptual hash per payload (doc_id, phash as 16
    hex chars); the payload never leaves the executor.

    mode="real" runs the actual DCT pHash recipe (phash_real_batch: raster ->
    2-D DCT-II -> 8x8 low block -> median threshold) in vectorized numpy over
    each Arrow batch; only the bytes->raster step stands in for an image
    decoder (codec libs absent here -- swap np.frombuffer for
    decode+grayscale+resize in production, the hash math is unchanged).
    mode="stub" (default, oracle-expressible) hashes a NORMALIZED payload --
    lowercase, runs of non-alphanumerics collapsed -- so formatting/case
    variants collide exactly, giving the banding + Hamming machinery
    SQL-checkable semantics. Both modes feed the identical phash_pairs
    band-join; real-mode invariances are planted-tested in
    tests/test_corpus_ops.py."""

    def run(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:  # noqa: F821
        import re

        import pandas as pd

        def stub_one(payload: bytes) -> str:
            norm = re.sub(r"[^a-z0-9]+", " ", payload.decode("utf-8").lower()).strip()
            return hashlib.md5(norm.encode("utf-8")).hexdigest()[:16]

        for pdf in batches:
            if mode == "real":
                hashes = phash_real_batch(list(pdf["payload"]))
            else:
                hashes = [stub_one(p) for p in pdf["payload"]]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "phash": hashes})

    return spread(frame).mapInPandas(run, schema=PHASH_SCHEMA)


def phash_pairs(hashes: DataFrame) -> DataFrame:
    """Near-dup pairs from 64-bit perceptual hashes: 16-bit-band LSH
    blocking (a pair within Hamming distance d < 2*bands shares at least one
    of the 4 bands whenever its flipped bits cluster; equal-normalized
    payloads share all 4), then an exact Hamming verify via two 32-bit
    halves (BIGINT xor + bit_count -- no unsigned-64 overflow). The join is
    band-keyed -- bucket-sized work, never corpus^2."""
    from flink_cdc_fluss_quickstart_spark.functions.dedup import track_cache

    # band identity includes position k, not just the 4 hex chars.
    # PERSISTED (lazy, tracked): the band frame self-joins as a and b, and
    # Spark recomputes each alias's lineage independently -- when `hashes`
    # comes from the mapInPandas DCT extractor, that re-ran the whole Python
    # hashing pass once per join side
    bands = track_cache(
        hashes.select(
            "doc_id",
            F.conv(F.substring("phash", 1, 8), 16, 10).cast("long").alias("h1"),
            F.conv(F.substring("phash", 9, 8), 16, 10).cast("long").alias("h2"),
            F.explode(
                F.array(
                    *[
                        F.concat(F.lit(f"{k}:"), F.substring("phash", 4 * k + 1, 4))
                        for k in range(PHASH_BANDS)
                    ]
                )
            ).alias("band"),
        ).persist()
    )
    # both self-join sides are the corpus-sized band frame: sort-merge,
    # never a broadcast build (r14 x100 sweep; dedup._corpus_join_side)
    from flink_cdc_fluss_quickstart_spark.functions.dedup import _corpus_join_side

    a, b = bands.alias("a"), _corpus_join_side(bands).alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            (
                F.bit_count(F.expr("a.h1 ^ b.h1")) + F.bit_count(F.expr("a.h2 ^ b.h2"))
            ).cast("bigint").alias("hamming"),
        )
        .distinct()
    )
    return cand.filter(F.col("hamming") <= PHASH_HAMMING_MAX)
