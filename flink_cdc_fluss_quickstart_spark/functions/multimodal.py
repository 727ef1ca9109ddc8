"""Multimodal column plumbing: opaque binary payloads + typed metadata, with
Arrow-batched (mapInPandas) decode / feature-extract operators.

Design for 100 TB: the payload column is opaque BINARY and never leaves the
executor -- all per-row work happens inside `mapInPandas` over Arrow batches
(controlled by spark.sql.execution.arrow.maxRecordsPerBatch), so the Python
boundary is vectorized, and the output drops the payload so downstream
shuffles move only metadata + features.

The real decoders (image/audio/video) need codec libraries that are not in
this container, so `decode_media` is a clearly-marked stub: mode="real"
raises NotImplementedError; mode="stub" derives a deterministic digest-based
fake so the full pipeline (schema, batching, partitioning, feature columns)
is exercised end-to-end and oracle-checkable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

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

    mode="real" is the integration point for actual codecs (PIL/ffmpeg/...):
    NOT implemented in this container. mode="stub" is a deterministic fake:
    feature k is the k-th 4-hex-digit group of md5(payload) scaled to [0, 1].
    """
    if mode == "real":
        raise NotImplementedError(
            "real media decoding requires codec libraries not present in this "
            "environment; wire PIL/torchaudio/ffmpeg here in production"
        )
    digest = hashlib.md5(payload).hexdigest()
    return [int(digest[4 * k : 4 * k + 4], 16) / 65535.0 for k in range(FEATURE_DIMS)]


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

    return frame.mapInPandas(run, schema=FEATURE_SCHEMA)


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
