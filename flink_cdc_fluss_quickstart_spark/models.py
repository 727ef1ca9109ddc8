"""Trained-model persistence through PKTable -- the fastText
``save_model`` / ``load_model`` analogue.

Reference parity: the lakehouse is the reference stack's only durable
store (reference `README.md:81-95` -- everything that must survive a
restart lives in Paimon/Iceberg tables). A trained curation model is no
different: until it is written to the warehouse, the fit -> serve
lifecycle ends at the session boundary. This module closes that loop for
the two trained classifier families:

- the hashed n-gram langid (``plans/text_queries.hashed_langid_fit``):
  model = a bucket-keyed weight frame + the df-capped hot-gram list --
  cluster-sized state that must stay distributed (fastText's 2M-bucket
  shape), so each part becomes a PKTable;
- the logistic-regression quality scorer (``plans/text_queries.logreg_fit``):
  model = 15 doubles + a count, driver-sized, stored as a tiny keyed table.

Why PKTable and not a bare parquet directory: PKTable gives the model
store the SAME durability semantics as every other warehouse table --
atomic snapshot swap (a reader never sees a half-written model), versioned
history (``snapshot(version=)`` time-travels to any previously published
model -- instant rollback of a bad fit), and writer-epoch fencing (a
zombie trainer from a dead session cannot clobber a newer model).

Determinism contract: every model number is an IEEE-754 double or an
integer; parquet stores both exactly, so a reloaded model serves
BIT-IDENTICAL scores to the session that fit it
(tests/test_model_store.py proves this across a session boundary).

Hash-compat guard: a hashed-gram model is only meaningful under the exact
featurization that trained it (bucket count, gram inventory, hash prefix,
quantization scale). ``meta.json`` records those constants at save time
and ``load_*`` refuses a mismatch -- serving a 1024-bucket model in a
2048-bucket engine would silently mis-route every gram.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from flink_cdc_fluss_quickstart_spark.streaming.pk_table import PKTable

_META = "meta.json"

# superseded model/index VERSIONS keep their data this long after the next
# publish (PKTable gc_grace): rollback is the registry's point, so the
# default is days, not the table default's minutes -- a bad fit discovered
# tomorrow must still be reversible. Storage cost is one model footprint
# per retained version, metadata-sized for every artifact here.
MODEL_GC_GRACE_SECS = 7 * 86400.0


def _table(spark: SparkSession, path: str, keys, order_by) -> PKTable:
    return PKTable(
        spark, path, keys=keys, order_by=order_by,
        gc_grace_secs=MODEL_GC_GRACE_SECS,
    )


def _write_meta(path: str, meta: dict) -> None:
    tmp = os.path.join(path, _META + ".tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(path, _META))  # atomic publish, manifest-style


def _read_meta(path: str) -> dict:
    with open(os.path.join(path, _META)) as f:
        return json.load(f)


def _check_compat(saved: dict, current: dict, path: str) -> None:
    bad = {k: (saved.get(k), v) for k, v in current.items() if saved.get(k) != v}
    if bad:
        raise ValueError(
            f"model at {path} was trained under a different featurization: "
            + ", ".join(f"{k}: saved={s!r} vs engine={c!r}" for k, (s, c) in bad.items())
        )


# -- hashed n-gram langid ---------------------------------------------------


def _hlr_meta() -> dict:
    from flink_cdc_fluss_quickstart_spark.plans import text_queries as tq

    return {
        "model_type": "hashed_ngram_langid",
        "buckets": tq.HLR_BUCKETS,
        "grams": "unigram+bigram",
        "hash": "md5_hex_prefix(hg|gram)",
        "scale": tq.LOGREG_SCALE,
        "df_cap_denom": tq.HLR_DF_CAP_DENOM,
        "target_lang": tq.HLR_TARGET_LANG,
    }


def save_langid_model(
    spark: SparkSession,
    path: str,
    weights: DataFrame,
    hot: DataFrame,
    classes: bool = False,
) -> None:
    """Publish a trained langid model: weights -> PKTable keyed by bucket
    (by (bucket, cls) for the multiclass one-vs-rest frame), hot grams ->
    PKTable keyed by gram, plus the featurization meta. ``overwrite`` makes
    each save an atomic new model VERSION; older versions stay readable
    via PKTable time travel until GC'd.

    100 TB posture: both writes are straight distributed parquet -- the
    weight frame never visits the driver (at fastText's 2M-bucket space it
    never could), and the hot list is the bounded df-capped Zipf head."""
    wkeys = ["b", "cls"] if classes else ["b"]
    wt = _table(spark, os.path.join(path, "weights"), wkeys, wkeys)
    wt.overwrite(weights.select(*wkeys, "w"))
    ht = _table(spark, os.path.join(path, "hot"), ["gram"], ["gram"])
    # a model may have an EMPTY hot list (tiny corpora); PKTable handles
    # empty overwrites, and load distinguishes "no hot grams" from "no model"
    ht.overwrite(hot.select("gram"))
    meta = _hlr_meta()
    meta["classes"] = bool(classes)
    _write_meta(path, meta)


def load_langid_model(
    spark: SparkSession, path: str, version: int | None = None
) -> tuple[DataFrame, DataFrame]:
    """Reload (weights, hot) from a freshly constructed engine/session.
    ``version`` time-travels the weight table to an older published model
    (the rollback path); the hot list rides the same version index because
    both tables version in lockstep (one save = one overwrite each)."""
    meta = _read_meta(path)
    cur = _hlr_meta()
    cur["classes"] = meta.get("classes", False)  # shape is the model's choice
    _check_compat(meta, cur, path)
    wkeys = ["b", "cls"] if meta.get("classes") else ["b"]
    wt = _table(spark, os.path.join(path, "weights"), wkeys, wkeys)
    ht = _table(spark, os.path.join(path, "hot"), ["gram"], ["gram"])
    weights = wt.snapshot(version=version)
    hot = ht.snapshot(version=version)
    if weights is None:
        raise ValueError(f"no published langid model at {path}")
    if hot is None:
        hot = spark.createDataFrame([], "gram string")
    return weights.select(*wkeys, "w"), hot.select("gram")


# -- logistic-regression quality scorer --------------------------------------


def _lr_meta() -> dict:
    from flink_cdc_fluss_quickstart_spark.plans import text_queries as tq

    return {
        "model_type": "logreg_quality",
        "n_feat": tq._LR_NFEAT,
        "scale": tq.LOGREG_SCALE,
        "stops": list(tq.LOGREG_STOPS),
        "long_len": tq.LOGREG_LONG_LEN,
        "mwl_cap": tq.LOGREG_MWL_CAP,
        "len_cap": tq.LOGREG_LEN_CAP,
    }


def save_logreg_model(spark: SparkSession, path: str, model) -> None:
    """Publish a trained LogregModel as a feature-indexed 5-row table
    (j, w, m, sd) plus a scalar row for n/train_bucket in the meta. The
    doubles pass through parquet exactly, so reload is bit-identical."""
    rows = [
        (j, float(model.w[j]), float(model.m[j]), float(model.sd[j]))
        for j in range(len(model.w))
    ]
    df = spark.createDataFrame(rows, "j int, w double, m double, sd double")
    t = _table(spark, os.path.join(path, "coef"), ["j"], ["j"])
    t.overwrite(df)
    meta = _lr_meta()
    meta["n"] = int(model.n)
    meta["train_bucket"] = model.train_bucket
    _write_meta(path, meta)


def load_logreg_model(spark: SparkSession, path: str, version: int | None = None):
    """Reload a LogregModel; ``version`` rolls back to an older publish."""
    from flink_cdc_fluss_quickstart_spark.plans.text_queries import LogregModel

    meta = _read_meta(path)
    cur = _lr_meta()
    _check_compat(meta, cur, path)
    t = _table(spark, os.path.join(path, "coef"), ["j"], ["j"])
    snap = t.snapshot(version=version)
    if snap is None:
        raise ValueError(f"no published logreg model at {path}")
    rows = {r["j"]: r for r in snap.collect()}  # n_feat rows -- driver-sized
    n_feat = meta["n_feat"]
    if sorted(rows) != list(range(n_feat)):
        raise ValueError(f"logreg model at {path} is missing coefficient rows")
    return LogregModel(
        w=tuple(rows[j]["w"] for j in range(n_feat)),
        m=tuple(rows[j]["m"] for j in range(n_feat)),
        sd=tuple(rows[j]["sd"] for j in range(n_feat)),
        n=meta["n"],
        train_bucket=meta.get("train_bucket"),
    )


# -- serving indexes (the dedup / ANN state, same lifecycle as models) -------


def _mh_meta() -> dict:
    from flink_cdc_fluss_quickstart_spark.functions import dedup

    return {
        "model_type": "minhash_band_index",
        "n_perms": dedup.N_PERMS,
        "n_bands": dedup.N_BANDS,
        "n_rows": dedup.N_ROWS,
        "shingle_len": dedup.WORD_SHINGLE_LEN,
    }


def save_minhash_index(spark: SparkSession, path: str, band_frame: DataFrame) -> None:
    """Publish a banded MinHash index -- the (id, band_idx, band_key) frame
    `dedup.minhash_band_keyed` emits -- as a PKTable keyed (id, band_idx).
    This is the daily-dedup serving state: tomorrow's batch computes ITS
    band keys and probes this table (cost |batch| x bucket), the corpus is
    never re-shingled. Same atomic-publish / versioned-rollback / compat
    guarantees as the trained models."""
    import pyspark.sql.functions as F

    t = _table(spark, os.path.join(path, "bands"), ["id", "band_idx"], ["seq"])
    # seq rides in the stored payload (PKTable contract: ordering columns
    # are part of the row) -- the seed publish is ingest sequence 0
    t.overwrite(
        band_frame.select("id", "band_idx", "band_key")
        .withColumn("seq", F.lit(0).cast("long"))
    )
    _write_meta(path, _mh_meta())


def upsert_minhash_index(
    spark: SparkSession, path: str, band_frame: DataFrame, batch_id: int
) -> None:
    """Ingest a NEW day's band rows into the published index (PKTable merge
    -- idempotent per batch_id, so a replayed ingest is a no-op). The index
    grows by |batch| rows; nothing existing is rewritten except the hash
    buckets the new ids land in."""
    import pyspark.sql.functions as F

    meta = _read_meta(path)
    _check_compat(meta, _mh_meta(), path)
    t = _table(spark, os.path.join(path, "bands"), ["id", "band_idx"], ["seq"])
    t.merge(
        band_frame.select(
            "id", "band_idx", "band_key",
            F.lit("I").alias("op"), F.lit(batch_id).cast("long").alias("seq"),
        ),
        batch_id=batch_id,
        writer_id="minhash-ingest",
    )


def load_minhash_index(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    meta = _read_meta(path)
    _check_compat(meta, _mh_meta(), path)
    t = _table(spark, os.path.join(path, "bands"), ["id", "band_idx"], ["seq"])
    snap = t.snapshot(version=version)
    if snap is None:
        raise ValueError(f"no published minhash index at {path}")
    return snap.select("id", "band_idx", "band_key")


def _pq_meta() -> dict:
    from flink_cdc_fluss_quickstart_spark.functions import similarity
    from flink_cdc_fluss_quickstart_spark.plans import similarity_queries as sq

    return {
        "model_type": "pq_index",
        "pq_m": sq.PQ_M,
        "pq_k": sq.PQ_K,
        "pq_subdim": sq.PQ_SUBDIM,
        "dim": sq.DIM,
        "scale": similarity.SCALE,
    }


def save_pq_index(
    spark: SparkSession, path: str, books: DataFrame, codes: DataFrame
) -> None:
    """Publish a trained PQ index: the codebooks (m, cluster, cv -- PQ_M x
    PQ_K rows, the trained artifact) and the encoded corpus (vec_id, m,
    code, d2 -- PQ_M bytes of payload per vector). ADC serving from the
    reloaded pair never touches the float corpus -- which is the point of
    persisting it: re-encoding 100 TB of embeddings because the session
    died is the failure mode this store removes."""
    bt = _table(spark, os.path.join(path, "books"), ["m", "cluster"], ["m", "cluster"])
    bt.overwrite(books.select("m", "cluster", "cv"))
    ct = _table(spark, os.path.join(path, "codes"), ["vec_id", "m"], ["vec_id", "m"])
    ct.overwrite(codes.select("vec_id", "m", "code", "d2"))
    _write_meta(path, _pq_meta())


def load_pq_index(
    spark: SparkSession, path: str, version: int | None = None
) -> tuple[DataFrame, DataFrame]:
    meta = _read_meta(path)
    _check_compat(meta, _pq_meta(), path)
    bt = _table(spark, os.path.join(path, "books"), ["m", "cluster"], ["m", "cluster"])
    ct = _table(spark, os.path.join(path, "codes"), ["vec_id", "m"], ["vec_id", "m"])
    books = bt.snapshot(version=version)
    codes = ct.snapshot(version=version)
    if books is None or codes is None:
        raise ValueError(f"no published PQ index at {path}")
    return (
        books.select("m", "cluster", "cv"),
        codes.select("vec_id", "m", "code", "d2"),
    )


def list_model_versions(spark: SparkSession, path: str) -> list[dict]:
    """Published model versions (newest last) from the weight/coef table's
    commit history -- the model registry view."""
    if not os.path.exists(os.path.join(path, _META)):
        raise FileNotFoundError(f"no published model at {path}")
    sub = "coef" if os.path.exists(os.path.join(path, "coef")) else "weights"
    t = _table(spark, os.path.join(path, sub), ["_"], ["_"])
    m = t._read_manifest()
    return list(m.get("history", []))


__all__ = [
    "save_langid_model",
    "load_langid_model",
    "save_logreg_model",
    "load_logreg_model",
    "list_model_versions",
]
