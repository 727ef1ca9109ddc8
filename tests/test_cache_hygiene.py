"""Cache lifecycle of the dedup family: the profile/band frames persisted to
feed both sides of a candidate self-join must be releasable, so a long-lived
session running near-dup queries repeatedly keeps a flat block manager
(round-3 regression class: the decontamination persist leak; round-4 advice:
the same pattern in the LSH/simhash profiles).

Assertions are DELTA-based on RDD ids, not global-zero: other queries'
localCheckpoint RDDs (dedup_components, streaming merges) legitimately sit in
sc.persistentRdds outside the SQL cache manager until the ContextCleaner
GC-collects them, so a global count is order-dependent across a shared
session."""

from __future__ import annotations

import pytest

from flink_cdc_fluss_quickstart_spark.functions import dedup
from flink_cdc_fluss_quickstart_spark.plans.registry import all_specs

DEDUP_QUERIES = (
    "minhash_lsh_pairs",
    "ngram_jaccard_neardup",
    "ngram_containment_pairs",
    "simhash_neardup_pairs",
    "winnow_fingerprints",
    "winnow_overlap_pairs",
    # corpus-statistics queries persist through the same tracker
    # (dedup.track_cache): the shared doc-term-frequency frame + its rollup
    "unigram_lm_surprisal",
    "bigram_lm_surprisal",
    "tfidf_top_terms",
)


def _persistent_ids(spark) -> set[int]:
    return {int(k) for k in spark.sparkContext._jsc.getPersistentRDDs().keySet()}


@pytest.mark.parametrize("name", DEDUP_QUERIES)
def test_release_caches_drops_all_persisted_frames(spark, sf_dir, name):
    dedup.release_caches()
    before = _persistent_ids(spark)
    all_specs()[name].builder(spark, sf_dir).count()
    created = _persistent_ids(spark) - before
    # the query persisted its profile/band frame(s)...
    assert created, f"{name} persisted nothing?"
    dedup.release_caches()
    # ...and release drops every one of them (pre-existing ids may vanish
    # concurrently via the ContextCleaner; they just must not be joined by
    # survivors of ours)
    leaked = _persistent_ids(spark) & created
    assert not leaked, f"{name} leaked persisted frames: rdd ids {leaked}"


def test_release_caches_is_idempotent_and_bounds_repeat_runs(spark, sf_dir):
    """Run the same query twice with release in between: each run's tracked
    persists are fully released (no accumulation), and double-release is a
    no-op."""
    spec = all_specs()["minhash_lsh_pairs"]
    dedup.release_caches()
    before = _persistent_ids(spark)
    spec.builder(spark, sf_dir).count()
    created1 = _persistent_ids(spark) - before
    dedup.release_caches()
    base2 = _persistent_ids(spark)
    spec.builder(spark, sf_dir).count()
    created2 = _persistent_ids(spark) - base2
    assert len(created2) == len(created1)
    dedup.release_caches()
    dedup.release_caches()
    assert not (_persistent_ids(spark) & (created1 | created2))
    assert not dedup._CACHED


def test_results_unchanged_after_release(spark, sf_dir):
    """Releasing between build and materialize only costs recompute, never
    correctness (the frames are inputs to lazy joins)."""
    spec = all_specs()["simhash_neardup_pairs"]
    expected = sorted(map(tuple, spec.builder(spark, sf_dir).collect()))
    df = spec.builder(spark, sf_dir)
    dedup.release_caches()  # released BEFORE the action
    got = sorted(map(tuple, df.collect()))
    assert got == expected
    dedup.release_caches()
