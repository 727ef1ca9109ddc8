"""Cache lifecycle of the dedup family: the profile/band frames persisted to
feed both sides of a candidate self-join must be releasable, so a long-lived
session running near-dup queries repeatedly keeps a flat block manager
(round-3 regression class: the decontamination persist leak; round-4 advice:
the same pattern in the LSH/simhash profiles)."""

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
)


def _n_persistent_rdds(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


@pytest.mark.parametrize("name", DEDUP_QUERIES)
def test_release_caches_drops_all_persisted_frames(spark, sf_dir, name):
    spark.catalog.clearCache()
    assert _n_persistent_rdds(spark) == 0
    all_specs()[name].builder(spark, sf_dir).count()
    # the query persisted its profile/band frame(s)...
    assert _n_persistent_rdds(spark) > 0
    dedup.release_caches()
    # ...and release drops every one of them
    assert _n_persistent_rdds(spark) == 0, f"{name} leaked persisted frames"


def test_release_caches_is_idempotent_and_bounds_repeat_runs(spark, sf_dir):
    """Run the same query twice with release in between: the persisted-frame
    count after run 2 equals run 1's (no accumulation), and double-release is
    a no-op."""
    spark.catalog.clearCache()
    spec = all_specs()["minhash_lsh_pairs"]
    spec.builder(spark, sf_dir).count()
    first = _n_persistent_rdds(spark)
    dedup.release_caches()
    spec.builder(spark, sf_dir).count()
    assert _n_persistent_rdds(spark) == first
    dedup.release_caches()
    dedup.release_caches()
    assert _n_persistent_rdds(spark) == 0


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
