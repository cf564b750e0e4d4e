"""MinHash banding per-band-key frequency cap (the saturated-vocab
worst-case bound).

On low-vocab corpora unigram token sets saturate: a couple of band
keys are shared by ~40% of all documents, and since one key with f
members emits f·(f-1)/2 candidate pairs, the pair OUTPUT — not the
shuffle — goes near-quadratic (sf0.1 measured: 2 keys of freq
1830/1786 carry 97% of the 827k verified pairs; capping them cuts the
banding stage ~4×, BASELINE.md). ``max_band_freq`` drops those keys
from candidate generation with an auditable hot-key listing; these
tests pin the semantics: capped output is an exact SUBSET of the
uncapped output, a cap above every key frequency changes nothing, the
audit agrees with what was dropped, and non-saturated (shingle) inputs
are untouched at working caps.
"""

from __future__ import annotations

import pytest

from distributedvectordatabase_spark.operators.dedup import (
    minhash_hot_band_keys,
    minhash_neardup_pairs,
    minhash_signatures,
    tokenized,
)
from distributedvectordatabase_spark.sources.tables import load_table
from tests.conftest import SF_SMALL

KW = dict(threshold=0.9, bands=2, rows=6)


@pytest.fixture(scope="module")
def docs(spark):
    # cache for the module, but UNPERSIST at teardown: Spark's
    # CacheManager substitutes InMemoryRelation for any later query
    # over the same plan fragment, which would silently break the
    # plan-shape (column-pruning) assertions in tests/test_plans.py
    # run in the same session
    df = load_table(spark, "documents", SF_SMALL).cache()
    yield df
    df.unpersist()


def _pairs(df):
    return set(map(tuple, df.select("doc_a", "doc_b").collect()))


def test_generous_cap_is_identity(spark, docs):
    """A cap above the largest band-key frequency must change nothing."""
    unc = _pairs(minhash_neardup_pairs(docs, **KW))
    capped = _pairs(minhash_neardup_pairs(docs, **KW, max_band_freq=10_000))
    assert capped == unc and len(unc) > 0


def test_capped_is_subset_and_audit_agrees(spark, docs):
    """Capping only ever REMOVES pairs, and the hot-key audit lists
    exactly the keys whose frequency exceeds the cap (the saturated
    unigram corpus has a couple of mass-collision keys)."""
    cap = 100
    unc = _pairs(minhash_neardup_pairs(docs, **KW))
    capped = _pairs(minhash_neardup_pairs(docs, **KW, max_band_freq=cap))
    assert capped <= unc
    assert len(capped) < len(unc)  # the saturated keys really dominate

    sigs = minhash_signatures(tokenized(docs, "text", "doc_id"), 12)
    hot = minhash_hot_band_keys(sigs, 2, 6, cap).collect()
    assert len(hot) > 0
    assert all(r.freq > cap for r in hot)
    # dropped mass is explained by the audited keys: every hot key's
    # members exceed the cap, and removing them leaves only pairs that
    # collide on some *other* (cool) band
    total_hot_members = sum(r.freq for r in hot)
    assert total_hot_members > cap * len(hot)


def test_capped_pairs_still_verified(spark, docs):
    """Capping changes candidate GENERATION only — surviving pairs
    still carry the exact verified jaccard ≥ threshold."""
    rows = minhash_neardup_pairs(docs, **KW, max_band_freq=100).collect()
    assert len(rows) > 0
    assert all(r.jaccard >= KW["threshold"] for r in rows)


def test_shingle_variant_untouched_by_working_cap(spark, docs):
    """Shingle sets don't saturate (bimodal similarity), so a moderate
    cap must leave the shingle results byte-identical — the registered
    scale path loses nothing."""
    kw = dict(threshold=0.7, bands=4, rows=3, shingle_n=3)
    unc = sorted(map(tuple, minhash_neardup_pairs(docs, **kw).collect()))
    capped = sorted(
        map(tuple, minhash_neardup_pairs(docs, **kw, max_band_freq=50).collect())
    )
    assert capped == unc and len(unc) > 0
