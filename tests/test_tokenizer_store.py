"""TokenizerStore (r7, VERDICT r6 #2): the trained BPE tokenizer as a
reopen-authoritative persisted artifact. The pins that matter:

- apply-from-disk == apply-from-memory (the artifact changes WHERE the
  merges live, never WHAT tokenization computes);
- append == fresh train over the union, delete == fresh train over the
  survivors (BPE is a pure function of word frequencies — folding the
  persisted sufficient statistic is exact, not approximate);
- reopen with default constructor args adopts the persisted config
  (the shared sidecar-authoritative contract; the store also joins the
  matrix in tests/test_store_contracts.py).
"""

import os

from pyspark.sql import functions as F

from distributedvectordatabase_spark.operators.bpe import bpe_apply, bpe_train
from distributedvectordatabase_spark.sources.tables import load_table
from distributedvectordatabase_spark.sources.tokenizer_store import TokenizerStore
from tests.conftest import SF_SMALL


def _docs(spark):
    return load_table(spark, "documents", SF_SMALL)


def test_train_persists_and_apply_from_disk_equals_memory(spark, tmp_path):
    docs = _docs(spark).limit(120)
    store = TokenizerStore(str(tmp_path / "tok"), n_merges=12)
    trained = store.train(docs)

    assert trained == bpe_train(docs, n_merges=12)
    # reload from disk: identical list, learned order preserved
    reopened = TokenizerStore(str(tmp_path / "tok"))
    assert reopened.n_merges == 12  # config wins over the default 50
    assert reopened.merges(spark) == trained

    from_disk = {
        r.doc_id: list(r.bpe_tokens)
        for r in reopened.apply(docs).collect()
    }
    in_memory = {
        r.doc_id: list(r.bpe_tokens)
        for r in bpe_apply(docs, trained).collect()
    }
    assert from_disk == in_memory and len(from_disk) == 120


def test_append_equals_fresh_train_over_union(spark, tmp_path):
    docs = _docs(spark).limit(200)
    lo = docs.filter(F.col("doc_id") % 2 == 0)
    hi = docs.filter(F.col("doc_id") % 2 == 1)

    inc = TokenizerStore(str(tmp_path / "inc"), n_merges=10)
    inc.train(lo)
    appended = inc.append(hi)

    assert appended == bpe_train(docs, n_merges=10)
    assert inc.merges(spark) == appended
    assert inc.registered_docs(spark).count() == 200


def test_delete_equals_fresh_train_over_survivors(spark, tmp_path):
    docs = _docs(spark).limit(150)
    store = TokenizerStore(str(tmp_path / "tok"), n_merges=10)
    store.train(docs)

    victims = [int(r.doc_id) for r in docs.limit(30).collect()]
    after = store.delete(spark, victims)
    survivors = docs.filter(~F.col("doc_id").isin(victims))
    assert after == bpe_train(survivors, n_merges=10)
    reg = {int(r.doc_id) for r in store.registered_docs(spark).collect()}
    assert not (reg & set(victims))

    # compact folds the tombstones physically, merges unchanged
    store.compact(spark)
    assert not os.path.exists(str(tmp_path / "tok" / "_tombstones"))
    assert store.merges(spark) == after
    assert {
        int(r.doc_id) for r in store.registered_docs(spark).collect()
    } == reg


def test_apply_works_on_unregistered_docs_and_keeps_empty_docs(spark, tmp_path):
    docs = _docs(spark).limit(80)
    store = TokenizerStore(str(tmp_path / "tok"), n_merges=8)
    store.train(docs)

    other = spark.createDataFrame(
        [(9001, "the new document"), (9002, ""), (9003, "   ")],
        "doc_id long, text string",
    )
    got = {r.doc_id: list(r.bpe_tokens) for r in store.apply(other).collect()}
    assert set(got) == {9001, 9002, 9003}
    assert got[9002] == [] and got[9003] == []  # empty docs keep a row


def test_apply_shuffle_join_path_matches_broadcast(spark, tmp_path):
    docs = _docs(spark).limit(100)
    store = TokenizerStore(str(tmp_path / "tok"), n_merges=8)
    store.train(docs)
    bc = {
        r.doc_id: list(r.bpe_tokens)
        for r in store.apply(docs, broadcast_vocab=True).collect()
    }
    sh = {
        r.doc_id: list(r.bpe_tokens)
        for r in store.apply(docs, broadcast_vocab=False).collect()
    }
    assert bc == sh


def test_merge_versions_are_time_travelable(spark, tmp_path):
    """r7: each train/append/delete stamps a merge VERSION with its
    mutation gen — pin current_gen() when a run starts and
    merges/apply(as_of_gen=) reproduce exactly the tokenizer that run
    used, through later retrains (and through compact, which keeps the
    O(n_merges)-row version history)."""
    import pytest

    docs = _docs(spark).limit(200)
    lo = docs.filter(F.col("doc_id") % 2 == 0)
    hi = docs.filter(F.col("doc_id") % 2 == 1)

    store = TokenizerStore(str(tmp_path / "tok"), n_merges=10)
    v1 = store.train(lo)
    g1 = store.current_gen()
    v2 = store.append(hi)
    g2 = store.current_gen()
    assert v1 != v2  # the corpus changed, so the tokenizer did

    assert store.merge_versions(spark) == [g1, g2]
    assert store.merges(spark, as_of_gen=g1) == v1
    assert store.merges(spark, as_of_gen=g2) == v2
    assert store.merges(spark) == v2  # latest by default

    # apply at the pinned gen == apply of the pinned list
    got = {
        r.doc_id: list(r.bpe_tokens)
        for r in store.apply(lo, as_of_gen=g1).collect()
    }
    want = {
        r.doc_id: list(r.bpe_tokens)
        for r in bpe_apply(lo, v1).collect()
    }
    assert got == want

    # versions survive compaction
    store.compact(spark)
    assert store.merges(spark, as_of_gen=g1) == v1
    assert store.merges(spark) == v2

    with pytest.raises(ValueError, match="no merge version"):
        store.merges(spark, as_of_gen=0)


def test_retrain_on_used_path_resets_history(spark, tmp_path):
    """r8 (ADVICE r7 #2): train() on a previously-used store path is a
    REBUILD — stale higher-gen merge versions and old tombstones must
    not shadow or silently thin the fresh training."""
    docs = _docs(spark).limit(100)
    d1 = docs.filter(F.col("doc_id") % 2 == 0)
    path = str(tmp_path / "tok")

    store = TokenizerStore(path, n_merges=8)
    store.train(docs)
    victim = int(d1.first().doc_id)
    store.delete(spark, [victim])  # leaves tombstones + a gen-2 version
    store.append(docs.filter(F.col("doc_id") == victim))  # gen-3 version
    assert len(store.merge_versions(spark)) >= 3

    # fresh train over HALF the corpus, same path: history must reset
    fresh = TokenizerStore(path, n_merges=8)
    learned = fresh.train(d1)
    assert fresh.merge_versions(spark) == [1]  # no stale gen-2/3 shadow
    assert fresh.merges(spark) == learned == bpe_train(d1, n_merges=8)
    # the old tombstone must not drop the re-registered victim doc
    assert fresh.registered_docs(spark).count() == d1.count()
    assert not os.path.exists(os.path.join(path, "_tombstones"))


def test_merges_before_first_retrain_raises_clearly(spark, tmp_path):
    """r8 (ADVICE r7 #3): a store with registered counts but no trained
    version (the deferred-retrain streaming flow) must raise a clear
    ValueError from merges()/apply(), not an opaque path error."""
    import pytest

    docs = _docs(spark).limit(40)
    store = TokenizerStore(str(tmp_path / "tok"), n_merges=4)
    store._register_initial(docs, "doc_id", "text")  # counts, no loop
    assert store.merge_versions(spark) == []
    with pytest.raises(ValueError, match="retrain"):
        store.merges(spark)
    with pytest.raises(ValueError, match="retrain"):
        store.apply(docs).collect()
    store.retrain(spark)
    assert store.merges(spark) == bpe_train(docs, n_merges=4)


# ----------------------------------------------------------- unigram artifact


UNI_KW = dict(vocab_size=48, seed_size=200, em_iters=2, max_piece_len=6)


def test_unigram_persists_and_apply_from_disk_equals_memory(spark, tmp_path):
    from distributedvectordatabase_spark.operators.unigram import (
        unigram_apply,
        unigram_train,
    )

    docs = _docs(spark).limit(120)
    store = TokenizerStore(str(tmp_path / "uni"), n_merges=5)
    store.train(docs)  # registers counts + BPE artifact
    vocab = store.retrain_unigram(spark, **UNI_KW)

    fresh, _ = unigram_train(docs, **UNI_KW)
    assert vocab == fresh  # pure function of the word statistics

    reopened = TokenizerStore(str(tmp_path / "uni"))
    assert reopened.unigram_vocab(spark) == vocab  # float64 exact round-trip
    from_disk = {
        r.doc_id: list(r.uni_tokens)
        for r in reopened.apply_unigram(docs, max_piece_len=6).collect()
    }
    in_memory = {
        r.doc_id: list(r.uni_tokens)
        for r in unigram_apply(docs, vocab, max_piece_len=6).collect()
    }
    assert from_disk == in_memory and len(from_disk) == 120
    # both artifacts coexist on one registered corpus
    assert reopened.merges(spark) and reopened.unigram_versions(spark)


def test_unigram_append_equals_fresh_train_over_union(spark, tmp_path):
    from distributedvectordatabase_spark.operators.unigram import unigram_train

    docs = _docs(spark).limit(200)
    lo = docs.filter(F.col("doc_id") % 2 == 0)
    hi = docs.filter(F.col("doc_id") % 2 == 1)

    store = TokenizerStore(str(tmp_path / "uinc"), n_merges=5)
    store.train(lo)
    store.append(hi, retrain=False)
    got = store.retrain_unigram(spark, **UNI_KW)

    want, _ = unigram_train(docs, **UNI_KW)
    assert got == want


def test_unigram_versions_time_travelable_and_survive_compact(spark, tmp_path):
    docs = _docs(spark).limit(150)
    lo = docs.filter(F.col("doc_id") % 3 != 0)
    store = TokenizerStore(str(tmp_path / "uv"), n_merges=5)
    store.train(lo)
    v1 = store.retrain_unigram(spark, **UNI_KW)
    g1 = store.current_gen()

    store.append(docs.filter(F.col("doc_id") % 3 == 0), retrain=False)
    v2 = store.retrain_unigram(spark, **UNI_KW)
    assert v2 != v1
    assert store.unigram_vocab(spark) == v2
    assert store.unigram_vocab(spark, as_of_gen=g1) == v1

    store.compact(spark)
    assert store.unigram_vocab(spark, as_of_gen=g1) == v1  # history survives
    assert store.unigram_vocab(spark) == v2


def test_unigram_before_first_retrain_raises_clearly(spark, tmp_path):
    import pytest

    store = TokenizerStore(str(tmp_path / "unone"), n_merges=5)
    store.train(_docs(spark).limit(50))
    with pytest.raises(ValueError, match="no trained unigram version"):
        store.unigram_vocab(spark)
    with pytest.raises(ValueError, match="at or before generation"):
        store.retrain_unigram(spark, **UNI_KW)
        store.unigram_vocab(spark, as_of_gen=-1)
