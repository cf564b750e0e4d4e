"""BPE tokenizer training/application vs a pure-Python reference
implementation of Sennrich 2016 — identical merges on real testdata,
greedy non-overlap semantics, apply round-trip."""

import pytest
from pyspark.sql import functions as F

from distributedvectordatabase_spark.operators.bpe import (
    bpe_apply,
    bpe_train,
    word_vocab,
)
from distributedvectordatabase_spark.sources.tables import load_table
from tests.conftest import SF_SMALL


def _py_word_freqs(texts):
    freqs: dict = {}
    for t in texts:
        for w in t.split(" "):
            if w:
                freqs[w] = freqs.get(w, 0) + 1
    return freqs


def _py_merge_once(syms, a, b):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def _py_bpe_train(word_freqs, n_merges):
    vocab = [[tuple(w), f] for w, f in word_freqs.items() if len(w) >= 2]
    merges = []
    for _ in range(n_merges):
        counts: dict = {}
        for syms, f in vocab:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        (a, b), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < 2:
            break
        merges.append((a, b, cnt))
        vocab = [
            [s2, f]
            for syms, f in vocab
            if len(s2 := _py_merge_once(syms, a, b)) >= 2
        ]
    return merges


def test_bpe_train_matches_reference_on_testdata(spark):
    docs = load_table(spark, "documents", SF_SMALL)
    texts = [r.text for r in docs.select("text").collect()]
    want = _py_bpe_train(_py_word_freqs(texts), 12)
    got = bpe_train(docs, n_merges=12)
    assert got == want
    assert len(got) == 12  # real text has plenty of repeated pairs


def test_incremental_loop_learns_identical_merges(spark):
    """The incremental merge loop (maintained pair-stats table, delta
    updates over affected words only) must learn EXACTLY the merges of
    the full-scan loop and the pure-Python reference — argmax values,
    tie-breaks, and the <2 stop included. Duplicated docs make the
    counts non-trivial; 20 merges crosses several delta shapes (new
    pairs appearing, pairs draining to zero, merged tokens re-merging)."""
    docs = load_table(spark, "documents", SF_SMALL)
    docs = docs.unionByName(docs.limit(40))
    texts = [r.text for r in docs.select("text").collect()]
    want = _py_bpe_train(_py_word_freqs(texts), 20)
    full = bpe_train(docs, n_merges=20, incremental=False)
    inc = bpe_train(docs, n_merges=20, incremental=True)
    assert full == want
    assert inc == want


def test_incremental_early_stop_matches(spark):
    docs = spark.createDataFrame(
        [(0, "ab ab cd ef gh")], "doc_id long, text string"
    )
    # one repeated pair, then nothing occurs twice — both loops stop
    assert bpe_train(docs, n_merges=10, incremental=True) == bpe_train(
        docs, n_merges=10, incremental=False
    )


def test_bpe_apply_duplicate_doc_ids_collapse(spark):
    """Duplicate doc_id rows in the input collapse to ONE output row
    per id (the groupBy contract) — the empty-doc re-attach must not
    fan them back out."""
    docs = spark.createDataFrame(
        [(0, "aa bb"), (0, "aa bb"), (1, ""), (1, "")],
        "doc_id long, text string",
    )
    out = bpe_apply(docs, []).collect()
    assert sorted(r.doc_id for r in out) == [0, 1]
    by_id = {r.doc_id: r.bpe_tokens for r in out}
    assert by_id[1] == []


def test_word_vocab_matches_python_split(spark):
    docs = load_table(spark, "documents", SF_SMALL)
    got = {r.word: r.freq for r in word_vocab(docs).collect()}
    want = _py_word_freqs([r.text for r in docs.select("text").collect()])
    assert got == want


def test_merge_is_greedy_non_overlapping(spark):
    # 'aaaa' under merge (a,a) must become [aa, aa] — never [aaa, a] or
    # a cascaded [aaaa]; 'aaa' becomes [aa, a]
    docs = spark.createDataFrame(
        [(0, "aaaa aaaa aaaa aaa")], "doc_id long, text string"
    )
    merges = bpe_train(docs, n_merges=1)
    assert merges[0][:2] == ("a", "a")
    toks = {
        r.doc_id: r.bpe_tokens
        for r in bpe_apply(docs, merges).collect()
    }
    assert toks[0] == ["aa", "aa"] * 3 + ["aa", "a"]


def test_train_stops_when_no_pair_repeats(spark):
    docs = spark.createDataFrame([(0, "ab cd ef")], "doc_id long, text string")
    assert bpe_train(docs, n_merges=10) == []


def test_apply_roundtrip_and_merge_order(spark):
    docs = load_table(spark, "documents", SF_SMALL).limit(50)
    merges = bpe_train(docs, n_merges=8)
    out = bpe_apply(docs, merges)
    joined = {
        r.doc_id: "".join(r.bpe_tokens)
        for r in out.collect()
    }
    want = {
        r.doc_id: r.text.replace(" ", "")
        for r in docs.select("doc_id", "text").collect()
    }
    assert joined == want
    # empty merge list degenerates to character tokens
    chars = bpe_apply(docs.limit(2), [])
    for r in chars.join(docs.select("doc_id", "text"), "doc_id").collect():
        assert r.bpe_tokens == [c for c in r.text if c != " "]


def test_first_merge_agrees_with_pair_stats_gate(spark):
    """operators/bpe.bpe_train and the catalog's bpe_pair_stats gate
    claim the same pair-count semantics — the gate's rank-1 pair must
    BE the first learned merge (same corpus, same whitespace split,
    same (count desc, pair asc) order)."""
    from distributedvectordatabase_spark.catalog import build_catalog
    from tests.conftest import SF_DIR

    docs = load_table(spark, "documents", SF_DIR)
    merges = bpe_train(docs, n_merges=1)
    top = (
        build_catalog()["bpe_pair_stats"]
        .run(spark, SF_DIR)
        .filter("rnk = 1")
        .collect()[0]
    )
    assert (top.pair, int(top.cnt)) == (merges[0][0] + merges[0][1], merges[0][2])


def test_incremental_loop_frees_superseded_checkpoints(spark):
    """Executor storage must stay FLAT in merge count (ADVICE r8 #3):
    each iteration localCheckpoints ~5 DataFrames, and at 32k merges
    relying on driver-JVM GC to reap them accumulates unboundedly. The
    loop must explicitly unpersist superseded checkpoints — after
    training, no loop-created RDD may remain persistent."""
    from distributedvectordatabase_spark.operators.bpe import (
        _persistent_rdd_ids,
        bpe_train,
    )

    docs = load_table(spark, "documents", SF_SMALL).limit(80)
    sc = spark.sparkContext
    before = _persistent_rdd_ids(sc)
    merges = bpe_train(docs, n_merges=12, incremental=True)
    assert len(merges) > 0
    leaked = _persistent_rdd_ids(sc) - before
    assert leaked == set(), f"incremental loop leaked RDDs: {sorted(leaked)}"
    # the full-scan loop's periodic checkpoints obey the same contract
    before = _persistent_rdd_ids(sc)
    assert bpe_train(docs, n_merges=12, incremental=False) == merges
    leaked = _persistent_rdd_ids(sc) - before
    assert leaked == set(), f"full-scan loop leaked RDDs: {sorted(leaked)}"


def test_batched_merges_identical_across_batch_sizes(spark):
    """merge_batch amortizes per-iteration job overhead but must never
    change WHAT is learned: batch sizes 1 (strict sequential), 4, and
    64 all produce the reference merges."""
    docs = load_table(spark, "documents", SF_SMALL)
    texts = [r.text for r in docs.select("text").collect()]
    want = _py_bpe_train(_py_word_freqs(texts), 16)
    for mb in (1, 4, 64):
        got = bpe_train(docs, n_merges=16, incremental=True, merge_batch=mb)
        assert got == want, f"merge_batch={mb} diverged"


def test_select_merge_batch_rule():
    """The exactness rule driver-side: stop at the first
    symbol-sharing pair, truncate ties with the stop count, reject
    string collisions between a merged product and another selection's
    symbols, always keep the head pair."""
    from distributedvectordatabase_spark.operators.bpe import (
        _select_merge_batch,
    )

    rows = lambda *t: [{"a": a, "b": b, "cnt": c} for a, b, c in t]  # noqa: E731

    # disjoint pairs, no conflict, full fetch → all selected
    sel = _select_merge_batch(
        rows(("a", "b", 9), ("c", "d", 8), ("e", "f", 7)), 64, fetched_all=True
    )
    assert sel == [("a", "b", 9), ("c", "d", 8), ("e", "f", 7)]

    # conflict ('b','x' shares b) stops the scan; the tie at cnt=8
    # with the stop count is truncated (a created pair could tie and
    # win the lexicographic tie-break)
    sel = _select_merge_batch(
        rows(("a", "b", 9), ("c", "d", 8), ("b", "x", 8), ("e", "f", 7)),
        64, fetched_all=True,
    )
    assert sel == [("a", "b", 9)]

    # conflict strictly below the last selection keeps the selection
    sel = _select_merge_batch(
        rows(("a", "b", 9), ("c", "d", 8), ("b", "x", 5)), 64, fetched_all=True
    )
    assert sel == [("a", "b", 9), ("c", "d", 8)]

    # string collision: ("a","b") produces "ab", which is a symbol of
    # ("ab","z") — the second pair's count would change mid-batch
    sel = _select_merge_batch(
        rows(("a", "b", 9), ("ab", "z", 4)), 64, fetched_all=True
    )
    assert sel == [("a", "b", 9)]

    # reverse collision: earlier selection's symbol equals a later
    # pair's merge product ("x" + "y" -> "xy" colliding with "xy")
    sel = _select_merge_batch(
        rows(("xy", "q", 9), ("x", "y", 4)), 64, fetched_all=True
    )
    assert sel == [("xy", "q", 9)]

    # window edge without fetched_all acts as a stop count (ties drop)
    sel = _select_merge_batch(
        rows(("a", "b", 9), ("c", "d", 8), ("e", "f", 8)), 64, fetched_all=False
    )
    assert sel == [("a", "b", 9)]

    # head pair survives even when tied with the stop count
    sel = _select_merge_batch(
        rows(("a", "b", 9), ("b", "c", 9)), 64, fetched_all=True
    )
    assert sel == [("a", "b", 9)]

    # cnt<2 never merges
    assert _select_merge_batch(rows(("a", "b", 1)), 64, fetched_all=True) == []
