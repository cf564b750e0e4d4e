"""BPE tokenizer training and application (Sennrich et al. 2016) —
distributed over Spark with every loop iteration VOCABULARY-bounded.

The reference pipeline embeds pre-tokenized text and never trains a
tokenizer (generate_coco_embeddings.py consumes captions whole); a
training-data engine needs one, and the classic algorithm maps onto
Spark cleanly if the corpus-sized work is paid exactly once:

- **one corpus pass** folds the text to a ``(word, freq)`` vocabulary
  (whitespace words, the same split as the ``bpe_pair_stats`` gate) —
  map-side-combinable word count, the only scan of the documents;
- **each merge iteration** runs over the distinct vocabulary with each
  word carrying its frequency: adjacent-pair counts are one
  vocab-sized explode + one aggregation, and the argmax pair merges
  via a pure Catalyst ``aggregate`` left-fold over the symbol arrays
  (greedy non-overlapping left-to-right, the textbook single-pass
  semantics) — no Python in the loop, no corpus re-scan, lineage
  truncated per iteration with ``localCheckpoint``;
- **apply** tokenizes the corpus by folding the merge list over the
  DISTINCT words (an Arrow-batched pandas_udf — chaining 100 merge
  folds as nested Catalyst lambdas would blow past codegen limits)
  and broadcast-joining the results back: tokenization cost is
  O(vocabulary), not O(corpus).

At 100 TB the vocabulary is millions of rows against a corpus of
trillions of tokens, so vocab-bounded iterations are the difference
between a tokenizer you can train and one you cannot.
"""

from __future__ import annotations

import time as _time

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bpe_train", "bpe_train_from_vocab", "bpe_apply", "word_vocab"]


def word_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over whitespace words — the single corpus pass
    shared by training and application. Same split as the
    ``bpe_pair_stats`` gate: split on ' ', empties dropped."""
    return (
        docs.select(
            F.explode(
                F.filter(F.split(F.col(text_col), " ", -1), lambda t: t != "")
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _merge_expr(a: str, b: str):
    """Greedy left-to-right single-pass merge of adjacent pair (a, b)
    inside the ``syms`` array, as one Catalyst ``aggregate`` fold.

    State is (acc, just): ``just`` marks that the PREVIOUS element was
    consumed by a merge, so overlapping chains don't cascade —
    'aaaa' under (a,a) becomes [aa, aa], never [aaa, a]. Comparison is
    against current symbols, so later iterations merge merged tokens
    naturally."""
    lit_a, lit_b = F.lit(a), F.lit(b)
    merged = F.lit(a + b)

    def step(s, x):
        # try_element_at: NULL (not an ANSI error) on the empty
        # accumulator; NULL == lit_a is NULL and when() treats it as
        # false, so the guard needs no size() conjunct
        hit = (
            ~s.getField("just")
            & (F.try_element_at(s.getField("acc"), F.lit(-1)) == lit_a)
            & (x == lit_b)
        )
        return F.when(
            hit,
            F.struct(
                F.concat(
                    F.slice(
                        s.getField("acc"), 1, F.size(s.getField("acc")) - 1
                    ),
                    F.array(merged),
                ).alias("acc"),
                F.lit(True).alias("just"),
            ),
        ).otherwise(
            F.struct(
                F.concat(s.getField("acc"), F.array(x)).alias("acc"),
                F.lit(False).alias("just"),
            )
        )

    zero = F.struct(
        F.array().cast("array<string>").alias("acc"), F.lit(False).alias("just")
    )
    return F.aggregate(F.col("syms"), zero, step, lambda s: s.getField("acc"))


def bpe_train(
    docs: DataFrame,
    n_merges: int = 50,
    text_col: str = "text",
    checkpoint_every: int = 2,
    incremental: bool | None = None,
    merge_batch: int = 64,
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges over a document corpus; returns
    [(a, b, pair_count)] in merge order. One corpus pass folds to the
    (word, freq) vocabulary, then :func:`bpe_train_from_vocab` runs the
    vocab-bounded merge loop."""
    return bpe_train_from_vocab(
        word_vocab(docs, text_col),
        n_merges,
        checkpoint_every=checkpoint_every,
        incremental=incremental,
        merge_batch=merge_batch,
    )


def _pair_counts(vdf: DataFrame, sign: int = 1) -> DataFrame:
    """(a, b, cnt) adjacent-pair counts over (syms, freq) rows — the
    overlapping zip(syms, syms[1:]) count, exactly the statistic the
    full-scan loop aggregates (Sennrich's get_stats). ``sign=-1``
    negates the counts, the retract side of an incremental delta.
    Callers guarantee size(syms) >= 2 (sequence(1, size-1) with
    size < 2 would run DOWNWARD into index 0 — an ANSI error)."""
    agg = (
        vdf.select(
            "freq",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("syms") - 1),
                    lambda i: F.struct(
                        F.element_at("syms", i).alias("a"),
                        F.element_at("syms", i + 1).alias("b"),
                    ),
                )
            ).alias("p"),
        )
        .groupBy("p.a", "p.b")
        .agg(F.sum("freq").alias("cnt"))
    )
    if sign < 0:
        agg = agg.select("a", "b", (-F.col("cnt")).alias("cnt"))
    return agg


def _has_pair_expr(a: str, b: str):
    """True where the ``syms`` array contains (a, b) adjacent — the
    words whose pair statistics a merge of (a, b) can change. A pure
    map-side predicate: selecting the affected subset never shuffles."""
    return F.exists(
        F.sequence(F.lit(1), F.size("syms") - 1),
        lambda i: (F.element_at("syms", i) == F.lit(a))
        & (F.element_at("syms", i + 1) == F.lit(b)),
    )


# Spark-iteration count of the most recent _train_incremental call
# (diagnostic for the batched loop — merges/iteration is the overhead
# amortization factor the r9 probe reports).
LAST_TRAIN_ITERATIONS = 0
# per-iteration telemetry of the last incremental train: (merges
# committed, wall seconds) per batch iteration — lets the vocab probe
# report s/merge VS MERGE INDEX in one run (does pair-stats growth
# bite at 2k+ merges?) instead of re-running prefixes (VERDICT r9 #4)
LAST_TRAIN_ITER_LOG: list[tuple[int, float]] = []


def _select_merge_batch(rows, max_batch: int, fetched_all: bool):
    """Greedy selection of a batch of merges that sequential BPE would
    perform in exactly this order (the classic batched-BPE trick, made
    EXACT):

    Scan candidate pairs in (cnt desc, a, b) order. A pair is selected
    while (a) its symbols are disjoint from every already-selected
    pair's symbols, (b) neither of its symbols equals an earlier
    selection's merged string and its own merged string equals no
    earlier selection's symbol (string collisions would let one batch
    member create or consume occurrences of another), and (c) no
    conflict has been seen yet. The FIRST conflicting pair stops the
    scan and caps the batch: every sharing pair has cnt <= that stop
    count (sort order), every pair a batch merge can CREATE is a
    sub-occurrence of some existing sharing pair (cnt(x, ab) <=
    cnt(x, a)), so after truncating the selection to counts STRICTLY
    above the stop count, no created pair can outrank — or tie and win
    the lexicographic tie-break against — any selected pair. Counts of
    symbol-disjoint pairs are invariant under each other's merges, so
    each batch member is precisely the argmax sequential BPE would see
    at its turn, with its recorded count unchanged. The head pair is
    always safe (it IS the current argmax), so progress is guaranteed.

    ``fetched_all=False`` means candidates below the fetched window
    exist; the window edge then acts as the stop count (an unseen
    sharing pair could tie it)."""
    sel: list[tuple[str, str, int]] = []
    used: set[str] = set()
    merged_strs: set[str] = set()
    stop_cnt = None
    for r in rows:
        a, b, cnt = r["a"], r["b"], int(r["cnt"])
        if cnt < 2:
            break
        if (
            a in used
            or b in used
            or (a + b) in used
            or a in merged_strs
            or b in merged_strs
        ):
            stop_cnt = cnt
            break
        if len(sel) >= int(max_batch):
            stop_cnt = cnt
            break
        sel.append((a, b, cnt))
        used.update((a, b))
        merged_strs.add(a + b)
    if stop_cnt is None and not fetched_all and sel:
        stop_cnt = sel[-1][2]
    if stop_cnt is not None:
        while len(sel) > 1 and sel[-1][2] <= stop_cnt:
            sel.pop()
    return sel


def _has_any_pair_expr(pairs):
    """True where ``syms`` contains any of the batch's adjacent pairs —
    one pass via a literal a→b map lookup (batch symbols are disjoint,
    so keys are unique). Map-side predicate, no shuffle."""
    m = F.create_map(
        *[x for a, b, _ in pairs for x in (F.lit(a), F.lit(b))]
    )
    return F.exists(
        F.sequence(F.lit(1), F.size("syms") - 1),
        # coalesce: a missing map key yields NULL (not false), and a
        # NULL leaking out of exists() makes filter(~has) DROP the
        # unaffected word instead of keeping it
        lambda i: F.coalesce(
            F.try_element_at(m, F.element_at("syms", i))
            == F.element_at("syms", i + 1),
            F.lit(False),
        ),
    )


def _merge_expr_batch(pairs):
    """One greedy left-to-right pass applying EVERY batch pair at once
    (valid because _select_merge_batch guarantees symbol-disjointness
    and no string collisions: an occurrence of one pair is untouched by
    another's merges, so the combined pass equals the sequential
    per-pair passes). Same (acc, just) fold as _merge_expr with the
    pair literal generalized to an a → (b, merged) map."""
    m = F.create_map(
        *[
            x
            for a, b, _ in pairs
            for x in (
                F.lit(a),
                F.struct(F.lit(b).alias("b"), F.lit(a + b).alias("ab")),
            )
        ]
    )

    def step(s, x):
        last = F.try_element_at(s.getField("acc"), F.lit(-1))
        ent = F.try_element_at(m, last)
        hit = (
            ~s.getField("just")
            & ent.isNotNull()
            & (x == ent.getField("b"))
        )
        return F.when(
            hit,
            F.struct(
                F.concat(
                    F.slice(
                        s.getField("acc"), 1, F.size(s.getField("acc")) - 1
                    ),
                    F.array(ent.getField("ab")),
                ).alias("acc"),
                F.lit(True).alias("just"),
            ),
        ).otherwise(
            F.struct(
                F.concat(s.getField("acc"), F.array(x)).alias("acc"),
                F.lit(False).alias("just"),
            )
        )

    zero = F.struct(
        F.array().cast("array<string>").alias("acc"), F.lit(False).alias("just")
    )
    return F.aggregate(
        F.col("syms"), zero, step, lambda s: s.getField("acc")
    )


def _persistent_rdd_ids(sc) -> set:
    """Ids of every RDD currently registered persistent on the context
    (localCheckpoint registers its materialized RDD here)."""
    jmap = sc._jsc.getPersistentRDDs()
    return {int(k) for k in jmap.keySet().toArray()}


def _unpersist_rdds(sc, ids) -> None:
    """Deterministically free the blocks of the given persistent RDD
    ids (non-blocking). Dropping the Python DataFrame reference alone
    frees a localCheckpoint only when the DRIVER JVM happens to GC — at
    32k merges that lag accumulates thousands of superseded checkpoint
    block sets in executor storage (ADVICE r8 #3)."""
    jmap = sc._jsc.getPersistentRDDs()
    for i in ids:
        jrdd = jmap.get(int(i))
        if jrdd is not None:
            jrdd.unpersist(False)


def _train_incremental(
    vocab: DataFrame, n_merges: int, merge_batch: int = 64
) -> list[tuple[str, str, int]]:
    """The incremental merge loop: maintain the global pair-count table
    across iterations instead of re-exploding the full vocabulary per
    merge.

    Applying merge (a, b) only changes the pair statistics of words
    CONTAINING adjacent (a, b) — typically a tiny fraction of the
    vocabulary once past the first merges — so each iteration:

    1. argmax straight off the maintained ``stats`` table (a top-1 scan,
       no recount);
    2. filters the affected words (map-side predicate), merges them, and
       aggregates a DELTA = new pair counts minus old pair counts over
       that subset only;
    3. folds the delta into ``stats`` with BROADCAST joins (delta is
       small): a map-side left join updates existing pairs, a map-side
       semi/anti pair discovers brand-new ones — the big table is never
       shuffled;
    4. rewrites the vocabulary as unchanged ∪ merged (map-side union,
       checkpointed so the next iteration's three passes read
       materialized arrays, not a growing fold chain).

    Counts are maintained EXACTLY (frequencies add), so the learned
    merges — argmax, lexicographic tie-break, the <2 stop — are
    identical to the full-scan loop (pinned in tests/test_bpe.py). Per-
    merge cost drops from O(vocab × word_len) explode + shuffle + agg to
    O(affected × word_len) + map passes: sub-linear in vocabulary for
    every merge past the first few (BASELINE.md r8 probe)."""
    global LAST_TRAIN_ITERATIONS
    LAST_TRAIN_ITERATIONS = 0
    LAST_TRAIN_ITER_LOG.clear()
    merges: list[tuple[str, str, int]] = []
    # partition budgets are pinned at entry: filter preserves the parent
    # partition count and union ADDS the two sides', so without the
    # coalesce below the vocab would double its (mostly empty) partition
    # count every iteration — 2^n_merges tasks per job by merge 20
    sc = vocab.sparkSession.sparkContext
    baseline = _persistent_rdd_ids(sc)  # caller-owned persists: never touched
    n_vocab_parts = max(vocab.rdd.getNumPartitions(), 1)
    stats = _pair_counts(vocab).localCheckpoint(eager=True)
    n_stats_parts = max(stats.rdd.getNumPartitions(), 1)
    # executor storage must stay FLAT in merge count: once an iteration's
    # checkpoints are materialized, every checkpoint created by an
    # earlier iteration is superseded and its blocks are freed
    # explicitly (see _unpersist_rdds)
    created: set = _persistent_rdd_ids(sc) - baseline
    # batched argmax (r9, VERDICT r8 #4): per-iteration cost is
    # dominated by FIXED job overhead (argmax collect + 3-4
    # localCheckpoints), not data — so each iteration commits a whole
    # batch of provably-independent merges (_select_merge_batch's
    # exactness rule), amortizing the overhead across up to
    # ``merge_batch`` merges. Learned merges stay IDENTICAL to the
    # one-at-a-time loop (pinned in tests/test_bpe.py).
    fetch = max(4 * int(merge_batch), 64)
    try:
        while len(merges) < int(n_merges):
            _iter_t0 = _time.perf_counter()
            top = stats.orderBy(F.col("cnt").desc(), "a", "b").limit(fetch).collect()
            if not top or int(top[0]["cnt"]) < 2:
                break
            batch = _select_merge_batch(
                top, min(int(merge_batch), int(n_merges) - len(merges)),
                fetched_all=len(top) < fetch,
            )
            if not batch:
                break
            merges.extend(batch)
            LAST_TRAIN_ITERATIONS += 1
            before = _persistent_rdd_ids(sc)
            has = _has_any_pair_expr(batch)
            affected = vocab.filter(has).coalesce(n_vocab_parts).localCheckpoint(
                eager=True
            )
            merged = (
                affected.select(_merge_expr_batch(batch).alias("syms"), "freq")
                .filter(F.size("syms") >= 2)
                .localCheckpoint(eager=True)
            )
            delta = (
                _pair_counts(affected, sign=-1)
                .unionByName(_pair_counts(merged))
                .groupBy("a", "b")
                .agg(F.sum("cnt").alias("d"))
                .filter(F.col("d") != 0)
                .localCheckpoint(eager=True)
            )
            updated = stats.join(F.broadcast(delta), ["a", "b"], "left").select(
                "a", "b", (F.col("cnt") + F.coalesce(F.col("d"), F.lit(0))).alias("cnt")
            )
            hit = stats.join(F.broadcast(delta), ["a", "b"], "left_semi")
            fresh = delta.join(
                F.broadcast(hit.select("a", "b")), ["a", "b"], "left_anti"
            ).select("a", "b", F.col("d").alias("cnt"))
            stats = (
                updated.unionByName(fresh)
                .filter(F.col("cnt") > 0)
                .coalesce(n_stats_parts)
                .localCheckpoint(eager=True)
            )
            vocab = (
                vocab.filter(~has)
                .unionByName(merged)
                .coalesce(n_vocab_parts)
                .localCheckpoint(eager=True)
            )
            after = _persistent_rdd_ids(sc)
            created |= after - before
            superseded = (before - baseline) & created
            _unpersist_rdds(sc, superseded)
            created -= superseded
            LAST_TRAIN_ITER_LOG.append(
                (len(batch), _time.perf_counter() - _iter_t0)
            )
    finally:
        # the learned merges are plain Python — nothing persisted escapes
        _unpersist_rdds(sc, created)
    return merges


def bpe_train_from_vocab(
    vocab_df: DataFrame,
    n_merges: int = 50,
    checkpoint_every: int = 2,
    word_col: str = "word",
    freq_col: str = "freq",
    incremental: bool | None = None,
    incremental_min_vocab: int = 20_000,
    merge_batch: int = 64,
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges from a (word, freq) vocabulary —
    the corpus' sufficient statistic for BPE, which is exactly what
    ``TokenizerStore`` persists (training never needs the corpus twice).
    Deterministic: argmax pair ties break on (a, b)
    lexicographically, so two engines (or two cluster sizes) learn the
    identical tokenizer. Stops early when no pair occurs twice.

    The driver holds only the merge list (n_merges rows) and a 1-row
    argmax per iteration; everything else stays distributed. Two loop
    bodies, identical learned merges (pinned in tests/test_bpe.py):

    - **full-scan** — re-explode the vocabulary to pair counts each
      iteration; fewest Spark jobs per merge, right for small
      vocabularies where per-job overhead dominates.
    - **incremental** (:func:`_train_incremental`) — maintain the pair-
      count table across iterations and recount only the words a merge
      actually changed; per-merge cost is O(affected), not O(vocab) —
      the production shape (a 32k-merge tokenizer over a web-scale
      vocabulary re-scans the vocabulary 32k times otherwise).

    ``incremental=None`` picks by vocabulary size (>=
    ``incremental_min_vocab`` post-filter rows → incremental).
    ``merge_batch`` (r9) caps how many provably-independent merges the
    incremental loop commits per Spark iteration (exactness preserved —
    see _select_merge_batch; 1 restores strict one-merge-per-iteration
    behavior)."""
    sc = vocab_df.sparkSession.sparkContext
    baseline = _persistent_rdd_ids(sc)  # caller-owned persists: never touched
    vocab = vocab_df.select(
        F.split(F.col(word_col), "").alias("syms"), F.col(freq_col).alias("freq")
    )
    # tokens of length 1 can never merge; keep them out of the loop
    vocab = vocab.filter(F.size("syms") >= 2).localCheckpoint(eager=True)
    created = _persistent_rdd_ids(sc) - baseline  # the entry checkpoint
    if incremental is None:
        incremental = vocab.count() >= int(incremental_min_vocab)
    if incremental:
        try:
            return _train_incremental(vocab, n_merges, merge_batch=merge_batch)
        finally:
            _unpersist_rdds(sc, created)

    merges: list[tuple[str, str, int]] = []
    try:
        for it in range(int(n_merges)):
            top = (
                _pair_counts(vocab)
                .orderBy(F.col("cnt").desc(), "a", "b")
                .limit(1)
                .collect()
            )
            if not top or top[0]["cnt"] < 2:
                break
            a, b, cnt = top[0]["a"], top[0]["b"], int(top[0]["cnt"])
            merges.append((a, b, cnt))
            vocab = vocab.select(_merge_expr(a, b).alias("syms"), "freq").filter(
                F.size("syms") >= 2
            )
            # checkpoint cadence default lowered 8 -> 2 (r12): each
            # iteration REPLACES syms with a large nested fold
            # expression, so the un-truncated chain's analysis cost
            # grows superlinearly and dominates small-vocab training
            # (measured 7.1 -> 3.3 s for 12 merges at sf0.001); a
            # localCheckpoint is ~35 ms. Learned merges are unaffected
            # (lineage-only change, pinned in tests/test_bpe.py).
            if (it + 1) % int(checkpoint_every) == 0:
                before = _persistent_rdd_ids(sc)
                vocab = vocab.localCheckpoint(eager=True)
                created |= _persistent_rdd_ids(sc) - before
                # the new checkpoint supersedes every earlier one
                superseded = (before - baseline) & created
                _unpersist_rdds(sc, superseded)
                created -= superseded
    finally:
        _unpersist_rdds(sc, created)
    return merges


def _apply_merges_py(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Reference application of a merge list to one word (greedy
    left-to-right per merge, merges in learned order) — the same
    semantics as _merge_expr, in plain Python for the Arrow UDF."""
    syms = list(word)
    for a, b in merges:
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_apply(
    docs: DataFrame,
    merges: list[tuple[str, str, int]] | list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "bpe_tokens",
    broadcast_vocab: bool | None = None,
    broadcast_max_vocab: int = 1_000_000,
) -> DataFrame:
    """(id_col, out_col) — each document's text as BPE tokens under the
    learned merge list, word boundaries respected (tokens never span
    words, the Sennrich formulation).

    Tokenization runs once per DISTINCT word (Arrow-batched pandas_udf
    folding the merge list; chaining the fold as nested Catalyst
    lambdas would exceed codegen method limits past a few dozen
    merges) and joins back to the exploded corpus by word — so the
    Python cost is O(vocabulary) however large the corpus.

    The joinback is size-aware: ``broadcast_vocab=None`` (default)
    materializes the tokenized vocabulary once (``localCheckpoint`` —
    also keeps the pandas_udf from re-running per join partition) and
    broadcasts it only while it fits ``broadcast_max_vocab`` rows; a
    realistic zipfian web vocabulary (millions of distinct words at
    100 TB) takes the shuffled hash join on ``word`` instead — corpus
    side shuffles once, hot words are probe-side duplicates so skew
    costs nothing. Both paths are row-identical (pinned in
    tests/test_bpe.py). Pass True/False to pin the strategy and skip
    the count."""
    pair_list = [(m[0], m[1]) for m in merges]

    @F.pandas_udf("array<string>")
    def tokenize(words: pd.Series) -> pd.Series:
        return words.map(lambda w: _apply_merges_py(w, pair_list))

    exploded = docs.select(
        id_col,
        F.posexplode(
            F.filter(F.split(F.col(text_col), " ", -1), lambda t: t != "")
        ).alias("pos", "word"),
    )
    vocab_tokens = (
        exploded.select("word").distinct().withColumn("toks", tokenize("word"))
    )
    if broadcast_vocab is None:
        vocab_tokens = vocab_tokens.localCheckpoint(eager=True)
        broadcast_vocab = vocab_tokens.count() <= int(broadcast_max_vocab)
    build_side = F.broadcast(vocab_tokens) if broadcast_vocab else vocab_tokens
    tokenized = (
        exploded.join(build_side, "word")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.array_sort(
                    F.collect_list(F.struct("pos", "toks"))
                ).getField("toks")
            ).alias(out_col)
        )
    )
    # empty / whitespace-only / NULL texts posexplode to zero rows and
    # would vanish from the output, breaking downstream inner joins on
    # the doc id — left-join back onto the full id set so every input
    # document yields a row, with an empty token array. distinct():
    # the groupBy collapses duplicate doc ids to one row, so the
    # re-attach side must too, or duplicated ids would fan out.
    return (
        docs.select(id_col).distinct()
        .join(tokenized, id_col, "left")
        .withColumn(
            out_col,
            F.coalesce(F.col(out_col), F.array().cast("array<string>")),
        )
    )
