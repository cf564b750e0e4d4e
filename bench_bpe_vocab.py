#!/usr/bin/env python
"""BPE realistic-vocabulary probe (r7, VERDICT r6 #3; opt-in, not part
of the driver BENCH contract).

The r6 1M-doc BPE probe ran over a 5k-word vocabulary — tiny enough
that "every merge iteration is vocabulary-bounded" was never tested
where it matters. A real web corpus's vocabulary is zipfian with a
long unique tail (typos, ids, urls): millions of distinct words,
most seen once. This probe builds that shape distributed (one
pandas_udf batch per partition; the driver never holds the corpus):

- each doc draws ~``words_per_doc`` words zipf(a=1.2)-distributed over
  a ``head_vocab``-word head, PLUS two per-doc unique tail words
  (``u<doc_id>a``/``u<doc_id>b``) — so distinct words ≥ 2·n_docs by
  construction, and the head/tail mix matches the zipf reality that
  most TYPES are rare while most TOKENS are common;
- measures: the one corpus pass to the (word, freq) vocabulary; the
  per-merge iteration cost of ``bpe_train_from_vocab`` (the claim
  under test: iteration cost tracks VOCABULARY, not corpus); and
  ``bpe_apply`` throughput under BOTH joinback strategies — the
  broadcast build side and the shuffled hash join the size-aware
  default picks above ``broadcast_max_vocab`` (their row-identity is
  pinned in tests/test_bpe.py + tests/test_tokenizer_store.py; this
  measures their cost).

Usage: python bench_bpe_vocab.py [N_DOCS] [N_MERGES]
(default 250_000 10 → ≥500k distinct words). Prints one JSON line.

r9 (VERDICT r8 #4): at N_MERGES > 30 the full-scan comparison is
skipped (it GROWS per merge — hours at 500) and exactness is instead
pinned against an independent pure-Python Sennrich reference (lazy
max-heap argmax + per-pair occurrence index — fast enough for 500+
merges driver-side), and the probe additionally reports the BATCHED
incremental loop (merge_batch=64, _select_merge_batch exactness rule)
against the strict one-merge-per-iteration loop.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from distributedvectordatabase_spark.operators.bpe import (
    bpe_apply,
    bpe_train_from_vocab,
    word_vocab,
)
from distributedvectordatabase_spark.session import get_spark


def synth_zipf_docs(spark, n_docs: int, partitions: int,
                    head_vocab: int = 50_000, words_per_doc: int = 100):
    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            texts = []
            for i in ids:
                rloc = np.random.RandomState(int(i) % (2**31))
                # zipf(1.2) head draw, clipped into the head vocab
                ws = rloc.zipf(1.2, size=words_per_doc) % head_vocab
                toks = [f"w{w}" for w in ws]
                # the unique tail: two words no other doc contains
                toks.append(f"u{int(i)}a")
                toks.append(f"u{int(i)}b")
                texts.append(" ".join(toks))
            yield pd.DataFrame({"doc_id": ids, "text": texts})

    return spark.range(n_docs, numPartitions=partitions).mapInPandas(
        gen, schema="doc_id long, text string"
    )


def py_bpe_reference(word_freqs: dict, n_merges: int):
    """Independent driver-side Sennrich trainer, fast enough for 500+
    merges over a ~1M-word vocabulary: exact pair counts maintained
    incrementally (only words containing the merged pair are
    re-counted, via a per-pair occurrence index) and the argmax served
    from a lazy max-heap keyed (-cnt, a, b) — entries are re-validated
    against the live count on pop, so stale pushes cost one pop each.
    Semantics identical to the textbook loop: greedy left-to-right
    non-overlapping merge, lexicographic tie-break, stop when no pair
    occurs twice."""
    import heapq

    words = {}   # idx -> [syms_list, freq]
    counts: dict = {}
    occ: dict = {}  # pair -> set of word idx
    for i, (w, f) in enumerate(word_freqs.items()):
        if len(w) < 2:
            continue
        syms = list(w)
        words[i] = [syms, f]
        for p in zip(syms, syms[1:]):
            counts[p] = counts.get(p, 0) + f
            occ.setdefault(p, set()).add(i)
    heap = [(-c, a, b) for (a, b), c in counts.items()]
    heapq.heapify(heap)
    merges = []

    def merge_word(syms, a, b):
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return out

    while len(merges) < n_merges:
        top = None
        while heap:
            c, a, b = heap[0]
            if counts.get((a, b), 0) == -c:
                top = (a, b, -c)
                break
            heapq.heappop(heap)  # stale entry
        if top is None or top[2] < 2:
            break
        a, b, cnt = top
        merges.append((a, b, cnt))
        touched: set = set()
        for i in list(occ.get((a, b), ())):
            syms, f = words[i]
            for p in zip(syms, syms[1:]):
                counts[p] -= f
                touched.add(p)
                if counts[p] == 0:
                    del counts[p]
                s = occ.get(p)
                if s is not None:
                    s.discard(i)
                    if not s:
                        del occ[p]
            new = merge_word(syms, a, b)
            if len(new) < 2:
                del words[i]
                continue
            words[i][0] = new
            for p in zip(new, new[1:]):
                counts[p] = counts.get(p, 0) + f
                touched.add(p)
                occ.setdefault(p, set()).add(i)
        for p in touched:
            if p in counts:
                heapq.heappush(heap, (-counts[p], p[0], p[1]))
    return merges


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 250_000
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="dvdb-bench-bpe-vocab", master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = synth_zipf_docs(spark, n_docs, partitions=int(cpus))
    # absorb Python-worker launch
    spark.range(int(cpus)).mapInPandas(lambda it: it, schema="id long").count()

    out: dict = {"n_docs": n_docs, "n_merges": n_merges}

    # one corpus pass -> (word, freq), materialized once (exactly what
    # TokenizerStore persists); everything after is vocab-bounded
    t0 = time.perf_counter()
    vocab = word_vocab(docs).localCheckpoint(eager=True)
    n_vocab = vocab.count()
    out["vocab_fold_sec"] = round(time.perf_counter() - t0, 3)
    out["distinct_words"] = int(n_vocab)
    n_tokens = int(vocab.agg(F.sum("freq")).first()[0])
    out["corpus_tokens"] = n_tokens

    # r8 (VERDICT r7 #1) / r9 (VERDICT r8 #4): the BATCHED incremental
    # loop (merge_batch=64 default) at the requested merge count, with
    # exactness pinned against the independent pure-Python Sennrich
    # reference on the SAME vocabulary.
    t0 = time.perf_counter()
    merges = bpe_train_from_vocab(vocab, n_merges, incremental=True)
    train = time.perf_counter() - t0
    out["train_sec"] = round(train, 3)
    out["per_merge_sec"] = round(train / max(len(merges), 1), 4)
    out["merges_learned"] = len(merges)
    from distributedvectordatabase_spark.operators import bpe as _bpe

    out["spark_iterations"] = int(_bpe.LAST_TRAIN_ITERATIONS)
    out["merges_per_iteration"] = round(
        len(merges) / max(_bpe.LAST_TRAIN_ITERATIONS, 1), 2
    )
    # s/merge vs merge index (r10, VERDICT r9 #4): quartile the
    # per-iteration telemetry so one long run shows whether the
    # pair-stats table's growth bites as the vocabulary coarsens
    log = list(_bpe.LAST_TRAIN_ITER_LOG)
    if log:
        qsplit = []
        idx, total = 0, len(merges)
        for quart in range(4):
            lo, hi = quart * total / 4, (quart + 1) * total / 4
            m_q = s_q = 0.0
            pos = 0.0
            for m, sec in log:
                mid = pos + m / 2
                if lo <= mid < hi:
                    m_q += m
                    s_q += sec
                pos += m
            if m_q:
                qsplit.append(round(s_q / m_q, 4))
        out["per_merge_sec_by_quartile"] = qsplit
        # r11 (VERDICT r10 #5): s/merge by 1k-merge bucket — finer
        # than quartiles, so table-growth vs load-weather separates
        # visually over a long idle run
        if total >= 2000:
            buckets = []
            for b in range((total + 999) // 1000):
                lo, hi = b * 1000, min((b + 1) * 1000, total)
                m_b = s_b = 0.0
                pos = 0.0
                for m, sec in log:
                    mid = pos + m / 2
                    if lo <= mid < hi:
                        m_b += m
                        s_b += sec
                    pos += m
                if m_b:
                    buckets.append(round(s_b / m_b, 4))
            out["per_merge_sec_by_1k_bucket"] = buckets

    t0 = time.perf_counter()
    wf = {r["word"]: int(r["freq"]) for r in vocab.collect()}
    ref = py_bpe_reference(wf, n_merges)
    out["py_reference_sec"] = round(time.perf_counter() - t0, 3)
    assert merges == ref, (
        f"batched incremental diverged from the Sennrich reference at "
        f"index {next(i for i, (x, y) in enumerate(zip(merges, ref)) if x != y) if merges != ref[:len(merges)] else len(merges)}"
    )

    # strict one-merge-per-iteration incremental: the r8 shape; at
    # large n_merges probe only a PREFIX (its cost is per-merge flat,
    # so the prefix rate extrapolates) to keep the probe bounded
    seq_n = min(n_merges, 30)
    t0 = time.perf_counter()
    merges_seq = bpe_train_from_vocab(
        vocab, seq_n, incremental=True, merge_batch=1
    )
    train_seq = time.perf_counter() - t0
    out["seq_merges_probed"] = seq_n
    out["per_merge_seq_sec"] = round(train_seq / max(len(merges_seq), 1), 4)
    out["batched_speedup_vs_seq"] = round(
        (train_seq / max(len(merges_seq), 1)) / (train / max(len(merges), 1)), 2
    )
    assert merges_seq == ref[:len(merges_seq)], "merge_batch=1 diverged"

    if n_merges <= 30:
        t0 = time.perf_counter()
        merges_full = bpe_train_from_vocab(vocab, n_merges, incremental=False)
        train_full = time.perf_counter() - t0
        out["train_fullscan_sec"] = round(train_full, 3)
        out["per_merge_fullscan_sec"] = round(
            train_full / max(len(merges_full), 1), 3
        )
        out["incremental_speedup"] = round(train_full / max(train, 1e-9), 2)
        assert merges == merges_full, "incremental and full-scan loops diverged"

    # apply throughput, both joinback strategies (row-identity pinned
    # in tests; this is the cost comparison at a real vocabulary)
    t0 = time.perf_counter()
    bc_rows = bpe_apply(docs, merges, broadcast_vocab=True).count()
    bc = time.perf_counter() - t0
    out["apply_broadcast_sec"] = round(bc, 3)
    out["apply_broadcast_tokens_per_s"] = round(n_tokens / bc)
    t0 = time.perf_counter()
    sh_rows = bpe_apply(docs, merges, broadcast_vocab=False).count()
    sh = time.perf_counter() - t0
    out["apply_shuffle_sec"] = round(sh, 3)
    out["apply_shuffle_tokens_per_s"] = round(n_tokens / sh)
    assert bc_rows == sh_rows == n_docs

    print(json.dumps({"metric": "bpe_vocab_probe", "unit": "sec", **out}))
    spark.stop()


if __name__ == "__main__":
    main()
