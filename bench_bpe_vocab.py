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

    # r8 (VERDICT r7 #1): both loop bodies, same vocabulary — the
    # incremental loop (maintained pair-stats + affected-word deltas)
    # against the full-scan re-explode. Merges asserted identical.
    t0 = time.perf_counter()
    merges = bpe_train_from_vocab(vocab, n_merges, incremental=True)
    train = time.perf_counter() - t0
    out["train_sec"] = round(train, 3)
    out["per_merge_sec"] = round(train / max(len(merges), 1), 3)
    out["merges_learned"] = len(merges)

    t0 = time.perf_counter()
    merges_full = bpe_train_from_vocab(vocab, n_merges, incremental=False)
    train_full = time.perf_counter() - t0
    out["train_fullscan_sec"] = round(train_full, 3)
    out["per_merge_fullscan_sec"] = round(train_full / max(len(merges_full), 1), 3)
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
