"""Near-duplicate detection operators (SURVEY §2.3 X2/X3 + north star).

The reference has no dedup at all; this is the training-data-pipeline
surface. Design for 100 TB:

- **MinHash + LSH banding**: tokenize → 12 salted-md5 min-hashes →
  4 bands × 3 rows → equi-join on (band, band_key). The only shuffle is
  the band-key join, which touches candidate pairs (near-linear for
  realistic corpora), never the O(n²) pair space. Signatures are
  computed ONCE and cached — the SQL-template form re-evaluates the
  tokenization per CTE reference because Catalyst inlines CTEs.
- **SimHash**: 16-bit frequency-weighted simhash; pairs within Hamming
  distance h found via the pigeonhole band trick — split the fingerprint
  into h+1 chunks, equi-join on chunk equality (any pair within h must
  agree on ≥1 chunk), then verify with bit_count. Same results as the
  O(n²) self-join, but shuffle-joinable at scale.

Semantics are byte-identical to the DuckDB oracle templates in
catalog.py (same salted-md5 min over distinct whitespace tokens, same
band keys), so results hash-match the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from distributedvectordatabase_spark.functions import text as T

# 1M × 64-D float64 ≈ 512 MB normalized matrix — the practical ceiling
# for shipping the corpus as one broadcast; beyond it the brute-force
# design (not the constant) is what must change.
MAX_BRUTE_CORPUS = 1_000_000


def tokenized(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int | None = None,
    tokens_col: str | None = None,
) -> DataFrame:
    """(id, distinct token set) — the MinHash input form.

    ``shingle_n`` switches the set elements from unigram tokens to
    n-word shingles: on low-vocab corpora unigram sets saturate (median
    pairwise Jaccard 0.63 on the driver testdata) and banding goes
    near-quadratic; shingles restore a bimodal similarity distribution,
    which is the recommended MinHash input on real corpora.

    ``tokens_col`` names an existing ``array<string>`` column to use
    instead of re-tokenizing ``text_col`` — the tokenize-once pattern
    shared with gopher/substring_dedup/dsir (r11)."""
    base = tokens_col if tokens_col is not None else T.tokens(text_col, T.SPARK)
    if shingle_n is not None:
        base = T.word_shingles(base, shingle_n, T.SPARK)
    toks = F.expr(f"array_distinct({base})")
    return docs.select(F.col(id_col).alias("doc_id"), toks.alias("toks"))


def minhash_signatures(tok_df: DataFrame, n_hashes: int) -> DataFrame:
    """Append h0..h{n-1}: min over tokens of md5('<salt>|' || token).

    Min over lowercase hex strings is byte-identical across engines,
    which is why the signature is a string min rather than an integer
    multiply-shift hash (engine-portable, oracle-checkable).
    """
    sigs = [
        F.expr(T.minhash_sig("toks", j, T.SPARK)).alias(f"h{j}") for j in range(n_hashes)
    ]
    return tok_df.select("doc_id", "toks", *sigs)


def _band_explode(sig_df: DataFrame, bands: int, rows: int) -> DataFrame:
    """(doc_id, band, band_key) — bands exploded from one array column
    (single scan of the cached signatures) rather than a bands-way
    UNION ALL."""
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat(*[F.col(f"h{b * rows + r}") for r in range(rows)]).alias("band_key"),
            )
            for b in range(bands)
        ]
    )
    return sig_df.select(
        "doc_id", F.explode(band_structs).alias("bk")
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key"))


def minhash_hot_band_keys(
    sig_df: DataFrame, bands: int, rows: int, max_band_freq: int
) -> DataFrame:
    """(band, band_key, freq) for band keys shared by MORE than
    ``max_band_freq`` documents — the audit surface for the banding
    cap below. On a healthy corpus this is empty or tiny (a band key
    is 3 chained min-hashes; mass collisions mean the key carries no
    discriminative signal, the saturated-unigram worst case)."""
    return (
        _band_explode(sig_df, bands, rows)
        .groupBy("band", "band_key")
        .agg(F.count("*").alias("freq"))
        .where(F.col("freq") > int(max_band_freq))
    )


def minhash_band_pairs(
    sig_df: DataFrame, bands: int, rows: int, max_band_freq: int | None = None
) -> DataFrame:
    """Candidate pairs (doc_a < doc_b) sharing ≥1 LSH band.

    The exploded bands are self-equi-joined on (band, band_key) —
    Catalyst plans a shuffle hash join on the band key, which is the
    scalable path: work is proportional to matching pairs per bucket,
    not to n².

    ``max_band_freq`` bounds the worst case: a band key shared by f
    documents emits f·(f-1)/2 candidate pairs, so ONE saturated key
    (low-vocab corpora: median pairwise Jaccard 0.63 on the driver
    testdata's unigram sets) sends the pair OUTPUT near-quadratic —
    AQE skew handling can rebalance the shuffle but not shrink the
    output. Keys above the cap are excluded from candidate generation
    (a mass-collision key carries no discriminative signal; a true
    near-dup pair is still found via any of its other bands — recall
    vs the uncapped form is measured and pinned in tests/test_lsh.py).
    The hot-key set is tiny by construction (≤ n·bands/cap keys), so
    it broadcasts as an anti-join and the exploded bands are never
    re-shuffled. Use :func:`minhash_hot_band_keys` to audit what a
    given cap drops.
    """
    exploded = _band_explode(sig_df, bands, rows)
    if max_band_freq is not None:
        hot = minhash_hot_band_keys(sig_df, bands, rows, max_band_freq).select(
            "band", "band_key"
        )
        exploded = exploded.join(F.broadcast(hot), ["band", "band_key"], "left_anti")
    a = exploded.alias("a")
    b = exploded.alias("b")
    return (
        a.join(
            b,
            on=[
                F.col("a.band") == F.col("b.band"),
                F.col("a.band_key") == F.col("b.band_key"),
                F.col("a.doc_id") < F.col("b.doc_id"),
            ],
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def minhash_neardup_pairs(
    docs: DataFrame,
    *,
    threshold: float,
    bands: int,
    rows: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int | None = None,
    max_band_freq: int | None = None,
    tokens_col: str | None = None,
) -> DataFrame:
    """MinHash-LSH near-dup pairs with exact-Jaccard verification.

    Columns: (doc_a, doc_b, jaccard) with jaccard rounded to 1e-6,
    filtered to >= threshold. Mirrors catalog._q_dedup_minhash exactly
    (catalog._q_dedup_minhash_shingle with ``shingle_n``).

    ``max_band_freq`` excludes mass-collision band keys from candidate
    generation (see :func:`minhash_band_pairs`) — the bound on the
    saturated-vocab worst case; leave ``None`` for the exact-LSH
    semantics the catalog oracle reproduces."""
    toks = tokenized(
        docs, text_col, id_col, shingle_n=shingle_n, tokens_col=tokens_col
    ).cache()
    sigs = minhash_signatures(toks, bands * rows).cache()
    cand = minhash_band_pairs(sigs, bands, rows, max_band_freq=max_band_freq)
    ta = toks.select(
        F.col("doc_id").alias("doc_a"), F.col("toks").alias("toks_a"),
        F.size("toks").alias("sz_a"),
    )
    tb = toks.select(
        F.col("doc_id").alias("doc_b"), F.col("toks").alias("toks_b"),
        F.size("toks").alias("sz_b"),
    )
    # Size prefilter (results-preserving): J(a,b) <= min(|a|,|b|)/max(|a|,|b|),
    # so any pair whose size ratio is under the threshold cannot pass it —
    # drop those before the expensive array_intersect verification.
    size_ok = F.least("sz_a", "sz_b") >= F.greatest("sz_a", "sz_b") * threshold
    # |a ∪ b| = |a| + |b| − |a ∩ b| exactly (both arrays are distinct),
    # so the union is integer arithmetic over sizes already at hand and
    # the verification runs ONE array op per pair instead of two (r12,
    # guide §1.2 step 2). The intersect is projected first so the
    # two references to it below stay one evaluation (CollapseProject's
    # multi-use-non-cheap guard keeps the Projects separate).
    jac = F.expr("cast(_inter as double) / nullif(sz_a + sz_b - _inter, 0)")
    return (
        cand.join(ta, "doc_a")
        .join(tb, "doc_b")
        .filter(size_ok)
        .select(
            "doc_a", "doc_b", "sz_a", "sz_b",
            F.expr("size(array_intersect(toks_a, toks_b))").alias("_inter"),
        )
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
        .withColumn("jaccard", F.round("jaccard", 6))
    )


def minhash_neardup_join(
    new_docs: DataFrame,
    corpus: DataFrame,
    *,
    threshold: float,
    bands: int,
    rows: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int | None = None,
) -> DataFrame:
    """Cross-corpus MinHash near-dup join: for each NEW document, the
    EXISTING corpus documents it near-duplicates — the incremental
    curation form ("is this batch already in the training set?"),
    asymmetric where :func:`minhash_neardup_pairs` is a self-join.

    Columns: (new_id, corpus_id, jaccard ≥ threshold, rounded 1e-6).

    Shape at scale: both sides compute signatures independently (one
    scan each); the equi-join on (band, band_key) shuffles band rows —
    O(new·bands + corpus·bands) keys, with matches proportional to
    colliding pairs, never new×corpus. When the new batch is small
    (the common ingest case) Catalyst/AQE broadcasts its banded side,
    so the corpus is scanned once and never shuffled; the corpus-side
    signatures can also be precomputed/persisted and reused across
    batches (they depend only on the corpus rows).
    """
    tn = tokenized(new_docs, text_col, id_col, shingle_n=shingle_n).cache()
    tc = tokenized(corpus, text_col, id_col, shingle_n=shingle_n).cache()
    bn = _band_explode(minhash_signatures(tn, bands * rows), bands, rows)
    bc = _band_explode(minhash_signatures(tc, bands * rows), bands, rows)
    cand = (
        bn.alias("n")
        .join(
            bc.alias("c"),
            on=[
                F.col("n.band") == F.col("c.band"),
                F.col("n.band_key") == F.col("c.band_key"),
            ],
        )
        .select(
            F.col("n.doc_id").alias("new_id"), F.col("c.doc_id").alias("corpus_id")
        )
        .distinct()
    )
    ta = tn.select(
        F.col("doc_id").alias("new_id"), F.col("toks").alias("toks_a"),
        F.size("toks").alias("sz_a"),
    )
    tb = tc.select(
        F.col("doc_id").alias("corpus_id"), F.col("toks").alias("toks_b"),
        F.size("toks").alias("sz_b"),
    )
    size_ok = F.least("sz_a", "sz_b") >= F.greatest("sz_a", "sz_b") * threshold
    # same union-as-size-arithmetic verification as minhash_neardup_pairs
    jac = F.expr("cast(_inter as double) / nullif(sz_a + sz_b - _inter, 0)")
    return (
        cand.join(ta, "new_id")
        .join(tb, "corpus_id")
        .filter(size_ok)
        .select(
            "new_id", "corpus_id", "sz_a", "sz_b",
            F.expr("size(array_intersect(toks_a, toks_b))").alias("_inter"),
        )
        .select("new_id", "corpus_id", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
        .withColumn("jaccard", F.round("jaccard", 6))
    )


def lsh_cosine_neardup_pairs(
    corpus: DataFrame,
    lsh,
    *,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    chunk: int = 1024,
) -> DataFrame:
    """Embedding near-dup pairs within the same sign-LSH bucket, scored
    by cosine similarity with one BLAS matrix product per bucket.

    Scale shape: bucketing is a projection (pandas_udf), the only
    shuffle groups rows by bucket, and the pairwise scoring runs inside
    ``applyInPandas`` as float64 BLAS over row chunks of ``chunk`` rows
    (memory per task is O(chunk × bucket), never O(bucket²) floats at
    once). Cross-bucket pairs are dropped by construction — that IS the
    LSH-near-dup semantics (same as catalog's oracle, which replicates
    the seeded buckets in SQL). For very large buckets, raise the LSH
    table count or pre-split buckets; the math is unchanged.
    """
    import numpy as np
    import pandas as pd

    bucketed = lsh.assign(corpus, vec_col=vec_col, out="_bucket")

    def per_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, ignore_index=True)
        ids = pdf[id_col].to_numpy(dtype=np.int64)
        X = np.array(list(pdf[vec_col]), dtype=np.float64)
        norms = np.sqrt(np.einsum("ij,ij->i", X, X))
        safe = np.where(norms == 0.0, 1.0, norms)
        Xn = X / safe[:, None]
        Xn[norms == 0.0] = 0.0  # zero-norm rows: cosine defined as 0
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        out_s: list[np.ndarray] = []
        n = len(ids)
        for lo in range(0, n, chunk):
            hi = min(lo + chunk, n)
            S = Xn[lo:hi] @ Xn.T  # (chunk, n)
            for i in range(lo, hi):
                row = S[i - lo, i + 1 :]  # only j > i (id-ascending pairs)
                hits = np.nonzero(row >= threshold)[0] + i + 1
                if len(hits):
                    out_a.append(np.full(len(hits), ids[i]))
                    out_b.append(ids[hits])
                    out_s.append(row[hits - i - 1])
        if not out_a:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine_sim": []}).astype(
                {"id_a": "int64", "id_b": "int64", "cosine_sim": "float64"}
            )
        return pd.DataFrame(
            {
                "id_a": np.concatenate(out_a),
                "id_b": np.concatenate(out_b),
                "cosine_sim": np.round(np.concatenate(out_s), 6),
            }
        )

    return bucketed.groupBy("_bucket").applyInPandas(
        per_bucket, schema="id_a long, id_b long, cosine_sim double"
    )


def simhash_neardup_pairs(
    docs: DataFrame,
    *,
    max_hamming: int,
    bits: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """SimHash pairs within ``max_hamming`` via pigeonhole banding.

    Split the fingerprint into (max_hamming + 1) bit-chunks; any pair
    within the bound agrees on at least one whole chunk, so an equi-join
    per chunk finds every candidate without the O(n²) cross join. The
    bit_count verification keeps results identical to a full self-join
    (catalog._q_dedup_simhash).
    """
    # md5 per token exactly once (token_hashes in its own projection —
    # the 32 per-bit filters then index into the materialized digests),
    # and cache the tiny (doc_id, sh) frame: the chunk self-join below
    # consumes it twice and would otherwise recompute every signature.
    hs = F.expr(T.token_hashes(T.tokens(text_col, T.SPARK), T.SPARK))
    s = (
        docs.select(F.col(id_col).alias("doc_id"), hs.alias("hs"))
        .select(
            "doc_id",
            F.expr(T.simhash_from_hashes("hs", T.SPARK, bits=bits)).alias("sh"),
        )
        .cache()
    )

    n_chunks = max_hamming + 1
    base = bits // n_chunks
    sizes = [base + (1 if i < bits % n_chunks else 0) for i in range(n_chunks)]
    offsets = [sum(sizes[:i]) for i in range(n_chunks)]
    chunks = F.array(
        *[
            F.struct(
                F.lit(i).alias("chunk"),
                F.expr(f"shiftright(sh, {offsets[i]}) & {(1 << sizes[i]) - 1}").alias("ck"),
            )
            for i in range(n_chunks)
        ]
    )
    e = s.select("doc_id", "sh", F.explode(chunks).alias("c")).select(
        "doc_id", "sh", F.col("c.chunk").alias("chunk"), F.col("c.ck").alias("ck")
    )
    a, b = e.alias("a"), e.alias("b")
    cand = (
        a.join(
            b,
            on=[
                F.col("a.chunk") == F.col("b.chunk"),
                F.col("a.ck") == F.col("b.ck"),
                F.col("a.doc_id") < F.col("b.doc_id"),
            ],
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sh").alias("sh_a"),
            F.col("b.sh").alias("sh_b"),
        )
        .distinct()
    )
    ham = F.expr("bit_count(sh_a ^ sh_b)")
    return (
        cand.select("doc_a", "doc_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


def brute_cosine_neardup_pairs(
    corpus: DataFrame,
    *,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All-pairs cosine near-dup, the brute-force baseline form.

    The O(n^2) pair space is sharded across tasks: each partition
    scores its rows against the L2-normalized full corpus (shipped as
    one SparkContext broadcast) with a single BLAS product, keeping
    only (id_a < id_b, sim >= threshold). ~80x faster than the
    interpreted expression self-join at 2k x 64-D. Valid only while
    the corpus fits in a broadcast — by construction: brute force at
    any larger scale is the wrong tool, and lsh_cosine_neardup_pairs
    is the scale path. Semantics identical to catalog's SQL template
    (zero-norm rows score 0; round-to-1e-6 after thresholding).
    """
    import numpy as np
    import pandas as pd

    # same driver-OOM guard rationale as knn.MAX_QUERY_BATCH: past this,
    # the broadcast-corpus design itself is the bug — use the LSH path.
    rows = corpus.select(id_col, vec_col).limit(MAX_BRUTE_CORPUS + 1).collect()
    if len(rows) > MAX_BRUTE_CORPUS:
        raise ValueError(
            f"corpus exceeds MAX_BRUTE_CORPUS={MAX_BRUTE_CORPUS}; "
            "brute-force all-pairs is the small-scale baseline — use "
            "lsh_cosine_neardup_pairs for corpora past broadcast size"
        )
    ids_all = np.array([r[id_col] for r in rows], dtype=np.int64)
    X = np.array([list(r[vec_col]) for r in rows], dtype=np.float64)
    norms = np.sqrt(np.einsum("ij,ij->i", X, X))
    safe = np.where(norms == 0.0, 1.0, norms)
    Xn = X / safe[:, None]
    Xn[norms == 0.0] = 0.0
    bc = corpus.sparkSession.sparkContext.broadcast((ids_all, Xn))

    def scan(batches):
        ids_all, Xn = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].values.astype(np.int64)
            Xp = np.array(list(pdf[vec_col].values), dtype=np.float64)
            pn = np.sqrt(np.einsum("ij,ij->i", Xp, Xp))
            psafe = np.where(pn == 0.0, 1.0, pn)
            Xpn = Xp / psafe[:, None]
            Xpn[pn == 0.0] = 0.0
            S = Xpn @ Xn.T
            keep = (S >= threshold) & (ids_all[None, :] > ids[:, None])
            ai, bj = np.nonzero(keep)
            yield pd.DataFrame(
                {
                    "id_a": ids[ai],
                    "id_b": ids_all[bj],
                    "cosine_sim": np.round(S[ai, bj], 6),
                }
            )

    return corpus.select(id_col, vec_col).mapInPandas(
        scan, schema="id_a long, id_b long, cosine_sim double"
    )
