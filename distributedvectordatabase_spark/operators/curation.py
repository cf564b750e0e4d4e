"""End-to-end curation pipeline with the tokenize-ONCE discipline
(VERDICT r10 #4): tokenize → Gopher repetition filter → exact
repeated-substring trim → shingle-MinHash near-dup dedup → DSIR
selection → weighted source mixing → token-budget packing → sharded
export, composed so the corpus is tokenized exactly one time.

The 100 TB pattern this encodes: tokenization is a scan-rate cost you
pay ONCE by materializing the token column to storage (the staging
write below); every downstream stage consumes the stored column via its
``tokens_col=`` knob (gopher/substring_dedup/dedup/dsir/pack — r10/r11
plumbing), and the substring trim — the one stage that CHANGES the
token stream — emits the surviving token array itself
(``with_tokens=True``) so nothing ever re-tokenizes. The property is
asserted, not assumed: :func:`plan_tokenizes` inspects a stage's
physical plan for the tokenizer's ``split`` and tests pin that no
post-staging stage plan contains it.

Reference parity: none — the reference pipeline stops at embeddings
(scripts/generate_coco_embeddings.py); this is the training-data layer
the engine adds. Stage semantics match the individually-gated
operators (doc_gopher_repetition, doc_substring_dedup, dsir, minhash,
mix, pack, export gates/tests).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as T
from ..functions.text import SPARK


def plan_tokenizes(df: DataFrame) -> bool:
    """True if the physical plan re-tokenizes raw text (contains the
    whitespace tokenizer's ``split``). Downstream stages of a
    tokenize-once pipeline must be False."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "split(" in plan


@dataclass
class CurationResult:
    """Stage artifacts: every DataFrame is the stage's OUTPUT (lazy
    until acted on; export has already materialized the terminal
    path). ``stats`` is filled only when ``collect_stats=True``."""

    staged_path: str
    gophered: DataFrame
    trimmed: DataFrame
    deduped: DataFrame
    selected: DataFrame
    mixed: DataFrame
    packs: DataFrame
    export_path: str
    manifest: DataFrame | None
    stats: dict = field(default_factory=dict)


def curate_corpus(
    spark: SparkSession,
    docs: DataFrame,
    work_dir: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str | None = "source",
    target_ids: DataFrame | None = None,
    select_k: int | None = None,
    substring_k: int = 8,
    minhash_threshold: float = 0.9,
    minhash_bands: int = 2,
    minhash_rows: int = 6,
    shingle_n: int = 3,
    rates: dict[str, float] | None = None,
    pack_budget: int = 256,
    n_shards: int = 8,
    export_fmt: str = "parquet",
    collect_stats: bool = False,
) -> CurationResult:
    """Run the full chain; returns per-stage artifacts.

    Stage 0 materializes (id, source, text, toks) to
    ``work_dir/tokenized`` — the ONE tokenize pass — and re-reads it so
    every downstream plan scans a stored array column. Intermediate
    stage outputs that fan out into multiple consumers (trim feeds both
    dedup-pair generation and the surviving-side join; the deduped set
    feeds both DSIR counting and the selection join) are persisted so
    branch re-execution cannot silently re-pay a stage.
    """
    from .dedup import minhash_neardup_pairs
    from .components import connected_components
    from .chunking import pack_documents
    from .gopher import gopher_filter
    from .mixing import mix_corpus
    from .substring_dedup import substring_trim
    from ..sources.export import export_shards

    src = (
        F.col(source_col)
        if source_col is not None and source_col in docs.columns
        else F.lit("all")
    )

    # ---- stage 0: tokenize ONCE, persist the token column ------------
    staged_path = os.path.join(work_dir, "tokenized")
    (
        docs.select(
            F.col(id_col).alias("doc_id"),
            src.alias("source"),
            F.col(text_col).alias("text"),
        )
        .withColumn("toks", F.expr(T.tokens("text", SPARK)))
        .write.mode("overwrite")
        .parquet(staged_path)
    )
    staged = spark.read.parquet(staged_path)

    # ---- stage 1: Gopher repetition filter ---------------------------
    gophered = gopher_filter(staged, tokens_col="toks")

    # ---- stage 2: repeated-substring trim (emits trimmed tokens) -----
    tr = substring_trim(
        gophered, k=substring_k, tokens_col="toks", with_tokens=True
    )
    trimmed = (
        gophered.select("doc_id", "source")
        .join(tr, "doc_id")
        .select(
            "doc_id",
            "source",
            F.col("text_trimmed").alias("text"),
            F.col("toks_trimmed").alias("toks"),
        )
        .persist()
    )

    # ---- stage 3: shingle-MinHash near-dup dedup (keep min doc_id) ---
    pairs = minhash_neardup_pairs(
        trimmed,
        threshold=minhash_threshold,
        bands=minhash_bands,
        rows=minhash_rows,
        shingle_n=shingle_n,
        tokens_col="toks",
    )
    comps = connected_components(pairs, src="doc_a", dst="doc_b")
    losers = comps.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    deduped = trimmed.join(losers, "doc_id", "left_anti").persist()

    # ---- stage 4: DSIR importance selection --------------------------
    if target_ids is not None and select_k is not None:
        from .dsir import dsir_select, dsir_weights

        w = dsir_weights(deduped, target_ids, tokens_col="toks")
        picked = dsir_select(w, select_k).select("doc_id")
        selected = deduped.join(F.broadcast(picked), "doc_id")
    else:
        selected = deduped

    # ---- stage 5: weighted source mixing (epoch expansion) -----------
    if rates and max(rates.values()) >= 1024:
        # sample_id packs the epoch into 10 bits below doc_id; a rate
        # past 1024 epochs would silently collide ids across docs
        raise ValueError("mixture rates >= 1024 are not supported")
    mixed = mix_corpus(selected, rates or {}, source_col="source")
    # unique per-sample id for packing order + export placement
    mixed = mixed.withColumn(
        "sample_id",
        F.col("doc_id").cast("long") * F.lit(1024) + F.col("epoch"),
    )

    # ---- stage 6: token-budget packing --------------------------------
    packs = pack_documents(
        mixed,
        budget=pack_budget,
        id_col="sample_id",
        part_col="source",
        tokens_col="toks",
    )

    # ---- stage 7: sharded export --------------------------------------
    export_path = os.path.join(work_dir, "export")
    final = mixed.join(
        packs.select("sample_id", "pack_id", "n_tokens"), "sample_id"
    ).select("sample_id", "doc_id", "epoch", "source", "pack_id", "n_tokens", "text")
    manifest = export_shards(
        final, export_path, n_shards=n_shards, id_col="sample_id", fmt=export_fmt
    )

    stats: dict = {}
    if collect_stats:
        stats = {
            "n_input": docs.count(),
            "n_gopher_kept": gophered.count(),
            "n_after_dedup": deduped.count(),
            "n_selected": selected.count(),
            "n_mixed": mixed.count(),
            "n_exported": int(
                manifest.agg(F.sum("n_rows")).first()[0] or 0
            ),
        }

    return CurationResult(
        staged_path=staged_path,
        gophered=gophered,
        trimmed=trimmed,
        deduped=deduped,
        selected=selected,
        mixed=mixed,
        packs=packs,
        export_path=export_path,
        manifest=manifest,
        stats=stats,
    )
