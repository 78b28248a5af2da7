"""Benchmark decontamination: drop training documents that overlap an
evaluation set at n-gram granularity.

The standard recipe (GPT-3 appendix C / PaLM §7) flags a training
document when it shares any exact N-token n-gram with any eval document
(N = 13 here).  At 100 TB the eval side is tiny (benchmarks are a few
MB), so the whole eval n-gram set is built once, distinct-ed, and
BROADCAST to the scan of the training corpus — the training side streams
through one explode + broadcast-hash-join + partial-agg with no shuffle
of the corpus itself.  No reference counterpart (training-data layer).

N-grams reuse the shingle unit from textops.shingle_expr (md5-hashed
16-hex token windows) so the DuckDB oracle stays exact.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from readability_ex_spark.operators.textops import shingle_expr
from readability_ex_spark.operators.tokenize import ws_tokens

N_DECONTAM = 13  # tokens per overlap gram (GPT-3/PaLM convention)


def eval_ngram_set(
    eval_df: DataFrame, text_col: str = "text", n: int = N_DECONTAM
) -> DataFrame:
    """Distinct hashed n-grams of the eval corpus — one `gram` column.

    Small by construction; callers broadcast it.
    """
    return (
        eval_df.select(
            F.explode(shingle_expr(text_col, w=n)).alias("gram")
        ).distinct()
    )


def decontaminate(
    docs: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = N_DECONTAM,
) -> DataFrame:
    """Per-document contamination verdict vs an eval set.

    Returns ``(id_col, n_hit_grams, contaminated)`` for every input doc.
    ``n_hit_grams`` counts DISTINCT shared grams (a doc repeating one
    leaked sentence 50x is one leak, not 50).

    Plan shape: corpus-side explode -> broadcast semi-ish join against
    the eval gram set -> partial-agg count by doc.  The corpus is
    scanned once and never shuffled on gram (the join is broadcast);
    the only exchange is the final count-by-doc, keyed on the id the
    corpus is typically already partitioned by.
    """
    grams = docs.select(
        F.col(id_col), F.explode(shingle_expr(text_col, w=n)).alias("gram")
    )
    hits = (
        grams.join(F.broadcast(eval_ngram_set(eval_df, text_col, n)), "gram")
        .groupBy(id_col)
        .agg(F.count_distinct("gram").alias("n_hit_grams"))
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_hit_grams", F.lit(0)).alias("n_hit_grams"),
            (F.coalesce("n_hit_grams", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def contamination_report(
    docs: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    eval_id_col: str = "doc_id",
    text_col: str = "text",
    n: int = N_DECONTAM,
) -> DataFrame:
    """Per-EVAL-ITEM leak audit — the flip side of
    :func:`decontaminate`'s corpus verdict: for every eval document,
    how many of its ``n``-grams leak into the corpus and how many
    corpus documents carry at least one of them.  This is the table a
    benchmark owner reads to decide which ITEMS are compromised (and
    how broadly), where decontamination decides which CORPUS DOCS to
    drop.

    Returns ``(eval_id_col, n_grams, n_leaked_grams, n_corpus_docs,
    leaked)`` for every eval doc (zeros when clean).

    Plan shape: identical budget to :func:`decontaminate` — corpus-side
    explode, BROADCAST join against the (eval_id, gram) set (still
    small: eval items x grams-per-item), one partial-agg keyed on the
    eval id.  The corpus is scanned once, never shuffled on gram.
    """
    eval_grams = (
        eval_df.select(
            F.col(eval_id_col),
            F.explode(shingle_expr(text_col, w=n)).alias("gram"),
        )
        .distinct()
        .localCheckpoint(eager=False)  # feeds the join AND the totals
    )
    corpus_grams = docs.select(
        F.col(id_col).alias("_cdoc"),
        F.explode(shingle_expr(text_col, w=n)).alias("gram"),
    )
    hits = (
        corpus_grams.join(F.broadcast(eval_grams), "gram")
        .groupBy(eval_id_col)
        .agg(
            F.count_distinct("gram").alias("n_leaked_grams"),
            F.count_distinct("_cdoc").alias("n_corpus_docs"),
        )
    )
    totals = eval_grams.groupBy(eval_id_col).agg(
        F.count("*").alias("n_grams")
    )
    return (
        eval_df.select(eval_id_col)
        .join(totals, eval_id_col, "left")
        .join(hits, eval_id_col, "left")
        .select(
            eval_id_col,
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("n_leaked_grams", F.lit(0)).alias("n_leaked_grams"),
            F.coalesce("n_corpus_docs", F.lit(0)).alias("n_corpus_docs"),
            (F.coalesce("n_leaked_grams", F.lit(0)) > 0).alias("leaked"),
        )
    )


def q_contamination_report(spark, sf_dir: str) -> DataFrame:
    """Leak audit of the deterministic eval split vs the train split."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    eval_df = _eval_split(docs)
    train = docs.join(eval_df.select("doc_id"), "doc_id", "left_anti")
    return contamination_report(train, eval_df).orderBy("doc_id")


def decontaminate_spans(
    docs: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = N_DECONTAM,
) -> DataFrame:
    """Surgical decontamination: CUT every eval-overlapping ``n``-token
    span (overlaps merged to maximal runs) instead of dropping whole
    documents — the variant pipelines use when a page is fine except
    for one quoted benchmark item.  Returns ``(id_col, n_tokens,
    n_dup_tokens, text_clean)``.

    Same plan family as :func:`decontaminate`: the corpus side is one
    positional window pass (stride-1 hashes, the shingle unit) joined
    BROADCAST against the distinct eval gram set — the corpus is never
    shuffled on gram — then the shared span-cut tail
    (:func:`~readability_ex_spark.operators.substrdedup.cut_spans`:
    doc-cardinality fold + one Arrow map).
    """
    from readability_ex_spark.operators.substrdedup import (
        cut_spans,
        window_hash_expr,
    )

    occ = docs.select(
        F.col(id_col),
        F.posexplode(window_hash_expr(text_col, n)).alias("pos", "gram"),
    )
    hits = occ.join(
        F.broadcast(eval_ngram_set(eval_df, text_col, n)), "gram"
    ).select(id_col, "pos")
    return cut_spans(docs, hits, id_col, text_col, n)


# Deterministic synthetic eval set for the checked query: documents whose
# md5(doc_id) starts with this prefix (1/16 of the corpus) stand in for
# a benchmark. Their dup-family members contaminate against them.
EVAL_HEX_PREFIX = "0"
EVAL_HEX_BITS = 1  # hex chars of the prefix


def _eval_split(docs: DataFrame) -> DataFrame:
    return docs.filter(
        F.md5(F.col("doc_id").cast("string")).startswith(EVAL_HEX_PREFIX)
    )


# -- cross-document boilerplate (line/chunk) removal ------------------------
# C4 removes any LINE occurring >= 3 times in the corpus (Raffel et al.
# 2020 §2.2); CCNet dedups paragraphs by hash across shards. Web text has
# newlines; the synthetic corpus doesn't, so the unit here is a fixed
# non-overlapping token window ("chunk") — the same operator shape at a
# deterministic granularity both engines can recompute.

LINE_CHUNK_TOKENS = 30
# C4 removes lines occurring >= 3 times in the corpus, i.e. a chunk may
# appear in at most 2 distinct documents
LINE_MAX_DF = 2


def _chunk_structs(text_col: str, chunk_tokens: int):
    toks = ws_tokens(text_col)
    n_chunks_expr = F.ceil(F.size(toks) / F.lit(chunk_tokens)).cast("int")
    # sequence(0, -1) counts DOWN in Spark — empty docs must short-circuit
    return F.when(
        n_chunks_expr > 0,
        F.transform(
            F.sequence(F.lit(0), n_chunks_expr - 1),
            lambda i: F.struct(
                i.alias("pos"),
                F.concat_ws(
                    " ", F.slice(toks, i * chunk_tokens + 1, chunk_tokens)
                ).alias("chunk"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<pos:int,chunk:string>>"))


def chunk_document_frequency(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = LINE_CHUNK_TOKENS,
) -> DataFrame:
    """``(chunk_h, df)``: per 16-hex-md5 chunk hash, the number of
    DISTINCT docs containing it.  This is :func:`line_dedup`'s
    frequency table exposed as a persistable sidecar (~24 bytes per
    distinct chunk, text-size-independent): a pipeline stores it next
    to its corpus and feeds it back as ``extra_chunk_df`` so
    incremental batches count boilerplate against PRIOR batches too.
    Counts are additive across disjoint doc sets — append each batch's
    table and SUM per hash at read time.
    """
    exploded = docs.select(
        F.col(id_col),
        F.explode(_chunk_structs(text_col, chunk_tokens)).alias("c"),
    ).select(
        id_col, F.substring(F.md5(F.col("c.chunk")), 1, 16).alias("chunk_h")
    )
    return (
        exploded.distinct()
        .groupBy("chunk_h")
        .agg(F.count("*").alias("df"))
    )


def line_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = LINE_CHUNK_TOKENS,
    max_df: int = LINE_MAX_DF,
    broadcast_verdict: bool = True,
    extra_chunk_df: DataFrame | None = None,
    precomputed_dfreq: DataFrame | None = None,
) -> DataFrame:
    """Remove cross-document boilerplate chunks and reassemble the text.

    Chunks = consecutive ``chunk_tokens``-token windows of the
    whitespace tokenization (last one may be shorter).  A chunk whose
    document frequency (DISTINCT docs containing it) exceeds ``max_df``
    is dropped from every document; survivors are rejoined in original
    order.  Returns ``(id_col, n_chunks, n_dropped, text_clean)`` for
    every input doc (all-boilerplate docs keep an empty string).

    Plan: one explode -> df count (two-level agg on (chunk, doc) then
    chunk) -> filter the df table down to VIOLATORS (``df > max_df``,
    actual boilerplate only — tiny by construction) -> broadcast
    left-anti join of the exploded chunks against that set ->
    order-restoring re-aggregation by doc.  The corpus-scale exploded
    side is shuffled exactly once (the df count); the verdict side never
    re-shuffles corpus tokens because the violator set is the small,
    broadcast side.  Work and shuffle volume are linear in corpus tokens
    — the same shape as exact dedup, run at chunk granularity.

    ``extra_chunk_df`` (a persisted :func:`chunk_document_frequency`
    table, possibly multi-appended) adds PRIOR batches' counts to this
    corpus's own before the verdict, so a chunk under the cap within
    the batch but over it across batches is dropped too — the
    cross-batch closure for incremental updates.  For that closure to
    survive MULTIPLE updates, the persisted table must hold
    PRE-verdict counts (frequencies over each batch's input text,
    BEFORE this function's cut): a chunk this cut removes everywhere
    would have df 0 in the written corpus, and later batches could
    re-admit up to ``max_df`` copies of exactly that boilerplate.

    ``precomputed_dfreq`` short-circuits the internal frequency count
    entirely: it is taken as THE verdict table ``(chunk_h, df)``
    (already covering this corpus and any prior batches — e.g. the
    persisted sidecar read back after appending this batch's
    :func:`chunk_document_frequency`).  Mutually exclusive with
    ``extra_chunk_df``; use it when the caller has already
    materialized the counts, so the corpus is not re-counted here.
    """
    if precomputed_dfreq is not None and extra_chunk_df is not None:
        raise ValueError(
            "pass either precomputed_dfreq or extra_chunk_df, not both"
        )
    exploded = docs.select(
        F.col(id_col),
        F.explode(_chunk_structs(text_col, chunk_tokens)).alias("c"),
    ).select(
        id_col,
        "c.pos",
        "c.chunk",
        F.substring(F.md5(F.col("c.chunk")), 1, 16).alias("chunk_h"),
    )
    if precomputed_dfreq is not None:
        dfreq = precomputed_dfreq.select(
            "chunk_h", F.col("df").cast("long")
        )
    else:
        dfreq = (
            exploded.select(id_col, "chunk_h")
            .distinct()
            .groupBy("chunk_h")
            .agg(F.count("*").alias("df"))
        )
        if extra_chunk_df is not None:
            dfreq = (
                dfreq.unionByName(
                    extra_chunk_df.select(
                        "chunk_h", F.col("df").cast("long")
                    )
                )
                .groupBy("chunk_h")
                .agg(F.sum("df").alias("df"))
            )
    # Heavy-hitters verdict: only chunks OVER the df cap matter, and that
    # set is small by construction (it is the boilerplate).  Anti-joining
    # against the broadcast violator set keeps the corpus-scale exploded
    # side un-shuffled, where joining the full dfreq table back would be
    # a second corpus-volume shuffle at 100 TB.  ``broadcast_verdict=
    # False`` drops the forced-broadcast hint for the rare corpus whose
    # violator set itself outgrows executor memory (AQE then picks
    # broadcast vs shuffle from the measured size).
    violators = dfreq.filter(F.col("df") > max_df).select("chunk_h")
    if broadcast_verdict:
        violators = F.broadcast(violators)
    kept = exploded.join(violators, "chunk_h", "left_anti")
    reassembled = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pos"), F.col("chunk")))
                ),
                lambda s: s.chunk,
            ),
            " ",
        ).alias("text_clean"),
        F.count("*").alias("n_kept"),
    )
    totals = exploded.groupBy(id_col).agg(F.count("*").alias("n_chunks"))
    return (
        docs.select(id_col)
        .join(totals, id_col, "left")
        .join(reassembled, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_chunks", F.lit(0)).alias("n_chunks"),
            (
                F.coalesce("n_chunks", F.lit(0))
                - F.coalesce("n_kept", F.lit(0))
            ).alias("n_dropped"),
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
        )
    )


def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate-chunk removal verdict per doc; the cleaned text rides
    as an md5 (hash-comparable, avoids megabyte result columns)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = line_dedup(docs)
    return out.select(
        "doc_id",
        "n_chunks",
        "n_dropped",
        F.md5("text_clean").alias("clean_hash"),
    ).orderBy("doc_id")


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contaminated training docs (eval split excluded from the corpus
    side, as a real decontamination run would) with hit counts."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    eval_df = _eval_split(docs)
    train = docs.join(eval_df.select("doc_id"), "doc_id", "left_anti")
    out = decontaminate(train, eval_df)
    return (
        out.filter("contaminated")
        .select("doc_id", "n_hit_grams")
        .orderBy("doc_id")
    )


def q_decontaminate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-cut decontamination verdict per training doc (cleaned text
    rides as an md5, like line_dedup)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    eval_df = _eval_split(docs)
    train = docs.join(eval_df.select("doc_id"), "doc_id", "left_anti")
    out = decontaminate_spans(train, eval_df)
    return out.select(
        "doc_id",
        "n_tokens",
        "n_dup_tokens",
        F.md5("text_clean").alias("clean_hash"),
    ).orderBy("doc_id")


def dedup_chunks_within_doc(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = LINE_CHUNK_TOKENS,
) -> DataFrame:
    """Remove REPEATED chunks inside each document (keep the first
    occurrence), the within-document counterpart of ``line_dedup``'s
    cross-document pass — a templated page repeating its own nav block
    five times keeps one copy.

    Chunking is identical to ``line_dedup`` (consecutive
    ``chunk_tokens``-token windows). Everything is document-local:
    chunk -> ``array_distinct`` (order-preserving first occurrence,
    asserted against a naive reference in tests) -> rejoin, one map
    fused into the scan, ZERO shuffles — the operator costs nothing at
    100 TB beyond reading the text. Returns ``(id_col, n_chunks,
    n_dupes, text_clean)``.
    """
    # chunk identity MUST match line_dedup's — one shared chunking
    # expression (_chunk_structs), projected to the chunk strings
    chunks = F.transform(
        _chunk_structs(text_col, chunk_tokens), lambda s: s["chunk"]
    )
    kept = F.array_distinct(chunks)
    return docs.select(
        F.col(id_col),
        F.size(chunks).alias("n_chunks"),
        (F.size(chunks) - F.size(kept)).alias("n_dupes"),
        F.array_join(kept, " ").alias("text_clean"),
    )


def q_chunk_dedup_within(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repeated-chunk removal verdict per doc (cleaned
    text rides as an md5, like line_dedup)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = dedup_chunks_within_doc(docs)
    return out.select(
        "doc_id",
        "n_chunks",
        "n_dupes",
        F.md5("text_clean").alias("clean_hash"),
    ).orderBy("doc_id")
