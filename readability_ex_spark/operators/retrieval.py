"""BM25 keyword retrieval over the corpus — the inverted-index
complement of the ANN family (embedding search finds *semantic*
neighbors; BM25 finds *lexical* matches, the standard first-stage
retriever for corpus audit queries like "which documents mention X").

Okapi BM25 with the Lucene idf (``ln(1 + (N - df + 0.5)/(df + 0.5))``,
always positive). No reference counterpart (the reference is a
single-document extraction library); the formula is the published one
(Robertson & Zaragoza 2009, "The Probabilistic Relevance Framework").

Scale shape (100 TB): the corpus is scanned twice, both scans pruned to
``(id, text)`` — one cheap pass for the corpus constants (N, total
token count; at production scale these live in a stats sidecar and
amortize across queries) and one pass that explodes tokens and filters
to the query's terms BEFORE any shuffle, so the only exchange is the
``(doc_id, term)`` hash agg over matching postings — |query| terms x
matching docs rows, never token-scale. The per-term df table and the
1-row stats frame broadcast to the scoring join. No UDFs anywhere —
the whole plan is codegen.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from readability_ex_spark.operators.tokenize import ws_tokens

BM25_K1 = 1.2
BM25_B = 0.75

# deterministic query for the checked contract (terms present in the
# synthetic corpus vocabulary at every SF)
BM25_QUERY = ["vector", "stream", "merge"]
BM25_TOPK = 10


def bm25_topk(
    docs: DataFrame,
    query_terms: Sequence[str],
    k: int = BM25_TOPK,
    k1: float = BM25_K1,
    b: float = BM25_B,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` documents by BM25 score for a bag of query terms.

    Returns (doc_id, n_terms, score): matched-term count and the
    6-rounded BM25 sum, ordered score DESC then doc_id. Tokenization is
    the corpus-standard whitespace split (empty text -> no tokens), so
    term statistics agree with every other token-grain operator.

    The score expression is written with the exact literal shape of the
    DuckDB oracle (same association order) so both engines compute
    bit-comparable doubles before the 6-digit rounding.
    """
    if not query_terms:
        raise ValueError("bm25_topk needs at least one query term")
    toks = ws_tokens(text_col)
    base = docs.select(
        F.col(id_col).alias("doc_id"), toks.alias("_toks")
    ).withColumn("dl", F.size("_toks"))
    stats = base.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    tf = (
        base.select("doc_id", "dl", F.explode("_toks").alias("term"))
        .filter(F.col("term").isin(*[str(t) for t in query_terms]))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").alias("tf"))
    )
    df_t = tf.groupBy("term").agg(F.count("*").alias("df"))
    return _score_topk(tf.join(F.broadcast(df_t), "term"), stats, k, k1, b)


def _score_topk(tf, stats, k: int, k1: float, b: float) -> DataFrame:
    """Shared scoring tail: ``tf`` carries (doc_id, dl, term, tf, df),
    ``stats`` is the 1-row (n_docs, sum_dl) frame. One expression used
    by BOTH the inline and the materialized path, so their results (and
    the shared oracle) agree bit-for-bit."""
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    s = (
        idf
        * (F.col("tf") * F.lit(k1 + 1.0))
        / (
            F.col("tf")
            + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / avgdl)
        )
    )
    return (
        tf.crossJoin(F.broadcast(stats))
        .select("doc_id", s.alias("_s"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_terms"),
            F.round(F.sum("_s"), 6).alias("score"),
        )
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(k)
    )


N_TERM_BUCKETS = 64


def _term_bucket_expr(term_col) -> "F.Column":
    """md5-based term bucket (NOT xxhash64: the probe computes the same
    bucket DRIVER-side with hashlib, which md5 makes bit-identical)."""
    return (
        F.conv(F.substring(F.md5(term_col), 1, 4), 16, 10).cast("long")
        % N_TERM_BUCKETS
    ).cast("int")


def term_bucket(term: str) -> int:
    """Driver-side twin of :func:`_term_bucket_expr`."""
    import hashlib

    return int(hashlib.md5(term.encode()).hexdigest()[:4], 16) % N_TERM_BUCKETS


def materialize_bm25(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Write the BM25 inverted index: FULL postings (term, doc_id, tf,
    dl, df) partitioned by a 64-way md5 term bucket, plus the 1-row
    corpus stats table — the amortized build that turns per-query
    corpus scans into partition-pruned posting reads (the same
    build/probe split as the materialized ANN indexes).

    Rows are clustered by bucket before the partitioned write (the
    `materialize_buckets` lesson: unclustered partitionBy sprays
    tasks × buckets small files). df is denormalized onto each posting
    so the probe needs no extra join."""
    toks = ws_tokens(text_col)
    base = docs.select(
        F.col(id_col).alias("doc_id"), toks.alias("_toks")
    ).withColumn("dl", F.size("_toks"))
    base.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("sum_dl")
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/stats")
    tf = (
        base.select("doc_id", "dl", F.explode("_toks").alias("term"))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").alias("tf"))
    )
    df_t = tf.groupBy("term").agg(F.count("*").alias("df"))
    postings = tf.join(df_t, "term").withColumn(
        "term_bucket", _term_bucket_expr(F.col("term"))
    )
    # explicit partition count: a bare repartition(col) is
    # AQE-coalescible, and on a byte-small index the exchange collapsed
    # to one task writing all 64 bucket directories sequentially (the
    # materialize_buckets lesson, second instance)
    n_tasks = max(docs.sparkSession.sparkContext.defaultParallelism, 1)
    postings.repartition(n_tasks, F.col("term_bucket")).write.mode(
        "overwrite"
    ).partitionBy("term_bucket").parquet(f"{path}/postings")


def bm25_materialized_topk(
    spark: SparkSession,
    index_path: str,
    query_terms,
    k: int = BM25_TOPK,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Serve BM25 from a :func:`materialize_bm25` index — the 100 TB
    read path: only the query terms' bucket directories are read
    (construction RAISES unless the bucket predicate reached the scan
    as a PartitionFilter, the same broken-index contract as the ANN
    probes), so a 3-term query touches <= 3/64 of the postings.
    Returns EXACTLY what :func:`bm25_topk` returns on the same corpus
    (shared scoring tail; parity is oracle- and test-pinned)."""
    import io
    from contextlib import redirect_stdout

    if not query_terms:
        raise ValueError("bm25_materialized_topk needs at least one term")
    terms = [str(t) for t in query_terms]
    buckets = sorted({term_bucket(t) for t in terms})
    pruned = (
        spark.read.parquet(f"{index_path}/postings")
        .filter(F.col("term_bucket").isin(buckets))
        .filter(F.col("term").isin(terms))
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        pruned.explain(True)
    seg = buf.getvalue().split("PartitionFilters: [", 1)
    if len(seg) != 2 or "term_bucket" not in seg[1][:300]:
        raise RuntimeError(
            "bm25_materialized_topk: term buckets did not partition-prune "
            f"the postings scan at {index_path}"
        )
    stats = spark.read.parquet(f"{index_path}/stats")
    return _score_topk(pruned.drop("term_bucket"), stats, k, k1, b)


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 for the fixed 3-term query over documents."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return bm25_topk(docs, BM25_QUERY)


# ---------------------------------------------------------------------------
# Overlapping document chunking (retrieval / RAG ingestion)
# ---------------------------------------------------------------------------

CHUNK_SIZE = 32  # tokens per chunk
CHUNK_STRIDE = 24  # start-to-start distance (overlap = size - stride)


def chunk_documents(
    docs: DataFrame,
    size: int = CHUNK_SIZE,
    stride: int = CHUNK_STRIDE,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split documents into overlapping fixed-token chunks — the
    retrieval-ingestion twin of ``sampling.pack_sequences`` (packing
    concatenates docs into training sequences; chunking windows ONE doc
    into index units with overlap so no phrase is split across every
    chunk boundary).

    Chunk ``k`` covers tokens ``[k*stride, min(k*stride + size, n))``;
    chunk count = 1 for ``n <= size`` else ``1 + ceil((n-size)/stride)``
    (the last chunk always reaches the end of the doc; token-less docs
    produce no chunks). Returns ``(id, chunk_id, tok_start, tok_end,
    chunk_text)`` — the token spans let a retriever map hits back into
    the document, the same offset discipline as the kernel's text
    spans.

    Scale: document-local — a codegen projection + explode, ZERO
    shuffles; all arithmetic is exact integer ``div`` so every engine
    (and rerun) chunks identically.
    """
    if size < 1 or stride < 1 or stride > size:
        raise ValueError("need 1 <= stride <= size")
    toks = ws_tokens(text_col)
    base = docs.select(F.col(id_col), toks.alias("_toks")).withColumn(
        "_n", F.size("_toks")
    )
    n = F.col("_n")
    n_chunks = (
        F.when(n == 0, F.lit(0).cast("long"))
        .when(n <= size, F.lit(1).cast("long"))
        .otherwise(F.expr(f"1 + ((_n - {size} + {stride} - 1) div {stride})"))
    )
    # guard: Spark's sequence(0, -1) would generate a DESCENDING ramp
    chunks = F.when(
        n_chunks > 0,
        F.transform(
            F.sequence(F.lit(0).cast("long"), n_chunks - 1),
            lambda k: F.struct(
                k.alias("chunk_id"),
                (k * stride).alias("tok_start"),
                F.least(k * stride + size, n.cast("long")).alias("tok_end"),
                F.concat_ws(
                    " ",
                    F.slice(
                        F.col("_toks"),
                        (k * stride + 1).cast("int"),
                        (
                            F.least(k * stride + size, n.cast("long"))
                            - k * stride
                        ).cast("int"),
                    ),
                ).alias("chunk_text"),
            ),
        ),
    )
    return base.select(
        F.col(id_col), F.explode(chunks).alias("_c")
    ).select(
        id_col,
        F.col("_c.chunk_id").alias("chunk_id"),
        F.col("_c.tok_start").alias("tok_start"),
        F.col("_c.tok_end").alias("tok_end"),
        F.col("_c.chunk_text").alias("chunk_text"),
    )


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping 32/24 token chunks over documents."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return chunk_documents(docs).orderBy("doc_id", "chunk_id")


def q_bm25_materialized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 for the fixed query served from a materialized
    postings index — same result contract (and the same oracle) as
    bm25_topk, but the read path is the partition-pruned probe,
    asserted at construction."""
    from readability_ex_spark.operators.similarity import _ann_scratch_dir

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    path = _ann_scratch_dir()
    materialize_bm25(docs, path)
    return bm25_materialized_topk(spark, path, BM25_QUERY)
