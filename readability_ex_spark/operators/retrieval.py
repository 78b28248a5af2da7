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
    c = F.col(text_col)
    toks = F.when(
        c.isNull() | (F.trim(c) == ""), F.array().cast("array<string>")
    ).otherwise(F.split(F.trim(c), r"\s+"))
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
        tf.join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", s.alias("_s"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_terms"),
            F.round(F.sum("_s"), 6).alias("score"),
        )
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(k)
    )


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
    c = F.col(text_col)
    toks = F.when(
        c.isNull() | (F.trim(c) == ""), F.array().cast("array<string>")
    ).otherwise(F.split(F.trim(c), r"\s+"))
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
