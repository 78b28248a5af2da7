"""Engine-portable span arithmetic over block-structured text.

``kernel/spans.py`` emits [start, end) offsets of every topmost block
element into the extracted ``text`` by accumulating text lengths in
document order; its invariant is ``text[start:end] == block_text``.
That arithmetic runs inside the extraction kernel, out of reach of the
driver's DuckDB oracle — this module re-expresses the SAME accumulation
as pure Spark column expressions over a deterministic synthetic block
decomposition, so the offset arithmetic (prefix sums + separator
accounting + substring semantics) is pinned engine-portably by the
``spans_tiling`` checked query.

Scale shape: everything is document-local — one prefix-sum HOF per doc,
no shuffle (the posexplode feeds a map-side projection; ordering is only
for the deterministic oracle compare).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

SPAN_BLOCK_TOKENS = 25  # tokens per synthetic block in the checked query


def tile_block_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    blocks_col: str = "blocks",
    sep: str = " ",
) -> DataFrame:
    """(id, array<string> blocks) -> one row per block with its [start,
    end) offsets into ``sep``-joined text, plus ``slice_ok`` verifying
    ``substring(joined, start+1, end-start) == block`` in-engine.

    The prefix sum mirrors ``kernel/spans.py:block_spans``: each block
    starts where the previous ended plus the separator width; offsets
    are characters (both engines' ``length``/``substr`` are
    character-based, so the invariant is portable).
    """
    blocks = F.col(blocks_col)
    joined = F.array_join(blocks, sep)
    # acc = [0, end_0 + |sep|, end_1 + |sep|, ...]; entry i is block i's
    # start, computed in one document-local fold (no shuffle)
    starts = F.aggregate(
        blocks,
        F.array(F.lit(0).cast("long")),
        lambda acc, b: F.concat(
            acc,
            F.array(
                F.element_at(acc, -1)
                + F.length(b).cast("long")
                + F.lit(len(sep)).cast("long")
            ),
        ),
    )
    ex = df.select(
        F.col(id_col),
        F.posexplode(blocks).alias("block_idx", "block"),
        joined.alias("_joined"),
        starts.alias("_starts"),
    )
    span_start = F.get("_starts", F.col("block_idx"))
    span_end = span_start + F.length("block").cast("long")
    return ex.select(
        F.col(id_col),
        F.col("block_idx").cast("int").alias("block_idx"),
        span_start.alias("span_start"),
        span_end.alias("span_end"),
        F.md5("block").alias("block_hash"),
        (
            F.substring(
                F.col("_joined"), span_start.cast("int") + 1, F.length("block")
            )
            == F.col("block")
        ).alias("slice_ok"),
    )


def _block_expr(text_col: str = "text", block_tokens: int = SPAN_BLOCK_TOKENS):
    """Deterministic block decomposition: consecutive ``block_tokens``-
    token windows of the whitespace tokenization (same chunk unit as
    ``decontam.line_dedup``, so both engines recompute it exactly)."""
    from readability_ex_spark.operators.tokenize import ws_tokens

    toks = ws_tokens(text_col)
    n = F.ceil(F.size(toks) / F.lit(block_tokens)).cast("int")
    return F.when(
        n > 0,
        F.transform(
            F.sequence(F.lit(0), n - 1),
            lambda i: F.concat_ws(
                " ", F.slice(toks, i * block_tokens + 1, block_tokens)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def q_spans_tiling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checked query: block spans of every document's synthetic block
    decomposition — offsets, per-block hash, and the in-engine slice
    invariant (``slice_ok`` must be TRUE for every row in BOTH engines,
    which pins substring/offset semantics, not just the arithmetic)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    blocks = docs.select("doc_id", _block_expr().alias("blocks"))
    return tile_block_spans(blocks).orderBy("doc_id", "block_idx")
