"""Exact substring deduplication (Lee et al. 2021, "Deduplicating
Training Data Makes Language Models Better"), distributed.

The published ExactSubstr algorithm builds one suffix array over the
whole corpus and removes every duplicated run of >= 50 tokens, keeping
a single copy.  A suffix array is a single-machine structure; the
distributed equivalent used here works at fixed window granularity:
every ``k``-token window (stride 1) is hashed, a window whose hash
occurs more than once corpus-wide is duplicated, its FIRST occurrence
(minimum ``(doc_id, pos)`` — deterministic, engine-portable) survives,
and every other occurrence's token span is removed.  Overlapping
removed windows merge into maximal spans, so a long duplicated run is
cut exactly like the suffix-array version; runs shorter than ``k``
are below the detection floor (the same contract as the published
50-token threshold).  Unlike ``line_dedup`` (fixed chunk GRID, C4
semantics) this catches duplicated runs at ARBITRARY offsets.

Plan shape at 100 TB:

- window hashing is one Arrow map pass (re-using the shingle hash unit
  so the DuckDB oracle stays exact);
- the duplicate verdict is a hash AGGREGATION on the window hash
  (count + min occurrence — partial aggregation caps any hot key's
  reducer input at one row per map partition) plus an equi-join AQE's
  skew-join can split: skew-safe by construction, because a
  boilerplate window occurring 10^6 times is a certainty at 100 TB.
  ``skew_safe=False`` opts into the one-exchange window-function plan
  (count + first-occurrence rank in a single shuffle) for corpora
  known to be boilerplate-free — cheaper, but a window partition
  cannot be split;
- duplicated positions fold back per document (doc-cardinality
  shuffle after map-side combine) and the span cut + text rebuild is
  one Arrow map pass over the SAME JVM token arrays the positions
  were computed from.
"""
from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from pyspark.sql.functions import pandas_udf

from readability_ex_spark.operators.textops import _text_tokens

K_SUBSTR = 20  # detection floor, tokens (Lee et al. use 50 at web scale)


def window_hash_expr(text_col: str = "text", k: int = K_SUBSTR):
    """ALL ``k``-token windows in positional order (stride 1), each
    reduced to the first 16 hex chars of its md5 — ``shingle_expr``'s
    hash unit without the set-dedup, so position ``i`` of the array is
    the window starting at token ``i``."""
    from hashlib import md5 as _md5

    @pandas_udf("array<string>")
    def _wh(tok_arrs: pd.Series) -> pd.Series:
        out = []
        join = " ".join
        for toks in tok_arrs:
            if toks is None or len(toks) < k:
                out.append([])
                continue
            out.append(
                [
                    _md5(join(toks[i : i + k]).encode("utf-8")).hexdigest()[
                        :16
                    ]
                    for i in range(len(toks) - k + 1)
                ]
            )
        return pd.Series(out)

    return _wh(_text_tokens(text_col))


def cut_spans(
    docs: DataFrame,
    marked: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = K_SUBSTR,
) -> DataFrame:
    """Remove every ``k``-token span starting at a position in
    ``marked`` (columns ``(id_col, pos)``) from each doc's text,
    merging overlaps into maximal spans; rows absent from ``marked``
    pass through untouched.  Returns ``(id_col, n_tokens,
    n_dup_tokens, text_clean)``.

    The marked positions fold to one sorted array per doc
    (doc-cardinality shuffle after map-side combine) and the cut +
    rebuild is a single Arrow map pass — the shared tail of every
    span-removal operator here (substring dedup, span
    decontamination).

    The cut operates on the SAME JVM token array
    (``textops._text_tokens``) the window positions were computed
    from — re-tokenizing in Python would shift positions on text with
    leading/trailing non-space whitespace (``F.trim`` strips only
    spaces, so the JVM split can emit a leading empty token that an
    ASCII ``\\s+`` re-split would not)."""
    dup_pos = marked.groupBy(id_col).agg(
        F.sort_array(F.collect_list("pos")).alias("_dup_pos")
    )

    @pandas_udf("struct<n_tokens:long,n_dup_tokens:long,text_clean:string>")
    def _cut(tok_arrs: pd.Series, dup_pos: pd.Series) -> pd.DataFrame:
        rows = []
        for toks, ps in zip(tok_arrs, dup_pos):
            toks = [] if toks is None else list(toks)
            n = len(toks)
            if ps is None or len(ps) == 0:
                rows.append((n, 0, " ".join(toks)))
                continue
            removed = bytearray(n)
            for p in ps:
                removed[p : p + k] = b"\x01" * min(k, n - p)
            kept = [tok for i, tok in enumerate(toks) if not removed[i]]
            rows.append((n, n - len(kept), " ".join(kept)))
        return pd.DataFrame(
            rows, columns=["n_tokens", "n_dup_tokens", "text_clean"]
        )

    out = docs.join(dup_pos, id_col, "left").select(
        F.col(id_col),
        _cut(_text_tokens(text_col), F.col("_dup_pos")).alias("_r"),
    )
    return out.select(id_col, "_r.n_tokens", "_r.n_dup_tokens", "_r.text_clean")


def substring_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = K_SUBSTR,
    skew_safe: bool = True,
) -> DataFrame:
    """``(id_col, n_tokens, n_dup_tokens, text_clean)`` per document
    with every non-first occurrence of a corpus-duplicated ``k``-token
    run removed (overlaps merged into maximal spans).

    Two equivalent physical plans (equivalence-tested):

    - default (``skew_safe=True``): hash aggregation (count + min
      occurrence per hash — partial aggregation bounds any hot key's
      reducer input to one row per map partition) followed by a
      verdict equi-join that AQE's skew-join can split.  This is the
      plan the composed corpus jobs ship: at 100 TB a boilerplate
      window occurring 10^6+ times is a certainty, not an edge case.
    - ``skew_safe=False``: ONE exchange on the window hash; a window
      function yields occurrence count and first-occurrence rank
      together.  One token-scale exchange cheaper, but a window
      partition cannot be split — the hot window's whole hash
      partition lands in one task.  Opt-in for corpora known to be
      boilerplate-free (e.g. already line-deduped).
    """
    occ = docs.select(
        F.col(id_col),
        F.posexplode(window_hash_expr(text_col, k)).alias("pos", "h"),
    )
    if skew_safe:
        # plans are trees: the verdict agg AND the probe side both
        # reference occ, so the Arrow md5 window hashing runs twice.
        # Persisting occ was MEASURED SLOWER (75 s vs 49 s on the
        # sf0.1 composed-full build): materializing the token-scale
        # exploded table evicts the composition's cached extraction
        # and costs more than the second hash pass. Re-hashing wins.
        first = F.struct(F.col(id_col), F.col("pos"))
        verdict = (
            occ.groupBy("h")
            .agg(F.count("*").alias("_c"), F.min(first).alias("_first"))
            .filter(F.col("_c") > 1)
            .select("h", "_first")
        )
        dup_occ = (
            occ.join(verdict, "h")
            .filter(first != F.col("_first"))
            .select(id_col, "pos")
        )
    else:
        wspec = Window.partitionBy("h")
        worder = wspec.orderBy(id_col, "pos")
        dup_occ = (
            occ.withColumn("_c", F.count("*").over(wspec))
            .withColumn("_rn", F.row_number().over(worder))
            .filter((F.col("_c") > 1) & (F.col("_rn") > 1))
            .select(id_col, "pos")
        )
    return cut_spans(docs, dup_occ, id_col, text_col, k)


def q_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-dedup verdict per doc (cleaned text rides as an md5,
    like line_dedup)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = substring_dedup(docs)
    return out.select(
        "doc_id",
        "n_tokens",
        "n_dup_tokens",
        F.md5("text_clean").alias("clean_hash"),
    ).orderBy("doc_id")
