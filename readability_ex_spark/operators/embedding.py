"""Text -> embedding: a deterministic hashing-trick n-gram vectorizer.

Closes the loop between the text corpus and the ANN/embedding family
(``operators/similarity.py``): instead of requiring a pre-supplied
``embeddings`` table, ``text_embedding`` produces a dense
``array<double>`` vector per document directly from its text, so
embedding near-dup / ANN compose with ``prepare_training_corpus``
end-to-end.

The vectorizer is the classic feature-hashing ("hashing trick",
Weinberger et al. 2009) bag of unigrams + bigrams:

- feature set = whitespace tokens plus adjacent-token bigrams
  (occurrence counts, not distinct — repeated phrases weigh more);
- each feature hashes to bucket ``int(md5(f)[:2], 16) % dim`` with sign
  +1/-1 from the lsb of md5 hex digit 3 (the signed variant keeps the
  estimator unbiased under collisions);
- the count vector is L2-normalized.

Everything is md5-based so the DuckDB oracle recomputes the embedding
bit-exactly (the same engine-portability rule as textops): bucket and
sign come from *hex digits* of md5, which both engines render
identically, and the per-bucket values are small exact integers before
the one final division — no float-accumulation-order hazards.

Scale shape: tokenization stays JVM-side (the codegen'd expression the
oracle mirrors); hashing + accumulation run in ONE Arrow-vectorized
pandas UDF (per-token hashlib in a plain loop — the BENCH/BASELINE.md
HOF rule: interpreted higher-order functions carry a ~100x constant
for per-element md5). No shuffle at all: embedding is a map-only
column, so at 100 TB it pipelines inside the extraction stage.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TEXT_EMB_DIM = 64  # matches the embeddings-table contract width
_ODD_HEX = "13579bdf"  # hex digits with lsb=1 (sign bit source)
# near-identical texts hash to near-identical count vectors; 0.8 is well
# above unrelated-doc cosine on the sf corpora (vocabulary overlap alone
# measured < 0.6) while the synthetic near-dup families land > 0.9
TEXT_EMB_ND_THRESHOLD = 0.8
# hashing-trick vectors are DENSE and correlated in sign-bucket space,
# so the bucketing is a measured recall/cost tradeoff against numpy
# brute-force ground truth (2,055 true pairs >= 0.8 at sf0.1):
#   single-table  8 planes, Hamming<=1 probe: 2.2M candidates -> 64%
#   single-table 12 planes, Hamming<=2:       3.1M candidates -> 79%
#   BANDED 8 planes x 10 tables:             3.85M candidates -> 88%
# OR-amplification across independent coarse tables dominates deeper
# probe balls around one fine table on this distribution — and, per
# the round-7 head-to-head (scripts/bench_emb_nd.py), it also
# dominates SemDeDup-style k-means cells as a PAIR FINDER (cells cap
# at ~50% recall: pairs straddling a cell boundary are invisible by
# construction).  More tables are nearly free thanks to
# distinct-before-verify plus the 2*k*T-bit signature-Hamming
# prefilter (see embedding_near_dup_banded), which kills far
# candidates inside the band-join stage: T=24 (chosen) 98.6% recall,
# 0 false pairs, 9.6 s at sf0.1 (17.2 s before the prefilter;
# T=32 99.7% @11.4 s is the next step on the curve).
TEXT_EMB_ND_K = 8
TEXT_EMB_ND_TABLES = 24

# versioned identity of the _emb_sigs index scheme (embedding family +
# dim, band shape, signature width, plane seed): recorded in
# _sidecars.json when the index is written and REFUSED on mismatch by
# --update runs — signatures computed under different constants are
# incomparable, and silently mixing them in one index is the same
# failure class the checksum-rule pin closed in round 6. Bump the v
# suffix on any semantic change that keeps these numbers equal.
def _emb_sig_rule() -> str:
    from readability_ex_spark.operators.similarity import LSH_SEED

    sig_bits = 2 * TEXT_EMB_ND_K * TEXT_EMB_ND_TABLES
    return (
        f"hash{TEXT_EMB_DIM}:k{TEXT_EMB_ND_K}xT{TEXT_EMB_ND_TABLES}"
        f":sig{sig_bits}:seed{LSH_SEED}:v1"
    )


EMB_SIG_RULE = _emb_sig_rule()


def nonzero_embeddings(
    df: DataFrame, emb_col: str = "embedding", dim: int = TEXT_EMB_DIM
) -> DataFrame:
    """Drop zero-norm vectors (empty / all-OOV text hashes to the zero
    vector, for which cosine is undefined).  One shared filter so every
    embedding consumer applies the same rule.  Flat ``getItem(i) != 0``
    OR-chain, not ``aggregate(transform(...))``: the width is known
    (every caller feeds ``text_embedding`` output), and the interpreted
    HOF pair measured ~1.6 s over 5k rows at sf0.1 vs ~0 for the
    codegen chain (the BENCH/BASELINE.md HOF-unroll rule).  Equivalent
    by construction: sum(x_i^2) > 0 iff any x_i != 0 (components are
    finite by the vectorizer's contract); a NULL array fails both
    forms."""
    pred = F.col(emb_col).getItem(0) != 0.0
    for i in range(1, dim):
        pred = pred | (F.col(emb_col).getItem(i) != 0.0)
    return df.filter(pred)


def text_embedding(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = TEXT_EMB_DIM,
    out_col: str = "embedding",
) -> DataFrame:
    """(id, embedding array<double>[dim]) hashing-trick document vectors.

    Empty/whitespace-only text yields the all-zero vector (callers that
    feed ANN/near-dup should filter zero-norm rows first — cosine is
    undefined for them; ``q_text_emb_near_dup`` does).
    """
    if not 1 <= dim <= 256:
        # bucket = first 2 md5 hex digits (8 bits) mod dim — the oracle
        # recomputes it from those digits, so dim must divide into them
        raise ValueError("text_embedding: dim must be in [1, 256]")
    from hashlib import md5

    from pyspark.sql.functions import pandas_udf

    # (bucket, sign) per feature string, memoized across the task's
    # batches (closure state deserializes empty per task, then persists
    # for its lifetime — guide §4.5 shape): tokens and bigrams repeat
    # heavily across documents (Zipfian vocab), so each distinct
    # feature pays hashlib once per task instead of once per occurrence
    _vec_memo: dict[str, tuple[int, float]] = {}

    @pandas_udf("array<double>")
    def _vec(toks: pd.Series) -> pd.Series:
        memo: dict[str, tuple[int, float]] = _vec_memo
        out = []
        for arr in toks:
            v = np.zeros(dim, dtype=np.float64)
            if arr is not None and len(arr):
                feats = list(arr) + [
                    f"{arr[i]} {arr[i + 1]}" for i in range(len(arr) - 1)
                ]
                for f in feats:
                    bs = memo.get(f)
                    if bs is None:
                        h = md5(f.encode("utf-8")).hexdigest()
                        bs = (
                            int(h[:2], 16) % dim,
                            1.0 if h[2] in _ODD_HEX else -1.0,
                        )
                        memo[f] = bs
                    v[bs[0]] += bs[1]
            # v holds small exact integers; sum of their squares is
            # exact, so the normalized values are bit-identical to the
            # oracle's val / sqrt(sum(val^2)) regardless of sum order
            n = float(np.sqrt((v * v).sum()))
            out.append((v / n).tolist() if n > 0 else v.tolist())
        return pd.Series(out)

    from readability_ex_spark.operators.tokenize import ws_tokens

    toks = ws_tokens(text_col)
    return df.select(F.col(id_col), _vec(toks).alias(out_col))


def q_text_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nonzero embedding components per document, long format
    (doc_id, bucket, value) — the hash-comparable contract for the
    vectorizer (arrays of doubles compare poorly; their components
    round-trip exactly)."""
    from readability_ex_spark.operators.textops import _docs

    emb = text_embedding(_docs(spark, sf_dir))
    return (
        emb.select("doc_id", F.posexplode("embedding").alias("bucket", "_v"))
        .filter(F.col("_v") != 0.0)
        .select(
            "doc_id",
            F.col("bucket").cast("long").alias("bucket"),
            F.round(F.col("_v"), 6).alias("value"),
        )
        .orderBy("doc_id", "bucket")
    )


def q_text_emb_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end embedding near-dup FROM TEXT: text_embedding ->
    zero-norm filter -> the standard LSH-bucketed embedding_near_dup
    (Hamming-1 candidates, exact cosine >= TEXT_EMB_ND_THRESHOLD).

    The whole chain is corpus-native — no pre-supplied vectors table —
    which is the composition a training pipeline runs: near-dup in
    embedding space catches paraphrase-level duplicates token-Jaccard
    misses. Bucketing: banded multi-table LSH, TEXT_EMB_ND_K planes x
    TEXT_EMB_ND_TABLES tables (see the constants' measured recall
    table)."""
    from readability_ex_spark.operators.similarity import (
        embedding_near_dup_banded,
    )
    from readability_ex_spark.operators.textops import _docs

    emb = nonzero_embeddings(text_embedding(_docs(spark, sf_dir)))
    return (
        embedding_near_dup_banded(
            emb.select(F.col("doc_id").alias("vec_id"), "embedding"),
            threshold=TEXT_EMB_ND_THRESHOLD,
            dim=TEXT_EMB_DIM,
            k_planes=TEXT_EMB_ND_K,
            n_tables=TEXT_EMB_ND_TABLES,
        )
        .select(
            F.col("vec_a").alias("doc_a"),
            F.col("vec_b").alias("doc_b"),
            "cosine",
        )
        .orderBy("doc_a", "doc_b")
    )


def q_cross_emb_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-update drop verdict in EMBEDDING space: batch docs
    (``doc_id % CROSS_SPLIT_MOD == 0`` — the same deterministic corpus
    split as the text-LSH ``cross_near_dup`` query, so real dup
    families straddle the sides) whose text embedding near-duplicates
    (cosine >= TEXT_EMB_ND_THRESHOLD) an existing-side doc. The
    existing side's band codes play the persisted ``_emb_sigs`` index:
    the oracle recomputes banding, the existing-side bucket cap, the
    signature-Hamming prefilter, and the exact-cosine verify."""
    from readability_ex_spark.operators.similarity import (
        banded_sig_codes,
        cross_emb_near_dup_matches,
    )
    from readability_ex_spark.operators.textops import CROSS_SPLIT_MOD, _docs

    emb = nonzero_embeddings(text_embedding(_docs(spark, sf_dir))).select(
        F.col("doc_id").alias("vec_id"), "embedding"
    )
    batch = emb.filter(F.col("vec_id") % CROSS_SPLIT_MOD == 0)
    existing = emb.filter(F.col("vec_id") % CROSS_SPLIT_MOD != 0)
    sigs = banded_sig_codes(
        existing,
        dim=TEXT_EMB_DIM,
        k_planes=TEXT_EMB_ND_K,
        n_tables=TEXT_EMB_ND_TABLES,
    ).select("vec_id", "cs", "sig")
    return (
        cross_emb_near_dup_matches(
            batch,
            existing,
            threshold=TEXT_EMB_ND_THRESHOLD,
            dim=TEXT_EMB_DIM,
            k_planes=TEXT_EMB_ND_K,
            n_tables=TEXT_EMB_ND_TABLES,
            existing_sigs=sigs,
        )
        .select(F.col("vec_id").alias("doc_id"))
        .orderBy("doc_id")
    )
