"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k with JVM-side array expressions
(`F.zip_with` dot product + `F.aggregate` sum) — no Python in the hot
path. Scale paths:

- random-hyperplane LSH buckets with Hamming-radius multi-probe (good
  when near neighbors are close in angle, e.g. near-duplicate
  embeddings at cosine > 0.9);
- IVF: a k-means coarse quantizer trained driver-side on a bounded
  sample, cells assigned JVM-side, queries probing their ``nprobe``
  nearest cells (adapts to the data's cluster structure — the right
  index when neighbors are only moderately closer than the bulk).

Both support batch-query joins (query table × bucket/cell join →
per-query exact cosine top-k window) and a materialized
bucket-partitioned table so at 100 TB the probe read is partition-
pruned instead of a full scan.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

QUERY_VEC_ID = 0  # deterministic query point for the checked top-k
EMB_DIM = 64  # embeddings-table contract (TESTDATA.md: array<float>[64])
# Sandbox default. At 10^12 vectors use 16-24 planes (2^16-2^24 buckets
# keep expected bucket sizes in the 10^5-10^7 range a capped verify can
# handle); the 16-plane materialize/probe path is exercised by
# test_materialized_index_16_planes_prunes_finer. 8 planes here because
# the sf tables hold 500-5,000 vectors — more planes leave every bucket
# a singleton (index still correct, recall pointless).
N_PLANES = 8
LSH_SEED = 42


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    s = F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    # NULL (not 0) for zero vectors: cosine against a zero vector is
    # undefined, and the 0/0 = NaN it would otherwise produce sorts
    # ABOVE every real double under desc() — degenerate vectors would
    # silently fill the top-k. A NULL cosine sorts LAST under desc(),
    # so zero-norm rows sink instead (callers that must exclude them
    # entirely use embedding.nonzero_embeddings).
    return F.when(s > 0, F.sqrt(s))


def _query_vec(emb: DataFrame, vec_id: int) -> list[float]:
    """The query point's embedding, failing LOUDLY when the id is
    absent (a filtered/truncated table would otherwise surface as an
    opaque NoneType subscript — same contract as _seed_centroids'
    missing-seed error)."""
    row = emb.filter(F.col("vec_id") == vec_id).select("embedding").head()
    if row is None:
        raise ValueError(
            f"query vec_id={vec_id} missing from the embeddings table"
        )
    return [float(x) for x in row[0]]


def cosine_topk(
    emb: DataFrame, query_vec: list[float], k: int = 5, exclude_id: int | None = None
) -> DataFrame:
    """Brute-force cosine top-k against a constant query vector.

    The query vector is inlined as a literal array (broadcast-equivalent:
    a constant in the codegen'd expression — zero shuffle, one scan).
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    df = emb
    if exclude_id is not None:
        df = df.filter(F.col("vec_id") != exclude_id)
    cos = _dot(F.col("embedding"), q) / (_norm(F.col("embedding")) * _norm(q))
    return (
        df.select(
            "vec_id",
            "label",
            F.round(cos, 6).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
        .limit(k)
    )


def q_ann_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 cosine neighbors of vec_id=QUERY_VEC_ID (oracle-checked)."""
    emb = _emb(spark, sf_dir)
    qvec = _query_vec(emb, QUERY_VEC_ID)
    return cosine_topk(emb, qvec, k=5, exclude_id=QUERY_VEC_ID)


MAX_LABEL_BLOCK = 500  # blocks larger than this are dropped (see docstring)


def q_knn_label_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise same-label cosine >= 0.2 (blocked similarity join).

    Blocking key = label (stand-in for an IVF cell / LSH bucket): within
    each block the exact cosine runs JVM-side; across blocks nothing is
    compared. Blocks above MAX_LABEL_BLOCK are dropped — the quadratic
    within-block term must stay bounded at any corpus size; oversized
    blocks belong on the LSH/IVF candidate paths instead.
    """
    emb = _emb(spark, sf_dir)
    counts = emb.groupBy("label").agg(F.count("*").alias("_n"))
    bounded = (
        emb.join(counts, "label")
        .filter(F.col("_n") <= MAX_LABEL_BLOCK)
        .drop("_n")
    )
    a = bounded.select(
        F.col("label"),
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("emb_a"),
    )
    b = bounded.select(
        F.col("label"),
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("emb_b"),
    )
    cos = _dot(F.col("emb_a"), F.col("emb_b")) / (
        _norm(F.col("emb_a")) * _norm(F.col("emb_b"))
    )
    return (
        a.join(b, "label")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("label", "vec_a", "vec_b", F.round(cos, 6).alias("cosine"))
        .filter(F.col("cosine") >= 0.2)
        .orderBy("label", "vec_a", "vec_b")
    )


def _cosine_pairs(a_col, b_col):
    """Arrow-vectorized cosine between two array columns — BIT-EXACT to
    the interpreted ``_dot(a,b) / (_norm(a) * _norm(b))`` expression
    (and therefore to the DuckDB oracle): the accumulators add one
    component per step in index order across the whole batch, exactly
    the sequential left-to-right sum F.aggregate performs per row (a
    BLAS/np.dot pairwise sum could differ in the last ulp and flip a
    6-digit rounding). Used on the near-dup verify path, where
    candidate sets are millions of pairs and 3 interpreted 64-element
    aggregates per pair measured 40+ s at sf0.1 vs ~2 s vectorized —
    the BENCH/BASELINE.md HOF rule again."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _cos(a: pd.Series, b: pd.Series) -> pd.Series:
        if not len(a):
            return pd.Series([], dtype="float64")
        av = np.stack(a.values).astype("float64", copy=False)
        bv = np.stack(b.values).astype("float64", copy=False)
        dot = np.zeros(len(av))
        na = np.zeros(len(av))
        nb = np.zeros(len(av))
        for j in range(av.shape[1]):
            dot = dot + av[:, j] * bv[:, j]
            na = na + av[:, j] * av[:, j]
            nb = nb + bv[:, j] * bv[:, j]
        # eps clamp: a zero-norm side would make this 0/0 = NaN, and
        # Spark's ordering treats NaN as GREATER than every number, so
        # a NaN cosine would PASS >= threshold filters; clamped, the
        # pair scores 0 and fails. Exact for all nonzero vectors
        # (max(n, 1e-12) == n whenever any component is >= 1e-7), so
        # the bit-exactness contract above is untouched.
        return pd.Series(
            dot / np.maximum(np.sqrt(na) * np.sqrt(nb), 1e-12)
        )

    # asNondeterministic stops the optimizer DUPLICATING the eval when a
    # filter references the projected cosine column (guide §4.4 shape:
    # the pushed-down filter and the surviving projection each got their
    # own ArrowEvalPython — every verify pair paid the Arrow transfer
    # twice; plan-visible in plans/r08/text_emb_near_dup_before.txt).
    # The function is pure — the marker only constrains the optimizer.
    return _cos.asNondeterministic()(a_col, b_col)


def hyperplanes(dim: int, n_planes: int = N_PLANES, seed: int = LSH_SEED) -> np.ndarray:
    """Deterministic random hyperplanes — shared by the Spark operator
    and the DuckDB oracle (which inlines them as literal arrays)."""
    return np.random.default_rng(seed).standard_normal((n_planes, dim))


def lsh_bucket(
    emb: DataFrame,
    dim: int = EMB_DIM,
    n_planes: int = N_PLANES,
    seed: int = LSH_SEED,
    emb_col: str = "embedding",
    out_col: str = "bucket",
) -> DataFrame:
    """Random-hyperplane LSH bucket id per vector (scale path for ANN).

    ``dim`` is a parameter (the embedding column's contract width), not
    sniffed from the data — operator construction runs no Spark job.
    Hyperplanes are generated deterministically on the driver (numpy,
    seeded); the sign-bit bucket id is computed in ONE Arrow pass whose
    dots accumulate component-sequentially (index order) — the exact
    float semantics of the inlined-literal ``F.aggregate`` expression it
    replaces (and of the DuckDB oracle's list_sum over list_zip), so
    bucket ids are bit-identical while the plan sheds 8 interpreted
    64-element lambda chains per row (the BENCH/BASELINE.md HOF rule —
    same precedent as banded_sig_codes/ivf_assign). At 100 TB:
    groupBy(bucket) colocates candidates; query vectors hash to the
    same buckets. Plane i maps to bit (n_planes-1-i), i.e. the first
    plane is the MSB.
    """
    from pyspark.sql.functions import pandas_udf

    planes = hyperplanes(dim, n_planes, seed)

    @pandas_udf("long")
    def _bucket(embs: pd.Series) -> pd.Series:
        if len(embs) == 0:  # zero-row Arrow batch: nothing to hash
            return pd.Series([], dtype="int64")
        M = np.array(embs.tolist(), dtype=object)
        # fail loudly on a dim mismatch (ragged rows -> object matrix):
        # a silently zero-padded dot would land ALL vectors in bucket 0,
        # degrading the index into a cross join
        try:
            M = M.astype(np.float64)
        except (TypeError, ValueError):
            M = None
        if M is None or M.ndim != 2 or M.shape[1] != dim:
            got = "ragged/null" if M is None or M.ndim != 2 else M.shape[1]
            raise ValueError(
                f"lsh_bucket: expected {dim}-dim embedding, got {got}"
            )
        acc = np.zeros((len(M), n_planes))
        for i in range(dim):
            acc += M[:, i : i + 1] * planes.T[i : i + 1, :]
        w = 1 << np.arange(n_planes - 1, -1, -1, dtype=np.int64)
        return pd.Series(((acc >= 0) @ w).astype("int64"))

    return emb.withColumn(out_col, _bucket(F.col(emb_col)))


def probe_buckets(bucket: int, n_planes: int, probe_hamming: int = 1) -> list[int]:
    """All bucket ids within Hamming radius ``probe_hamming`` (<= 2) of
    ``bucket`` (multi-probe set). Radius 1 => 1 + n_planes buckets.
    Radii above 2 raise — silently returning the radius-2 ball would
    deliver lower recall than the caller's tuning assumes."""
    if probe_hamming > 2:
        raise ValueError(
            f"probe_hamming={probe_hamming} not supported (max radius 2)"
        )
    probes = {bucket}
    if probe_hamming >= 1:
        probes |= {bucket ^ (1 << i) for i in range(n_planes)}
    if probe_hamming >= 2:
        probes |= {
            bucket ^ (1 << i) ^ (1 << j)
            for i in range(n_planes)
            for j in range(i + 1, n_planes)
        }
    return sorted(probes)


def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN: per-bucket population (index statistics)."""
    emb = _emb(spark, sf_dir)
    return (
        lsh_bucket(emb)
        .groupBy("bucket")
        .agg(F.count("*").alias("n_vecs"))
        .orderBy("bucket")
    )


def query_bucket(query_vec: list[float], n_planes: int = N_PLANES, seed: int = LSH_SEED) -> int:
    """Driver-side bucket id of a query vector — bit-exact twin of the
    SQL-computed ``lsh_bucket``: sequential left-to-right dot sums (a
    BLAS dot's pairwise summation could flip the sign of a near-zero
    plane dot and desync the probe set from the SQL bucket)."""
    planes = hyperplanes(len(query_vec), n_planes, seed)
    q = [float(x) for x in query_vec]
    bucket = 0
    for i in range(n_planes):
        dot = 0.0
        for pj, qj in zip(planes[i], q):
            dot += float(pj) * qj
        bucket = bucket * 2 + (1 if dot >= 0 else 0)
    return bucket


def ann_lsh_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 5,
    n_planes: int = N_PLANES,
    seed: int = LSH_SEED,
    probe_hamming: int = 1,
) -> DataFrame:
    """Multi-probe LSH ANN: exact cosine ranking restricted to the
    query's bucket plus all buckets within ``probe_hamming`` sign flips.

    At 100 TB with a bucket-partitioned table (``materialize_buckets``)
    the probe set is a partition-pruned read of (1 + n_planes) buckets
    instead of a full sweep — ``ann_materialized_topk`` is that path."""
    qbucket = query_bucket(query_vec, n_planes, seed)
    probes = probe_buckets(qbucket, n_planes, probe_hamming)
    bucketed = lsh_bucket(emb, dim=len(query_vec), n_planes=n_planes, seed=seed)
    return cosine_topk(
        bucketed.filter(F.col("bucket").isin(probes)).drop("bucket"),
        query_vec,
        k=k,
    )


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe (Hamming-1) top-5 for the vec_id=0 query."""
    emb = _emb(spark, sf_dir)
    qvec = _query_vec(emb, QUERY_VEC_ID)
    return ann_lsh_topk(emb.filter(F.col("vec_id") != QUERY_VEC_ID), qvec, k=5)


def ann_batch_lsh_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    dim: int = EMB_DIM,
    n_planes: int = N_PLANES,
    seed: int = LSH_SEED,
    probe_hamming: int = 1,
) -> DataFrame:
    """Batch-query ANN: N queries per run, the shape a training-data
    pipeline actually needs (dedup-against-index, retrieval scoring).

    queries: DataFrame(query_id long, query_vec array<float>). Both
    sides are bucketed with the same inlined hyperplanes; the query side
    explodes its Hamming<=1 probe set, the join is a plain equality join
    on bucket (shuffle keyed by bucket — at 100 TB the embedding side is
    pre-partitioned by bucket, so only the tiny query side moves), and a
    per-query window takes the exact-cosine top-k."""
    bucketed = lsh_bucket(emb, dim=dim, n_planes=n_planes, seed=seed)
    qb = lsh_bucket(
        queries, dim=dim, n_planes=n_planes, seed=seed,
        emb_col="query_vec", out_col="qbucket",
    )
    # the full radius-<=2 probe masks, mirroring probe_buckets — the
    # old radius-1-only branch silently treated probe_hamming=2 as 1,
    # desyncing recall from the siblings that honor radius 2
    if probe_hamming > 2:
        raise ValueError(
            f"probe_hamming={probe_hamming} not supported (max radius 2)"
        )
    masks = [0]
    if probe_hamming >= 1:
        masks += [1 << i for i in range(n_planes)]
    if probe_hamming >= 2:
        masks += [
            (1 << i) | (1 << j)
            for i in range(n_planes)
            for j in range(i + 1, n_planes)
        ]
    if len(masks) > 1:
        probe = F.explode(
            F.array(
                *[
                    F.col("qbucket").bitwiseXOR(F.lit(m)).cast("long")
                    for m in masks
                ]
            )
        )
    else:
        probe = F.col("qbucket")
    probes = qb.select("query_id", "query_vec", probe.alias("bucket"))
    cos = _dot(F.col("embedding"), F.col("query_vec")) / (
        _norm(F.col("embedding")) * _norm(F.col("query_vec"))
    )
    from pyspark.sql import Window

    scored = (
        probes.join(bucketed, "bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", "label", F.round(cos, 6).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def q_ann_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch multi-probe LSH top-3 for queries vec_id < 8."""
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    return ann_batch_lsh_topk(emb, queries, k=3).orderBy(
        "query_id", F.col("cosine").desc(), "vec_id"
    )


EMB_MAX_BUCKET = 1000  # degenerate-bucket cap (see docstring)


def embedding_near_dup(
    emb: DataFrame,
    threshold: float = 0.4,
    dim: int = EMB_DIM,
    n_planes: int = N_PLANES,
    seed: int = LSH_SEED,
    probe_hamming: int = 1,
    max_bucket: int = EMB_MAX_BUCKET,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: LSH-bucket candidates
    (pairs whose sign-bit buckets are within ``probe_hamming`` flips),
    then exact cosine verify >= threshold.

    Same scale shape as text near-dedup: candidates come from an
    equality join on exploded probe buckets (the a-side explodes its
    Hamming ball — (1 + n_planes) rows per vector at radius 1), never a
    cross join, and — like the text paths — vectors in buckets larger
    than ``max_bucket`` are dropped before the join (10^6 boilerplate
    near-zero embeddings behind one bucket would otherwise emit
    ~5·10^11 pairs in one task; exact content-hash dedup covers them at
    linear cost). Returns (vec_a, vec_b, cosine) with vec_a < vec_b.

    The bucketed frame is localCheckpoint'd before the self-join: it is
    read FOUR times (bucket counts, both join sides, and through the
    verify), and when ``emb`` is itself computed — e.g. a
    ``text_embedding`` pandas UDF over the corpus — re-deriving it per
    branch repeated the vectorizer 4x (measured 47.7 s -> ~8 s for
    text_emb_near_dup at sf0.1)."""
    bucketed = lsh_bucket(
        emb, dim=dim, n_planes=n_planes, seed=seed
    ).localCheckpoint(eager=False)
    counts = bucketed.groupBy("bucket").agg(F.count("*").alias("_n"))
    b = (
        bucketed.join(counts, "bucket")
        .filter(F.col("_n") <= max_bucket)
        .drop("_n")
        # both self-join sides read this — checkpoint so the bucket-count
        # join runs once (bucketed alone was already checkpointed, but
        # the count+join subtree still re-ran per side)
        .localCheckpoint(eager=False)
    )
    # XOR masks of the Hamming ball around each bucket (radius 0/1/2);
    # more planes + radius 2 beats fewer planes + radius 1 at equal
    # recall: candidates shrink ~bucket-density-squared while the probe
    # explode grows only quadratically in n_planes (137 rows at 16).
    masks = [0]
    if probe_hamming >= 1:
        masks += [1 << i for i in range(n_planes)]
    if probe_hamming >= 2:
        masks += [
            (1 << i) | (1 << j)
            for i in range(n_planes)
            for j in range(i + 1, n_planes)
        ]
    probes = F.array(
        *[F.col("bucket").bitwiseXOR(F.lit(m)).cast("long") for m in masks]
    )
    a = b.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("emb_a"),
        F.explode(probes).alias("bucket"),
    )
    bb = b.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("emb_b"),
        "bucket",
    )
    cos = _cosine_pairs(F.col("emb_a"), F.col("emb_b"))
    return (
        a.join(bb, "bucket")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", F.round(cos, 6).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
        .distinct()
    )


def hamming_prefilter_cutoff(
    threshold: float, n_bits: int, margin: float = 4.0
) -> int:
    """Max signature Hamming distance a pair at exactly ``threshold``
    cosine plausibly shows over ``n_bits`` independent sign-hash bits.

    Each random-hyperplane bit disagrees with probability
    ``p = acos(cos) / pi`` (independent across planes given the pair's
    angle), so a pair AT the threshold has Binomial(n_bits, p) Hamming
    distance; the cutoff is ``mean + margin sigma`` — a pair >=
    threshold exceeds it with probability ~3e-5 at the default 4-sigma
    margin (pairs ABOVE threshold have strictly smaller p, so this
    bounds the whole keep set). Measured at sf0.1 (2,055 true pairs
    >= 0.8): observed max true-pair Hamming is mean+3.0s at 192 bits
    and mean+3.5s at 384 — the 4-sigma cutoff lost 0 of 2,055 at both
    widths, while 5 sigma was so loose it kept 55% of ALL pairs at 192
    bits (the distribution's mid-cosine mass sits only ~2 sigma above
    the threshold band). Pure integer output from module constants:
    the DuckDB oracle interpolates the SAME number, so both engines
    apply the identical filter and parity is exact by construction.
    """
    import math

    p = math.acos(max(-1.0, min(1.0, threshold))) / math.pi
    if p <= 0.0:
        return 0
    cut = n_bits * p + margin * math.sqrt(n_bits * p * (1.0 - p))
    return min(n_bits, int(math.floor(cut)))


def banded_sig_codes(
    emb: DataFrame,
    dim: int = EMB_DIM,
    k_planes: int = 8,
    n_tables: int = 10,
    seed: int = LSH_SEED,
    sig_bits: int | None = None,
) -> DataFrame:
    """``(vec_id, embedding, cs, sig)``: per-vector band codes (array
    of ``n_tables`` k-bit ints) plus the packed prefilter signature
    (``ceil(sig_bits/64)`` longs) in ONE Arrow pass — the shared
    derivation behind :func:`embedding_near_dup_banded` (self-join) and
    :func:`cross_emb_near_dup_matches` (batch-vs-corpus), and, dropped
    to ``(vec_id, cs, sig)``, the persistable ``_emb_sigs`` index that
    makes incremental embedding near-dup batch-linear: an update run
    codes only the NEW batch and joins the stored codes, never
    re-reading or re-coding the existing corpus.

    The dots accumulate component-sequentially (index order), the
    exact float semantics of the DuckDB oracle's list_sum over
    list_zip — a BLAS matmul's pairwise sums could flip a near-zero
    sign bit. Band codes use the FIRST ``k*T`` planes of the seeded
    stream; the signature's extra planes prefix-extend it
    (prefix-stability test-pinned), so signatures of different widths
    share band codes.
    """
    import numpy as np

    from pyspark.sql.functions import pandas_udf

    band_bits = k_planes * n_tables
    n_bits = max(band_bits, sig_bits or 2 * band_bits)
    n_words = (n_bits + 63) // 64
    planes = hyperplanes(dim, n_bits, seed)

    @pandas_udf("cs array<long>, sig array<long>")
    def _codes(embs: pd.Series) -> pd.DataFrame:
        if len(embs) == 0:  # zero-row Arrow batch: nothing to code
            return pd.DataFrame({"cs": [], "sig": []})
        M = np.array(embs.tolist(), dtype=np.float64)
        if M.ndim != 2 or M.shape[1] != dim:
            raise ValueError(
                f"embedding width {M.shape} != contract dim {dim}"
            )
        acc = np.zeros((len(M), n_bits))
        for i in range(dim):
            acc += M[:, i : i + 1] * planes.T[i : i + 1, :]
        bits = acc >= 0
        w = 1 << np.arange(k_planes - 1, -1, -1)  # plane 0 = MSB
        codes = bits[:, :band_bits].reshape(len(M), n_tables, k_planes) @ w
        # pack the same bits into 64-bit words (bit 0 = MSB of word 0;
        # zero padding past n_bits XORs to zero, so padding never
        # contributes to a Hamming distance). int64 wraparound on the
        # top byte is two's complement — the exact bit pattern Spark's
        # long carries, and bit_count/XOR are sign-agnostic.
        padded = np.zeros((len(M), n_words * 64), dtype=bool)
        padded[:, :n_bits] = bits
        by = np.packbits(padded, axis=1).reshape(len(M), n_words, 8)
        shifts = (np.arange(7, -1, -1, dtype=np.int64) * 8)[None, None, :]
        sigs = (by.astype(np.int64) << shifts).sum(
            axis=2, dtype=np.int64
        )
        return pd.DataFrame(
            {
                "cs": [[int(x) for x in row] for row in codes],
                "sig": [[int(x) for x in row] for row in sigs],
            }
        )

    return emb.select(
        F.col("vec_id"),
        F.col("embedding"),
        _codes("embedding").alias("c"),
    ).select(
        "vec_id", "embedding", F.col("c.cs").alias("cs"),
        F.col("c.sig").alias("sig"),
    )


def _sig_hamming(n_words: int, a: str = "sig_a", b: str = "sig_b"):
    """Hamming distance between two packed signatures as a flat
    ``getItem`` XOR/popcount sum, NOT aggregate/zip_with: the width is
    known at plan time, and the higher-order array functions run as
    interpreted lambda expressions (measured 11 s vs 3.2 s for the
    same filter over a 10M-row band join at sf0.1) — per-element
    expressions keep the whole filter inside codegen."""
    ham = None
    for w in range(n_words):
        term = F.bit_count(
            F.col(a).getItem(w).bitwiseXOR(F.col(b).getItem(w))
        )
        ham = term if ham is None else ham + term
    return ham


def _sig_hamming_flat(n_words: int, a: str = "a", b: str = "b"):
    """``_sig_hamming`` over flattened word columns (``{a}0..{a}{n-1}``
    vs ``{b}0..``): the band join materializes millions of candidate
    rows, and carrying the signature as scalar long columns instead of
    an array<long> skips one ArrayData allocation per row per side
    (measured ~15% off the join+filter+distinct chain at sf0.1)."""
    ham = None
    for w in range(n_words):
        term = F.bit_count(F.col(f"{a}{w}").bitwiseXOR(F.col(f"{b}{w}")))
        ham = term if ham is None else ham + term
    return ham


def embedding_near_dup_banded(
    emb: DataFrame,
    threshold: float,
    dim: int = EMB_DIM,
    k_planes: int = 8,
    n_tables: int = 10,
    seed: int = LSH_SEED,
    max_bucket: int = EMB_MAX_BUCKET,
    sig_bits: int | None = None,
) -> DataFrame:
    """Embedding near-dup via BANDED multi-table LSH: ``n_tables``
    independent sign-hash tables of ``k_planes`` planes each; a pair is
    a candidate when it collides in ANY table (OR-amplification), a
    signature-Hamming prefilter discards far candidates inside the
    band-join stage, then survivors are exact-cosine verified
    >= threshold.

    Measured against numpy brute-force ground truth at sf0.1 (2,055
    true pairs >= 0.8 over hashing-trick vectors), banding dominates
    probe balls on this correlated distribution: k=8 x T=10 finds 88%
    at 3.85M candidates where 12-plane/Hamming-2 probing found 79% at
    3.1M (and 8/H1 64% at 2.2M) — more independent coarse views beat a
    deeper ball around one fine view.

    The prefilter signature is DECOUPLED from the band bits:
    ``sig_bits`` (default 2 * k * T, prefix-extending the same seeded
    plane stream, so band codes are unchanged) exists because the band
    bits alone cannot discriminate — on this correlated corpus 80% of
    ALL pairs collide in >= 1 of 24 tables, and a 192-bit Hamming
    cutoff at the safe margin still keeps 36% of pairs (the mid-cosine
    mass sits ~2 sigma from the threshold band), while 384 bits at the
    same 4-sigma margin keeps 11% and 768 keeps 3.3% (0 of 2,055 true
    pairs lost at every width; see ``hamming_prefilter_cutoff``).
    2*k*T doubles the discrimination for +24 bytes of band-shuffle
    payload per exploded row — the knee of that curve.

    Plan: ONE Arrow pass computes all T codes per vector PLUS the
    packed ``sig_bits``-bit signature (the dots accumulate
    component-sequentially, bit-exactly matching the inlined-plane
    list_sum the DuckDB oracle runs); explode to (table, code);
    per-(table, code) cap; equality self-join carrying both sides'
    packed signatures (ceil(sig_bits/64) longs — 48 bytes at the
    default 8x24, vs 512 bytes of vector); the Hamming prefilter
    (bit_count over XORed words, pure codegen) runs IN THE SAME STAGE
    as the join, so most far-candidate rows die before ever reaching a
    shuffle — the DISTINCT dedups only surviving pairs, and the
    id-keyed embedding joins + Arrow cosine verify run at a fraction
    of the candidate volume. Candidates never come from a cross join,
    and the id-keyed verify joins reuse the corpus partitioning at
    scale.
    """
    band_bits = k_planes * n_tables
    n_bits = max(band_bits, sig_bits or 2 * band_bits)
    n_words = (n_bits + 63) // 64
    ham_max = hamming_prefilter_cutoff(threshold, n_bits)

    coded = banded_sig_codes(
        emb, dim=dim, k_planes=k_planes, n_tables=n_tables, seed=seed,
        sig_bits=n_bits,
    ).localCheckpoint(eager=False)
    # the signature rides the band join as FLAT word columns (s0..s5),
    # not an array: millions of candidate rows each skip an ArrayData
    # allocation per side (~15% off the join chain at sf0.1)
    tabled = coded.select(
        "vec_id",
        *[F.col("sig").getItem(w).alias(f"s{w}") for w in range(n_words)],
        F.posexplode("cs").alias("t", "code"),
    )
    counts = tabled.groupBy("t", "code").agg(F.count("*").alias("_n"))
    b = (
        tabled.join(counts, ["t", "code"])
        .filter(F.col("_n") <= max_bucket)
        .drop("_n")
        # referenced by BOTH self-join sides — without the checkpoint the
        # posexplode + bucket-count subtree ran twice (plan-visible as
        # two Generate+HashAggregate branches in the r8 before-plan)
        .localCheckpoint(eager=False)
    )
    ham = _sig_hamming_flat(n_words)
    pairs = (
        b.select(
            F.col("vec_id").alias("vec_a"),
            *[F.col(f"s{w}").alias(f"a{w}") for w in range(n_words)],
            "t", "code",
        )
        .join(
            b.select(
                F.col("vec_id").alias("vec_b"),
                *[F.col(f"s{w}").alias(f"b{w}") for w in range(n_words)],
                "t", "code",
            ),
            ["t", "code"],
        )
        .filter(F.col("vec_a") < F.col("vec_b"))
        .filter(ham <= F.lit(ham_max))
        .select("vec_a", "vec_b")
        .distinct()
    )
    withvecs = pairs.join(
        coded.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a")),
        "vec_a",
    ).join(
        coded.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b")),
        "vec_b",
    )
    cos = _cosine_pairs(F.col("emb_a"), F.col("emb_b"))
    return (
        withvecs.select("vec_a", "vec_b", F.round(cos, 6).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def cross_emb_near_dup_matches(
    batch: DataFrame,
    existing: DataFrame,
    threshold: float,
    dim: int = EMB_DIM,
    k_planes: int = 8,
    n_tables: int = 10,
    seed: int = LSH_SEED,
    max_bucket: int = EMB_MAX_BUCKET,
    sig_bits: int | None = None,
    existing_sigs: DataFrame | None = None,
) -> DataFrame:
    """Batch vectors that near-duplicate (cosine >= ``threshold``) an
    EXISTING corpus vector: the cross-corpus variant of
    :func:`embedding_near_dup_banded`, for incremental updates — the
    embedding-modality mirror of ``textops.cross_near_dup_matches`` /
    the ``_bands`` index. Returns distinct batch ``vec_id`` rows to
    drop.

    ``existing_sigs``: a persisted ``(vec_id, cs, sig)`` table (what
    :func:`banded_sig_codes` emits, minus the vector — the
    ``_emb_sigs`` artifact). When given, the existing corpus is NOT
    re-embedded or re-coded: its rows are touched only to fetch the
    exact vectors of verify CANDIDATES (a semi-joined point lookup),
    which is the difference between an update that scales with the
    BATCH and one that re-reads the world.

    Plan: batch side coded in one Arrow pass (batch-linear); existing
    band blocks capped per (table, code) like the self-join path
    (over-cap boilerplate buckets are the exact manifest's job — same
    contract as the text-LSH cross path); equality join on
    (t, code) carrying both packed signatures; the Hamming prefilter
    runs inside the join's codegen stage so far candidates never reach
    a shuffle; distinct (batch, existing) survivors fetch exact
    vectors (existing side SEMI-JOINED down to candidates first) for
    the Arrow cosine verify.
    """
    band_bits = k_planes * n_tables
    n_bits = max(band_bits, sig_bits or 2 * band_bits)
    n_words = (n_bits + 63) // 64
    ham_max = hamming_prefilter_cutoff(threshold, n_bits)

    bc = banded_sig_codes(
        batch, dim=dim, k_planes=k_planes, n_tables=n_tables, seed=seed,
        sig_bits=n_bits,
    ).localCheckpoint(eager=False)
    if existing_sigs is not None:
        ec = existing_sigs.select("vec_id", "cs", "sig")
    else:
        ec = banded_sig_codes(
            existing, dim=dim, k_planes=k_planes, n_tables=n_tables,
            seed=seed, sig_bits=n_bits,
        ).select("vec_id", "cs", "sig")
    # flat signature words on both band-join sides (same ArrayData-
    # allocation rationale as embedding_near_dup_banded)
    eb = ec.select(
        "vec_id",
        *[F.col("sig").getItem(w).alias(f"b{w}") for w in range(n_words)],
        F.posexplode("cs").alias("t", "code"),
    )
    counts = eb.groupBy("t", "code").agg(F.count("*").alias("_n"))
    eb = (
        eb.join(counts, ["t", "code"])
        .filter(F.col("_n") <= max_bucket)
        .drop("_n")
    )
    bb = bc.select(
        F.col("vec_id").alias("_batch_id"),
        *[F.col("sig").getItem(w).alias(f"a{w}") for w in range(n_words)],
        F.posexplode("cs").alias("t", "code"),
    )
    cand = (
        bb.join(
            eb.select(
                F.col("vec_id").alias("_existing_id"),
                *[F.col(f"b{w}") for w in range(n_words)],
                "t", "code",
            ),
            ["t", "code"],
        )
        .filter(_sig_hamming_flat(n_words) <= F.lit(ham_max))
        .select("_batch_id", "_existing_id")
        .distinct()
        # candidates feed the verify join AND the existing-side vector
        # pruning — checkpoint so the band join runs once
        .localCheckpoint(eager=False)
    )
    cand_ids = cand.select(F.col("_existing_id").alias("vec_id")).distinct()
    ev = existing.join(cand_ids, ["vec_id"], "left_semi").select(
        F.col("vec_id").alias("_existing_id"),
        F.col("embedding").alias("emb_b"),
    )
    bv = bc.select(
        F.col("vec_id").alias("_batch_id"),
        F.col("embedding").alias("emb_a"),
    )
    cos = _cosine_pairs(F.col("emb_a"), F.col("emb_b"))
    return (
        cand.join(bv, "_batch_id")
        .join(ev, "_existing_id")
        .filter(F.round(cos, 6) >= threshold)
        .select(F.col("_batch_id").alias("vec_id"))
        .distinct()
    )


EMB_NEAR_DUP_THRESHOLD = 0.4


def q_emb_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (Hamming-1 LSH candidates,
    cosine >= 0.4)."""
    return embedding_near_dup(
        _emb(spark, sf_dir), threshold=EMB_NEAR_DUP_THRESHOLD
    ).orderBy("vec_a", "vec_b")


def materialize_buckets(
    emb: DataFrame,
    path: str,
    dim: int = EMB_DIM,
    n_planes: int = N_PLANES,
    seed: int = LSH_SEED,
) -> None:
    """Write the embedding table partitioned by LSH bucket.

    At 100 TB this is the index build: one pass + one shuffle that
    CLUSTERS rows by bucket before the partitioned write — without it
    every task holds rows of every bucket and partitionBy sprays
    tasks × buckets small files (measured 3× slower even at sf0.1; at
    crawl scale it's millions of KB-files and a metadata explosion).
    Probe reads against the result hit only the probed bucket
    directories — partition pruning shows up as PartitionFilters in the
    scan plan, so a Hamming-1 probe reads (1+n_planes)/2^n_planes of
    the data.

    The repartition carries an EXPLICIT partition count (core count,
    scale-adaptive — defaultParallelism is executor cores on a real
    cluster): a bare ``repartition(col)`` is AQE-coalescible, and on a
    byte-small index AQE collapsed the exchange to ONE partition, so a
    single task wrote all 2^n_planes bucket files sequentially
    (measured 5.0 s vs 0.9 s for the same write at sf0.1). Each bucket
    still hashes to exactly one task, so the file count is unchanged —
    only the write parallelism is pinned."""
    n_tasks = max(emb.sparkSession.sparkContext.defaultParallelism, 1)
    bucketed = lsh_bucket(emb, dim=dim, n_planes=n_planes, seed=seed)
    bucketed.repartition(n_tasks, F.col("bucket")).write.mode(
        "overwrite"
    ).partitionBy("bucket").parquet(path)


def ann_materialized_topk(
    spark: SparkSession,
    index_path: str,
    query_vec: list[float],
    k: int = 5,
    n_planes: int = N_PLANES,
    seed: int = LSH_SEED,
    probe_hamming: int = 1,
    exclude_id: int | None = None,
) -> DataFrame:
    """Probe a ``materialize_buckets`` index — the 100 TB read path.

    The probe set is computed driver-side from the same inlined
    hyperplanes, so the read touches only the (1 + n_planes) probed
    bucket directories. Construction VERIFIES the pruning: it raises if
    the bucket predicate did not reach the scan as a PartitionFilter —
    a probe that silently full-scans the index is a broken index, not a
    slow query."""
    import io
    from contextlib import redirect_stdout

    probes = probe_buckets(query_bucket(query_vec, n_planes, seed), n_planes, probe_hamming)
    pruned = spark.read.parquet(index_path).filter(F.col("bucket").isin(probes))
    buf = io.StringIO()
    with redirect_stdout(buf):
        pruned.explain(True)
    seg = buf.getvalue().split("PartitionFilters: [", 1)
    if len(seg) != 2 or "bucket" not in seg[1][:300]:
        raise RuntimeError(
            "ann_materialized_topk: bucket probe did not partition-prune "
            f"the index scan at {index_path}"
        )
    return cosine_topk(pruned.drop("bucket"), query_vec, k=k, exclude_id=exclude_id)


# Scratch indexes created by q_ann_materialized_topk. Each call needs
# its OWN path (the returned DataFrame reads the index lazily, so a
# shared path would race — an overwrite could delete files a still-held
# result reads); for the same laziness reason nothing is evicted
# mid-process — everything is removed at interpreter exit.
_ann_scratch_paths: list[str] = []


def _ann_scratch_dir() -> str:
    import atexit
    import os
    import shutil
    import tempfile
    import uuid

    if not _ann_scratch_paths:  # first call in this process
        atexit.register(
            lambda: [
                shutil.rmtree(p, ignore_errors=True)
                for p in _ann_scratch_paths
            ]
        )
    path = os.path.join(
        tempfile.gettempdir(), f"readability_ann_index_{uuid.uuid4().hex}"
    )
    # Cleanup happens ONLY at process exit (atexit above): the returned
    # DataFrames read their index directory lazily, so an eager
    # oldest-first eviction (the old KEEP=4 cap) could delete a
    # still-held result's parquet out from under it mid-sweep. Each
    # scratch index is a few MB at checked-query scale — a session's
    # accumulation is bounded by the handful of materialized queries.
    _ann_scratch_paths.append(path)
    return path


def q_ann_materialized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe top-5 for the vec_id=0 query served from a
    materialized bucket-partitioned index (same result contract as
    ann_lsh_topk — the oracle is identical — but the read path is the
    partition-pruned probe, asserted at construction)."""
    emb = _emb(spark, sf_dir)
    qvec = _query_vec(emb, QUERY_VEC_ID)
    path = _ann_scratch_dir()
    materialize_buckets(emb, path)
    return ann_materialized_topk(
        spark, path, qvec, k=5, exclude_id=QUERY_VEC_ID
    )


# ---------------------------------------------------------------------------
# IVF: k-means coarse quantizer — the index of choice when neighbors are
# only moderately closer than the bulk (hyperplane LSH needs high cosine).
# ---------------------------------------------------------------------------


def train_ivf(
    sample: np.ndarray, n_cells: int = 16, seed: int = 42, iters: int = 10
) -> np.ndarray:
    """Deterministic k-means (Lloyd) on a driver-side sample.

    Index training is the one legitimate driver-side step of an ANN
    build: at 100 TB you train on a bounded sample
    (``df.sample(...).limit(50_000).collect()``), never the full table.
    Normalizes rows first so squared-L2 argmin == cosine argmax."""
    x = np.asarray(sample, dtype="float64")
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cents = x[rng.choice(len(x), n_cells, replace=False)].copy()
    for _ in range(iters):
        d = ((x[:, None, :] - cents[None]) ** 2).sum(-1)
        a = d.argmin(1)
        for j in range(n_cells):
            if (a == j).any():
                cents[j] = x[a == j].mean(0)
    return cents


def _as_matrix(series) -> np.ndarray:
    return np.array([np.asarray(v, dtype="float64") for v in series])


def ivf_assign(
    emb: DataFrame, centroids, emb_col: str = "embedding", out_col: str = "cell"
) -> DataFrame:
    """Tag each vector with its nearest-centroid IVF cell.

    Arrow-vectorized numpy (pandas_udf), not SQL array expressions:
    Spark's higher-order functions (transform/aggregate/zip_with) are
    interpreted, not codegen'd — a 16-centroid × 64-dim assignment via
    nested lambdas measured ~8 ms/row, vs microseconds for one batched
    ``U @ C.T`` matmul. Distance = squared L2 on the L2-normalized
    vector (== cosine order), computed as ``||c||² - 2·u·c`` (the
    ``||u||²=1`` term is argmin-invariant); ties resolve to the lowest
    cell id (numpy argmin first-match), matching the DuckDB oracle's
    ORDER BY (d, cid)."""
    from pyspark.sql.functions import pandas_udf

    cents = np.asarray(centroids, dtype="float64")
    half_sq = (cents * cents).sum(axis=1) / 2.0

    @pandas_udf("int")
    def _cell(v: pd.Series) -> pd.Series:
        x = _as_matrix(v)
        # eps clamp (the train_ivf/_seed_centroids guard): a zero-norm
        # row would otherwise go all-NaN and argmin would silently
        # return cell 0; clamped it deterministically lands in the
        # smallest-||c|| cell instead of propagating NaN
        u = x / np.maximum(
            np.linalg.norm(x, axis=1, keepdims=True), 1e-12
        )
        d = half_sq[None, :] - u @ cents.T
        return pd.Series(d.argmin(axis=1).astype("int32"))

    return emb.withColumn(out_col, _cell(F.col(emb_col)))


def ivf_probe_cells(
    queries: DataFrame,
    centroids,
    nprobe: int,
    vec_col: str = "query_vec",
    out_col: str = "cell",
) -> DataFrame:
    """Explode each query to its ``nprobe`` nearest cells (same batched
    numpy math as ivf_assign; stable argsort ties to the lowest cell)."""
    from pyspark.sql.functions import pandas_udf

    cents = np.asarray(centroids, dtype="float64")
    half_sq = (cents * cents).sum(axis=1) / 2.0

    @pandas_udf("array<int>")
    def _probes(v: pd.Series) -> pd.Series:
        x = _as_matrix(v)
        # same eps clamp as ivf_assign: no NaN propagation on a
        # zero-norm query
        u = x / np.maximum(
            np.linalg.norm(x, axis=1, keepdims=True), 1e-12
        )
        d = half_sq[None, :] - u @ cents.T
        order = np.argsort(d, axis=1, kind="stable")[:, :nprobe]
        return pd.Series([row.astype("int32").tolist() for row in order])

    return queries.withColumn("_cells", _probes(F.col(vec_col))).withColumn(
        out_col, F.explode("_cells")
    ).drop("_cells")


def ann_ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    centroids,
    k: int = 5,
    nprobe: int = 4,
) -> DataFrame:
    """Batch IVF ANN: each query probes its ``nprobe`` nearest cells.

    The query side sorts its (distance, cell) pairs JVM-side
    (array_sort on structs), explodes the first ``nprobe``, and joins
    the cell-assigned embedding table on cell — the same
    shuffle-by-partition-key shape as the LSH batch join, so at 100 TB
    a cell-partitioned table makes the probe read partition-pruned."""
    assigned = ivf_assign(emb, centroids)
    probes = ivf_probe_cells(
        queries.select("query_id", "query_vec"), centroids, nprobe
    )
    cos = _dot(F.col("embedding"), F.col("query_vec")) / (
        _norm(F.col("embedding")) * _norm(F.col("query_vec"))
    )
    from pyspark.sql import Window

    scored = (
        probes.join(assigned, "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", "label", F.round(cos, 6).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


# Oracle-checkable IVF variant: cells seeded by actual data points picked
# by a fixed rule (vec_id 100..115) instead of k-means iterations — a
# k-means|| style init both engines can express over the same table.
IVF_SEED_IDS = list(range(100, 116))
IVF_NPROBE = 4


def _seed_centroids(emb: DataFrame) -> list[list[float]]:
    # cell id is keyed by vec_id - min(IVF_SEED_IDS) — the same rule the
    # DuckDB oracle uses — so a missing seed row raises instead of
    # silently renumbering every cell after it (positional numbering
    # would desync Spark and oracle cell ids)
    lo, hi = min(IVF_SEED_IDS), max(IVF_SEED_IDS)
    if set(IVF_SEED_IDS) == set(range(lo, hi + 1)):
        # contiguous seed ids: a range predicate compiles in a fraction
        # of the 16-literal isin (measured 1.4 s vs 0.27 s cold) and
        # selects the identical rows
        pred = (F.col("vec_id") >= lo) & (F.col("vec_id") <= hi)
    else:
        pred = F.col("vec_id").isin(IVF_SEED_IDS)
    rows = (
        emb.filter(pred)
        .select("vec_id", "embedding")
        .collect()
    )
    found = {r[0] for r in rows}
    if found != set(IVF_SEED_IDS):
        missing = sorted(set(IVF_SEED_IDS) - found)
        raise ValueError(f"IVF seed vec_ids missing from table: {missing}")
    by_id = {r[0]: r[1] for r in rows}
    lo = min(IVF_SEED_IDS)
    cents = np.array(
        [[float(x) for x in by_id[lo + c]] for c in range(len(IVF_SEED_IDS))],
        dtype="float64",
    )
    cents = cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
    return [list(c) for c in cents]


def materialize_ivf(
    emb: DataFrame,
    path: str,
    centroids,
) -> None:
    """Write an IVF index: the trained centroids plus the embedding
    table partitioned by cell — the amortized-build mirror of
    ``materialize_buckets`` for the IVF family.

    Two artifacts under ``path``: ``centroids`` (one row per cell — tiny,
    read driver-side at probe time so probes never retrain or re-collect
    seeds) and ``table`` (cell-partitioned embeddings, repartitioned by
    cell BEFORE the partitioned write for the same
    tasks×partitions-file-explosion reason as the LSH index). At 100 TB
    the assignment pass runs once; every probe after that reads only its
    ``nprobe`` cell directories."""
    spark = emb.sparkSession
    cents = [
        (int(i), [float(x) for x in c]) for i, c in enumerate(centroids)
    ]
    # build the (tiny) centroids frame through the Arrow/pandas path:
    # createDataFrame from a plain Python list takes the row-pickling
    # path with per-element type verification — measured 1.8 s cold /
    # 0.4 s warm for 16 rows vs 0.15 s via pandas (the build's single
    # biggest line before this change)
    cent_pdf = pd.DataFrame(
        {"cell": [c for c, _ in cents], "centroid": [v for _, v in cents]}
    )
    spark.createDataFrame(
        cent_pdf, "cell int, centroid array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")
    assigned = ivf_assign(emb, [c for _, c in cents])
    # explicit partition count for the same AQE-coalesce reason as
    # materialize_buckets (a 1-task partitioned write serializes)
    n_tasks = max(spark.sparkContext.defaultParallelism, 1)
    assigned.repartition(n_tasks, F.col("cell")).write.mode(
        "overwrite"
    ).partitionBy("cell").parquet(f"{path}/table")


def ann_ivf_materialized_topk(
    spark: SparkSession,
    index_path: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 4,
) -> DataFrame:
    """Probe a ``materialize_ivf`` index — the amortized IVF read path.

    Centroids load driver-side (n_cells rows, bounded by construction);
    each query's ``nprobe`` nearest cells are computed with the same
    batched numpy math as the inline path, and the index read is
    restricted to the union of probed cells. Construction VERIFIES the
    partition pruning exactly like ``ann_materialized_topk``: a probe
    that full-scans the index raises. Result contract matches
    ``ann_ivf_topk`` (same scoring, same tie order).
    """
    import io
    from contextlib import redirect_stdout

    cent_rows = spark.read.parquet(f"{index_path}/centroids").collect()
    cents = [r.centroid for r in sorted(cent_rows, key=lambda r: r.cell)]
    probes = ivf_probe_cells(
        queries.select("query_id", "query_vec"), cents, nprobe
    # referenced twice (the cell-set collect below AND the scored
    # join) — checkpoint so the query-side Arrow UDF and any upstream
    # derivation run once (plans are trees)
    ).localCheckpoint(eager=False)
    # the probed-cell set is <= n_cells (bounded by the index, not the
    # data) — collecting it drives the partition-pruned read
    cell_set = sorted(
        {r.cell for r in probes.select("cell").distinct().collect()}
    )
    pruned = spark.read.parquet(f"{index_path}/table").filter(
        F.col("cell").isin([int(c) for c in cell_set])
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        pruned.explain(True)
    seg = buf.getvalue().split("PartitionFilters: [", 1)
    if len(seg) != 2 or "cell" not in seg[1][:300]:
        raise RuntimeError(
            "ann_ivf_materialized_topk: cell probe did not partition-prune "
            f"the index scan at {index_path}"
        )
    cos = _dot(F.col("embedding"), F.col("query_vec")) / (
        _norm(F.col("embedding")) * _norm(F.col("query_vec"))
    )
    from pyspark.sql import Window

    scored = (
        probes.join(pruned, "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", "vec_id", "label", F.round(cos, 6).alias("cosine")
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def q_ann_ivf_materialized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch IVF top-3 (nprobe=4, seeded cells) served from a
    materialized cell-partitioned index — same result contract (and the
    same oracle) as ann_ivf_topk, but the read path is the
    partition-pruned probe, asserted at construction."""
    emb = _emb(spark, sf_dir)
    cents = _seed_centroids(emb)
    path = _ann_scratch_dir()
    materialize_ivf(emb, path, cents)
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    return ann_ivf_materialized_topk(
        spark, path, queries, k=3, nprobe=IVF_NPROBE
    ).orderBy("query_id", F.col("cosine").desc(), "vec_id")


def q_ann_ivf_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF cell assignment with data-seeded centroids (index stats)."""
    emb = _emb(spark, sf_dir)
    cents = _seed_centroids(emb)
    return (
        ivf_assign(emb, cents)
        .groupBy("cell")
        .agg(F.count("*").alias("n_vecs"))
        .orderBy("cell")
    )


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch IVF top-3 (nprobe=4) for queries vec_id < 8, seeded cells."""
    emb = _emb(spark, sf_dir)
    cents = _seed_centroids(emb)
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    return ann_ivf_topk(emb, queries, cents, k=3, nprobe=IVF_NPROBE).orderBy(
        "query_id", F.col("cosine").desc(), "vec_id"
    )


# ---------------------------------------------------------------------------
# SemDeDup: semantic deduplication inside k-means cells
# ---------------------------------------------------------------------------

SEM_DEDUP_THRESHOLD = 0.4  # binds on the weakly-clustered sf embeddings
# At 100 TB the cell population is controlled by n_cells (SemDeDup uses
# n_cells ~ N / target_cell_size, e.g. 110k cells for 100M docs), so the
# within-cell O(c^2) verify stays bounded by construction; the cap below
# is the backstop for a degenerate cell (10^6 near-identical embeddings
# behind one centroid), whose members fall back to the linear exact-dup
# manifest exactly like over-cap LSH buckets.
SEM_MAX_CELL = 2000


def _centroid_dist(emb_col, cell_col, centroids) -> "F.Column":
    """Squared L2 distance from each L2-normalized vector to its own
    cell centroid, accumulated one component at a time in index order —
    the exact left-to-right sum DuckDB's ``list_sum(list_transform(...))``
    performs — so a 6-digit rounding of the result agrees across
    engines (same rationale as _cosine_pairs)."""
    from pyspark.sql.functions import pandas_udf

    cents = np.asarray(centroids, dtype="float64")

    @pandas_udf("double")
    def _dist(v: pd.Series, cell: pd.Series) -> pd.Series:
        if not len(v):
            return pd.Series([], dtype="float64")
        x = np.stack(v.values).astype("float64", copy=False)
        n = np.zeros(len(x))
        for j in range(x.shape[1]):
            n = n + x[:, j] * x[:, j]
        # eps clamp: zero-norm rows get a finite (large) distance
        # instead of NaN, which Spark would sort above every real value
        u = x / np.maximum(np.sqrt(n), 1e-12)[:, None]
        c = cents[cell.to_numpy()]
        d = np.zeros(len(x))
        for j in range(x.shape[1]):
            d = d + (u[:, j] - c[:, j]) * (u[:, j] - c[:, j])
        return pd.Series(d)

    return _dist(F.col(emb_col), F.col(cell_col))


def semantic_dedup(
    emb: DataFrame,
    centroids,
    threshold: float = SEM_DEDUP_THRESHOLD,
    max_cell: int = SEM_MAX_CELL,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication by k-means clustering + within-cell pairwise cosine.

    1. assign every vector to its nearest centroid cell (``ivf_assign``
       — one Arrow matmul pass, no shuffle);
    2. within each cell, exact pairwise cosine >= ``threshold`` marks
       duplicate pairs — the self-join is an equality join on ``cell``,
       never a cross join, and cells larger than ``max_cell`` are
       dropped (their members resolve via the exact-dup path);
    3. duplicate pairs resolve to connected components (the bounded
       label-propagation operator dedup shares);
    4. per component, the member FARTHEST from its cell centroid is
       kept (the paper keeps the example with lowest similarity to the
       centroid — the most "informative" of the semantic family), ties
       to the lowest id. The argmax is one hash aggregation
       (``min(struct(-d, id))``, map-side partial agg) — never a
       window, so a 10^6-member cluster cannot land in one task.

    Returns (vec_id, cluster_id, keep) for EVERY input vector;
    singletons keep themselves. The per-row distance is rounded to 6
    digits before the argmax so both engines rank identically.

    Scale: one cell-keyed exchange for the pair join + the tiny
    component/keeper aggregations; candidate volume is sum_c c^2 over
    cell sizes, which n_cells controls (see SEM_MAX_CELL note).
    """
    from readability_ex_spark.operators.clusters import near_dup_clusters

    assigned = ivf_assign(
        emb.select(F.col(id_col).alias("vec_id"), F.col(emb_col).alias("embedding")),
        centroids,
    ).localCheckpoint(eager=False)  # read by counts, both join sides, dist
    counts = assigned.groupBy("cell").agg(F.count("*").alias("_n"))
    b = assigned.join(counts, "cell").filter(F.col("_n") <= max_cell).drop("_n")
    a_side = b.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a"), "cell"
    )
    b_side = b.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b"), "cell"
    )
    cos = _cosine_pairs(F.col("emb_a"), F.col("emb_b"))
    pairs = (
        a_side.join(b_side, "cell")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", F.round(cos, 6).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )
    comp = near_dup_clusters(pairs, "vec_a", "vec_b").select(
        F.col("id").alias("vec_id"), F.col("cluster_id").alias("_cid")
    )
    dist = assigned.withColumn(
        "d", F.round(_centroid_dist("embedding", "cell", centroids), 6)
    )
    members = (
        dist.join(comp, "vec_id", "left")
        .withColumn("cluster_id", F.coalesce(F.col("_cid"), F.col("vec_id")))
        .select("vec_id", "cluster_id", "d")
        # referenced twice (keeper argmax + output join): without the
        # checkpoint the _centroid_dist Arrow pass and the comp join ran
        # once per reference (two ArrowEvalPython nodes in the r8
        # before-plan)
        .localCheckpoint(eager=False)
    )
    keeper = members.groupBy("cluster_id").agg(
        F.min(F.struct((-F.col("d")).alias("nd"), F.col("vec_id").alias("kid")))
        .alias("_k")
    ).select("cluster_id", F.col("_k.kid").alias("_keeper"))
    return (
        members.join(keeper, "cluster_id")
        .select(
            "vec_id",
            "cluster_id",
            (F.col("vec_id") == F.col("_keeper")).alias("keep"),
        )
    )


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup keep-manifest over the embeddings table (seeded cells)."""
    emb = _emb(spark, sf_dir)
    cents = _seed_centroids(emb)
    return semantic_dedup(emb, cents).orderBy("vec_id")
