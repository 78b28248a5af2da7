"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k with JVM-side array expressions
(`F.zip_with` dot product + `F.aggregate` sum) — no Python in the hot
path. Scale path: LSH bucketing by random-hyperplane sign bits (SimHash
for vectors), so at 100 TB the candidate set per query is one bucket
join, not a full scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

QUERY_VEC_ID = 0  # deterministic query point for the checked top-k


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


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
    qrow = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select("embedding").head()
    qvec = [float(x) for x in qrow[0]]
    return cosine_topk(emb, qvec, k=5, exclude_id=QUERY_VEC_ID)


def q_knn_label_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise same-label cosine >= 0.2 (blocked similarity join).

    Blocking key = label (stand-in for an IVF cell / LSH bucket): within
    each block the exact cosine runs JVM-side; across blocks nothing is
    compared — the quadratic term is bounded by the largest block.
    """
    emb = _emb(spark, sf_dir)
    a = emb.select(
        F.col("label"),
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("emb_a"),
    )
    b = emb.select(
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


def lsh_bucket(emb: DataFrame, n_planes: int = 8, seed: int = 42) -> DataFrame:
    """Random-hyperplane LSH bucket id per vector (scale path for ANN).

    Hyperplanes are generated deterministically on the driver (numpy,
    seeded) and inlined as literal arrays; the sign-bit bucket id is
    computed fully JVM-side. At 100 TB: groupBy(bucket) colocates
    candidates; query vectors hash to the same buckets.
    """
    import numpy as np

    rng = np.random.default_rng(seed)
    dim = len(emb.select("embedding").head()[0])
    planes = rng.standard_normal((n_planes, dim))
    bucket = F.lit(0).cast("long")
    for i in range(n_planes):
        p = F.array(*[F.lit(float(x)) for x in planes[i]])
        bit = F.when(_dot(F.col("embedding"), p) >= 0, F.lit(1)).otherwise(F.lit(0))
        bucket = bucket * 2 + bit
    return emb.withColumn("bucket", bucket)


def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN: bucket stats (rows-only check — bucket ids depend
    on driver-generated hyperplanes, not SQL-expressible)."""
    emb = _emb(spark, sf_dir)
    return (
        lsh_bucket(emb)
        .groupBy("bucket")
        .agg(F.count("*").alias("n_vecs"))
        .orderBy("bucket")
    )


def ann_lsh_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 5,
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Scale-path ANN: exact cosine ranking restricted to the query's LSH
    bucket. The bucket id prunes the scan (at 100 TB: one partition-
    pruned bucket read instead of a full sweep); recall can be raised by
    probing neighboring buckets (Hamming-1 on the sign bits)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    dim = len(query_vec)
    planes = rng.standard_normal((n_planes, dim))
    q = np.asarray(query_vec, dtype="float64")
    qbucket = 0
    for i in range(n_planes):
        qbucket = qbucket * 2 + (1 if float(planes[i] @ q) >= 0 else 0)
    bucketed = lsh_bucket(emb, n_planes=n_planes, seed=seed)
    return cosine_topk(
        bucketed.filter(F.col("bucket") == qbucket).drop("bucket"),
        query_vec,
        k=k,
    )


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket-restricted top-5 for the vec_id=0 query (rows-only check)."""
    emb = _emb(spark, sf_dir)
    qrow = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select("embedding").head()
    qvec = [float(x) for x in qrow[0]]
    return ann_lsh_topk(
        emb.filter(F.col("vec_id") != QUERY_VEC_ID), qvec, k=5
    )
