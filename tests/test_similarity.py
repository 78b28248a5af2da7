"""ANN operators: brute-force exactness and LSH-bucket recall shape."""

from __future__ import annotations

import pyspark.sql.functions as F

from readability_ex_spark.operators.similarity import (
    ann_lsh_topk,
    cosine_topk,
    lsh_bucket,
)

SF = "/root/testdata/sf0.001"


def test_bruteforce_topk_self_similarity(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = [float(x) for x in emb.filter(F.col("vec_id") == 7).head()["embedding"]]
    top = cosine_topk(emb, q, k=1).head()
    assert top.vec_id == 7 and abs(top.cosine - 1.0) < 1e-6


def test_lsh_buckets_partition_all_vectors(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    b = lsh_bucket(emb)
    assert b.count() == emb.count()
    assert b.select("bucket").distinct().count() > 1


def test_lsh_topk_subset_of_bucket(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]]
    rows = ann_lsh_topk(emb, q, k=5).collect()
    assert 0 < len(rows) <= 5
    # the query itself lives in its own bucket -> rank 1 with cosine 1
    assert rows[0].vec_id == 0 and abs(rows[0].cosine - 1.0) < 1e-6
