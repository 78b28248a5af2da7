"""Connected-component resolution of near-dup pair graphs."""

from __future__ import annotations

import pytest

from readability_ex_spark.operators.clusters import near_dup_clusters


def test_components_resolve_to_min_id(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)],
        "id_a long, id_b long",
    )
    got = {(r.id, r.cluster_id) for r in near_dup_clusters(pairs).collect()}
    assert got == {
        (1, 1), (2, 1), (3, 1),
        (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20), (23, 20),
    }


def test_url_ids_cluster_to_lexicographic_min(spark):
    pairs = spark.createDataFrame(
        [("http://x/b", "http://x/a"), ("http://x/b", "http://x/c")],
        "id_a string, id_b string",
    )
    labels = {r.id: r.cluster_id for r in near_dup_clusters(pairs).collect()}
    assert labels == {
        "http://x/a": "http://x/a",
        "http://x/b": "http://x/a",
        "http://x/c": "http://x/a",
    }


def test_long_chain_converges_within_default_rounds(spark):
    # a 60-deep chain needs pointer jumping (plain propagation would
    # take 60 rounds); the default 10 propagate+jump rounds cover it
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(60)], "id_a long, id_b long"
    )
    labels = near_dup_clusters(pairs)
    assert {r.cluster_id for r in labels.collect()} == {0}


def test_strict_raises_on_unconverged(spark):
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(60)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="unconverged"):
        near_dup_clusters(pairs, max_rounds=1)
