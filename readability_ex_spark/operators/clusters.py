"""Near-dup cluster resolution: pair graph -> connected components ->
keep manifest.

All three near-dup families (MinHash-LSH, SimHash, embedding-cosine)
emit verified PAIRS; a training-data pipeline must turn A–B, B–C into
"keep one of {A, B, C}". Components of a near-dup graph are tiny
(boilerplate families of a handful of documents — anything bigger is an
exact-dup family that collapsed at linear cost before the LSH pass), so
bounded iterative min-label propagation with pointer jumping resolves
them in a fixed number of url-keyed hash joins — no graph framework, no
driver-side iteration over rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# propagate+jump covers components of diameter ~2^rounds; 10 rounds
# handles ~1000-deep chains (the sf corpora contain multi-hundred-doc
# sequential near-dup chains) at the cost of 2 tiny joins per round
CLUSTER_MAX_ROUNDS = 10


def near_dup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_rounds: int = CLUSTER_MAX_ROUNDS,
    strict: bool = True,
) -> DataFrame:
    """(id, cluster_id) for every id in ``pairs``; cluster_id = min id of
    the connected component (min over the natural column ordering —
    numeric ids cluster to the smallest id, url ids to the
    lexicographically first url).

    Each round is two url-keyed hash joins: (1) label <- min(label,
    min neighbor label), (2) pointer jump (label <- label(label)), so
    ``max_rounds`` rounds cover components of diameter ~2^max_rounds.
    Every round ends in an eager localCheckpoint: the label table is
    tiny (ids appearing in pairs only) and truncating the lineage keeps
    round r+1's plan from re-running rounds 1..r.

    ``strict=True`` (default) verifies the fixpoint (every edge's
    endpoints share a label) with a split-edge count every 2 rounds —
    converged graphs EXIT EARLY (typical near-dup graphs settle in 2-4
    rounds; the checks cut the sf0.1 run from 10 rounds to 4), and an
    unconverged graph at max_rounds raises rather than silently
    splitting a cluster and under-deduplicating without a trace. Pass
    strict=False to skip all checks and run the fixed round count.
    """
    # checkpoint EDGES, not just the symmetric view: the strict check and
    # every propagation round read it, and its lineage typically reaches
    # back through the whole near-dup pair derivation (LSH band join +
    # Jaccard verify) — uncheckpointed, each split-edge count re-ran it
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    sym = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    labels = (
        sym.select("src")
        .distinct()
        .select(F.col("src").alias("id"), F.col("src").alias("label"))
    )

    def _split_edges() -> int:
        la = labels.select(F.col("id").alias("src"), F.col("label").alias("la"))
        lb = labels.select(F.col("id").alias("dst"), F.col("label").alias("lb"))
        return (
            edges.join(la, "src")
            .join(lb, "dst")
            .filter(F.col("la") != F.col("lb"))
            .count()
        )

    for rnd in range(1, max_rounds + 1):
        # propagate as ONE union + min aggregation: each node's new
        # label is min(own, neighbors') — unioning the self-label rows
        # into the neighbor-message stream folds the old
        # join+agg+left-join+least chain (two id-keyed exchanges) into
        # a single grouped min, same values by the min identity (every
        # id keeps its own row, so nodes are never lost)
        nbr_msgs = sym.join(
            labels.select(
                F.col("id").alias("dst"), F.col("label").alias("nl")
            ),
            "dst",
        ).select(F.col("src").alias("id"), "nl")
        labels = (
            nbr_msgs.union(labels.select("id", F.col("label").alias("nl")))
            .groupBy("id")
            .agg(F.min("nl").alias("label"))
        )
        # pointer jump: label <- label(label) compresses chains so the
        # round count covers exponentially deeper components
        jump = labels.select(
            F.col("id").alias("label"), F.col("label").alias("l2")
        )
        labels = labels.join(jump, "label", "left").select(
            "id", F.coalesce("l2", "label").alias("label")
        )
        # lineage must be cut EVERY round (labels is referenced 3x per
        # round — uncut, the tree re-derives exponentially), but an
        # EAGER cut is a driver job each; only the rounds that also run
        # the split-edge check pay one. Odd rounds cut lazily — the
        # checkpoint materializes (and caches) inside the next eager
        # round's job, so the job count halves with identical labels.
        eager = rnd % 2 == 0 or rnd == max_rounds
        labels = labels.localCheckpoint(eager=eager)
        if strict and (rnd % 2 == 0 or rnd == max_rounds):
            split = _split_edges()
            if split == 0:
                break
            if rnd == max_rounds:
                raise RuntimeError(
                    f"near_dup_clusters: {split} edges unconverged after "
                    f"{max_rounds} rounds — raise max_rounds"
                )
    return labels.select("id", F.col("label").alias("cluster_id"))


def q_dedup_manifest(spark, sf_dir: str) -> DataFrame:
    """The FULL dedup decision over the documents table — literally
    ``corpus.dedup_keep_manifest`` (the operator the page pipeline runs)
    keyed by doc_id: exact md5 groups collapse first (min id survives;
    over-cap boilerplate buckets reduce to one survivor here), verified
    near-dup pairs among the exact survivors resolve into connected
    components, and the canonical composes both stages.
    (doc_id, canonical_id, keep)."""
    from readability_ex_spark.operators.corpus import dedup_keep_manifest
    from readability_ex_spark.operators.textops import MAX_BAND_BUCKET, _docs

    manifest = dedup_keep_manifest(
        _docs(spark, sf_dir),
        id_col="doc_id",
        canonical_col="canonical_id",
        # the oracle's shared LSH CTEs use the checked sandbox cap
        max_bucket=MAX_BAND_BUCKET,
    )
    return manifest.select("doc_id", "canonical_id", "keep").orderBy("doc_id")


def q_dedup_manifest_quality(spark, sf_dir: str) -> DataFrame:
    """The dedup manifest with the survivor re-picked by quality:
    clusters come from the SAME two-stage manifest as ``dedup_manifest``
    (exact md5 collapse, then capped-LSH near-dup components), but each
    cluster keeps its argmax-quality member (ties -> min doc_id) instead
    of blindly keeping the min doc_id — the FineWeb-style rule where the
    cleanest extraction survives, not the lexically-smallest url.
    (doc_id, canonical_id, kept_id, keep, quality_score)."""
    from readability_ex_spark.operators.corpus import (
        dedup_keep_manifest,
        dedup_quality_keeper,
    )
    from readability_ex_spark.operators.textops import (
        MAX_BAND_BUCKET,
        _docs,
        q_quality_score,
    )

    manifest = dedup_keep_manifest(
        _docs(spark, sf_dir),
        id_col="doc_id",
        canonical_col="canonical_id",
        max_bucket=MAX_BAND_BUCKET,
    )
    scores = q_quality_score(spark, sf_dir).select("doc_id", "quality_score")
    out = dedup_quality_keeper(
        manifest,
        scores,
        id_col="doc_id",
        canonical_col="canonical_id",
        score_col="quality_score",
    )
    return out.select(
        "doc_id", "canonical_id", "kept_id", "keep", "quality_score"
    ).orderBy("doc_id")


def q_emb_near_dup_clusters(spark, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (Hamming-1 LSH candidates,
    cosine >= 0.4) resolved into connected components — the same
    clustering operator generalizes across all three near-dup families.
    (vec_id, cluster_id, is_canonical)."""
    from readability_ex_spark.operators.similarity import (
        EMB_NEAR_DUP_THRESHOLD,
        _emb,
        embedding_near_dup,
    )

    pairs = embedding_near_dup(
        _emb(spark, sf_dir), threshold=EMB_NEAR_DUP_THRESHOLD
    )
    clusters = near_dup_clusters(pairs, "vec_a", "vec_b")
    return (
        clusters.select(
            F.col("id").alias("vec_id"),
            "cluster_id",
            (F.col("id") == F.col("cluster_id")).alias("is_canonical"),
        )
        .orderBy("vec_id")
    )


def q_near_dup_clusters(spark, sf_dir: str) -> DataFrame:
    """Near-dup pairs (capped b×r LSH, Jaccard >= 0.8) resolved into
    connected-component clusters: (doc_id, cluster_id, is_canonical)."""
    from readability_ex_spark.operators.textops import (
        _docs,
        near_dup_verified_pairs,
    )

    pairs = near_dup_verified_pairs(_docs(spark, sf_dir))
    clusters = near_dup_clusters(pairs)
    return (
        clusters.select(
            F.col("id").alias("doc_id"),
            "cluster_id",
            (F.col("id") == F.col("cluster_id")).alias("is_canonical"),
        )
        .orderBy("doc_id")
    )
