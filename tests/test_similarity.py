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


def _planted_df(spark, n_base=100, dim=64, noise=0.02, seed=7):
    """n_base random unit vectors + one near-duplicate each (cosine
    ~0.99) — the workload shape of dedup-against-index retrieval."""
    import numpy as np

    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n_base, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    dup = base + noise * rng.standard_normal((n_base, dim))
    dup /= np.linalg.norm(dup, axis=1, keepdims=True)
    rows = []
    for i in range(n_base):
        rows.append((i, [float(x) for x in base[i]], 0))
        rows.append((i + n_base, [float(x) for x in dup[i]], 1))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ), n_base


def test_multiprobe_lsh_recall_on_planted_neardups(spark):
    from readability_ex_spark.operators.similarity import ann_batch_lsh_topk

    emb, n_base = _planted_df(spark)
    queries = emb.filter(F.col("vec_id") >= n_base).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    got = ann_batch_lsh_topk(emb, queries, k=1, probe_hamming=1).collect()
    hits = sum(1 for r in got if r.vec_id == r.query_id - n_base)
    # near-dup partner (cosine ~0.99) retrieved for >=90% of queries
    assert hits / n_base >= 0.9


def test_ivf_recall_on_planted_neardups(spark):
    import numpy as np

    from readability_ex_spark.operators.similarity import ann_ivf_topk, train_ivf

    emb, n_base = _planted_df(spark)
    sample = np.array(
        [r.embedding for r in emb.orderBy("vec_id").collect()], dtype="float64"
    )
    cents = train_ivf(sample, n_cells=16)
    queries = emb.filter(F.col("vec_id") >= n_base).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    got = ann_ivf_topk(emb, queries, cents, k=1, nprobe=4).collect()
    hits = sum(1 for r in got if r.vec_id == r.query_id - n_base)
    assert hits / n_base >= 0.95


def test_ivf_beats_random_pruning_on_sf01(spark):
    """On the weakly-clustered sf0.1 embeddings (top-5 neighbor cosine
    ~0.37 — near-random data) no sublinear index reaches high recall;
    the scale claim is that IVF probing beats random pruning of the same
    candidate volume. nprobe/cells = 4/16 scans ~25% of the table and
    must recover well over 25% of the true top-5."""
    import numpy as np

    from readability_ex_spark.operators.similarity import ann_ivf_topk, train_ivf

    emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    X = np.array(
        [r.embedding for r in emb.orderBy("vec_id").collect()], dtype="float64"
    )
    cents = train_ivf(X, n_cells=16)
    n_queries = 50
    queries = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    got = ann_ivf_topk(emb, queries, cents, k=5, nprobe=4).collect()

    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    S = Xn @ Xn.T
    np.fill_diagonal(S, -2)
    hits = 0
    for q in range(n_queries):
        true = set(np.argsort(S[q])[-5:])
        found = {r.vec_id for r in got if r.query_id == q}
        hits += len(true & found)
    recall = hits / (5 * n_queries)
    assert recall >= 0.5  # measured 0.58 at ~25% scanned: >2x random


def test_materialized_buckets_partition_pruned(spark, tmp_path):
    import io
    from contextlib import redirect_stdout

    from readability_ex_spark.operators.similarity import (
        materialize_buckets,
        probe_buckets,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    path = str(tmp_path / "emb_by_bucket")
    materialize_buckets(emb, path)
    table = spark.read.parquet(path)
    probes = probe_buckets(37, 8, probe_hamming=1)
    pruned = table.filter(F.col("bucket").isin(probes))
    buf = io.StringIO()
    with redirect_stdout(buf):
        pruned.explain(True)
    plan = buf.getvalue()
    seg = plan.split("PartitionFilters: [", 1)
    # the bucket predicate must reach the scan as a partition filter
    assert len(seg) == 2 and "bucket" in seg[1][:300]
    assert pruned.count() == emb.count() - table.filter(
        ~F.col("bucket").isin(probes)
    ).count()


def test_materialized_index_16_planes_prunes_finer(spark, tmp_path):
    """The documented crawl-scale config (n_planes=16-24, N_PLANES
    docstring) materializes and probes correctly: a Hamming-1 probe of a
    16-plane index prunes to 17 of 65,536 partitions. The sandbox
    default stays 8 planes because 500 vectors over 65k buckets leaves
    ~every bucket a singleton (index still correct, recall pointless)."""
    from readability_ex_spark.operators.similarity import (
        ann_materialized_topk,
        materialize_buckets,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    path = str(tmp_path / "idx16")
    materialize_buckets(emb, path, n_planes=16)
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]]
    got = ann_materialized_topk(  # raises unless the scan partition-prunes
        spark, path, qvec, k=5, n_planes=16, exclude_id=0
    )
    assert got.count() <= 5


def test_ann_materialized_topk_matches_inflight(spark, tmp_path):
    from readability_ex_spark.operators.similarity import (
        ann_lsh_topk,
        ann_materialized_topk,
        materialize_buckets,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]]
    path = str(tmp_path / "ann_index")
    materialize_buckets(emb, path)
    mat = ann_materialized_topk(spark, path, qvec, k=5, exclude_id=0).collect()
    inflight = ann_lsh_topk(
        emb.filter(F.col("vec_id") != 0), qvec, k=5
    ).collect()
    assert [(r.vec_id, r.cosine) for r in mat] == [
        (r.vec_id, r.cosine) for r in inflight
    ]


def test_ann_ivf_materialized_matches_inline(spark, tmp_path):
    """The cell-partitioned IVF index returns EXACTLY the inline
    ann_ivf_topk results (same scoring, same tie order), and its probe
    partition-prunes (construction raises otherwise)."""
    from readability_ex_spark.operators.similarity import (
        IVF_NPROBE,
        _seed_centroids,
        ann_ivf_materialized_topk,
        ann_ivf_topk,
        materialize_ivf,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = _seed_centroids(emb)
    path = str(tmp_path / "ivf_index")
    materialize_ivf(emb, path, cents)
    queries = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    order = ["query_id", F.col("cosine").desc(), "vec_id"]
    mat = ann_ivf_materialized_topk(
        spark, path, queries, k=3, nprobe=IVF_NPROBE
    ).orderBy(*order).collect()
    inline = ann_ivf_topk(
        emb, queries, cents, k=3, nprobe=IVF_NPROBE
    ).orderBy(*order).collect()
    assert [(r.query_id, r.vec_id, r.cosine) for r in mat] == [
        (r.query_id, r.vec_id, r.cosine) for r in inline
    ]
    assert len(mat) == 4 * 3


def test_ann_ivf_materialized_reads_only_probed_cells(spark, tmp_path):
    """The probe's index scan filters to the probed cell set (<=
    n_queries * nprobe of 16 cells) — partition pruning, not a
    full-table read."""
    from readability_ex_spark.operators.similarity import (
        _seed_centroids,
        ann_ivf_materialized_topk,
        materialize_ivf,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    path = str(tmp_path / "ivf_index")
    materialize_ivf(emb, path, _seed_centroids(emb))
    one_query = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    out = ann_ivf_materialized_topk(spark, path, one_query, k=3, nprobe=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    segs = plan.split("PartitionFilters: [")[1:]
    assert any("cell" in s[:200] for s in segs), plan[:2000]
    assert out.count() == 3


def test_batch_topk_matches_single_query(spark):
    from readability_ex_spark.operators.similarity import (
        ann_batch_lsh_topk,
        ann_lsh_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 3).head()["embedding"]]
    single = ann_lsh_topk(
        emb.filter(F.col("vec_id") != 3), qvec, k=5, probe_hamming=1
    ).collect()
    queries = emb.filter(F.col("vec_id") == 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    batch = ann_batch_lsh_topk(emb, queries, k=5, probe_hamming=1).collect()
    assert [(r.vec_id, r.cosine) for r in single] == [
        (r.vec_id, r.cosine) for r in sorted(batch, key=lambda r: (-r.cosine, r.vec_id))
    ]


def test_embedding_near_dup_on_planted_pairs(spark):
    from readability_ex_spark.operators.similarity import embedding_near_dup

    emb, n_base = _planted_df(spark)
    pairs = {
        (r.vec_a, r.vec_b)
        for r in embedding_near_dup(emb, threshold=0.9).collect()
    }
    truth = {(i, i + n_base) for i in range(n_base)}
    # every emitted pair is a real planted duplicate (cosine >= 0.9 on
    # random unit vectors essentially never happens by chance)
    assert pairs <= truth
    # Hamming-1 multi-probe recovers >= 90% of the planted pairs
    assert len(pairs) / n_base >= 0.9


def test_lsh_bucket_rejects_dim_mismatch(spark):
    import pytest

    from readability_ex_spark.operators.similarity import lsh_bucket

    bad = spark.createDataFrame(
        [(1, [0.1] * 8)], "vec_id long, embedding array<float>"
    )
    with pytest.raises(Exception, match="expected 64-dim"):
        lsh_bucket(bad).collect()


def test_embedding_near_dup_bucket_cap(spark):
    from readability_ex_spark.operators.similarity import embedding_near_dup

    # 30 identical vectors: one degenerate bucket; cap drops them all
    rows = [(i, [1.0] + [0.0] * 63) for i in range(30)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    assert embedding_near_dup(emb, threshold=0.9, max_bucket=10).count() == 0
    assert (
        embedding_near_dup(emb, threshold=0.9, max_bucket=100).count()
        == 30 * 29 // 2
    )


# ---------------------------------------------------------------------------
# SemDeDup (semantic_dedup)
# ---------------------------------------------------------------------------


def _sem_df(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )


def test_semantic_dedup_keeps_farthest_from_centroid(spark):
    """Two near-identical members of a cell: the one FARTHER from the
    centroid is kept (the paper's rule); an orthogonal vector in the
    same cell stays a singleton."""
    import numpy as np

    from readability_ex_spark.operators.similarity import semantic_dedup

    e0 = np.zeros(64); e0[0] = 1.0
    e1 = np.zeros(64); e1[1] = 1.0
    b = 0.95 * e0 + 0.05 * e1  # same cell as a=e0, cosine(a,b) ~ 0.999
    rows = [(0, e0), (1, b), (2, e1)]
    out = {
        r.vec_id: r
        for r in semantic_dedup(
            _sem_df(spark, rows), [list(e0), list(e1)], threshold=0.9
        ).collect()
    }
    assert out[0].cluster_id == 0 and out[1].cluster_id == 0
    # vec 0 IS the centroid (d=0); vec 1 is farther -> keeper
    assert not out[0].keep and out[1].keep
    assert out[2].cluster_id == 2 and out[2].keep


def test_semantic_dedup_cell_cap_drops_pairs(spark):
    """Members of an over-cap cell produce no pairs (they fall back to
    the exact-dup path) — every vector keeps itself."""
    import numpy as np

    from readability_ex_spark.operators.similarity import semantic_dedup

    e0 = np.zeros(64); e0[0] = 1.0
    rows = [(i, e0 * (1.0 + 0.001 * i)) for i in range(5)]
    out = semantic_dedup(
        _sem_df(spark, rows), [list(e0)], threshold=0.5, max_cell=1
    ).collect()
    assert len(out) == 5 and all(r.keep for r in out)


def test_semantic_dedup_matches_naive(spark):
    """Fuzz vs a direct numpy re-derivation: cell assign, within-cell
    pairwise cosine, union-find closure, argmax-distance keeper."""
    import numpy as np

    from readability_ex_spark.operators.similarity import semantic_dedup

    rng = np.random.default_rng(11)
    n, dim, n_cells, th = 80, 16, 4, 0.8
    base = rng.normal(size=(n, dim))
    # plant near-dups: vectors 3i+1 are tiny perturbations of 3i
    for i in range(0, n - 1, 3):
        base[i + 1] = base[i] + 0.05 * rng.normal(size=dim)
    cents = rng.normal(size=(n_cells, dim))
    cents = cents / np.linalg.norm(cents, axis=1, keepdims=True)

    u = base / np.linalg.norm(base, axis=1, keepdims=True)
    cell = (((u[:, None, :] - cents[None]) ** 2).sum(-1)).argmin(1)
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in range(n):
        for j in range(i + 1, n):
            if cell[i] == cell[j] and round(float(u[i] @ u[j]), 6) >= th:
                parent[find(j)] = find(i)
    comp = {}
    for i in range(n):
        comp.setdefault(find(i), []).append(i)
    d = ((u - cents[cell]) ** 2).sum(1).round(6)
    expect = {}
    for members in comp.values():
        cid = min(members)
        keeper = min(members, key=lambda i: (-d[i], i))
        for i in members:
            expect[i] = (cid, i == keeper)

    out = semantic_dedup(
        _sem_df(spark, list(enumerate(base))), [list(c) for c in cents],
        threshold=th,
    ).collect()
    assert len(out) == n
    for r in out:
        assert (r.cluster_id, r.keep) == expect[r.vec_id], r


def test_hamming_prefilter_cutoff_values():
    """Cutoff math pinned: the known production point (0.8 threshold,
    384-bit signature -> 110), perfect-match degeneracy, full-range
    keep-all, and monotonicity (higher threshold -> tighter cutoff)."""
    from readability_ex_spark.operators.similarity import (
        hamming_prefilter_cutoff,
    )

    assert hamming_prefilter_cutoff(0.8, 384) == 110
    assert hamming_prefilter_cutoff(1.0, 192) == 0
    assert hamming_prefilter_cutoff(-1.0, 8) == 8  # keep everything
    cuts = [hamming_prefilter_cutoff(t / 10, 384) for t in range(-9, 10)]
    assert cuts == sorted(cuts, reverse=True)


def test_banded_near_dup_prefilter_is_lossless(spark, monkeypatch):
    """The signature-Hamming prefilter must not change the output: the
    same planted set run with the filter disabled (cutoff = all bits)
    yields the identical verified pair set."""
    from readability_ex_spark.operators import similarity as S

    emb, n_base = _planted_df(spark)
    vecs = emb.select("vec_id", "embedding")

    def pairs():
        return {
            (r.vec_a, r.vec_b, r.cosine)
            for r in S.embedding_near_dup_banded(
                vecs, threshold=0.9, k_planes=8, n_tables=24
            ).collect()
        }

    with_filter = pairs()
    monkeypatch.setattr(
        S, "hamming_prefilter_cutoff", lambda thr, b, margin=4.0: b
    )
    without = pairs()
    assert with_filter == without
    # and the pairs are real: planted partners only, >=90% recovered
    truth = {(i, i + n_base) for i in range(n_base)}
    got = {(a, b) for a, b, _ in with_filter}
    assert got <= truth and len(got) / n_base >= 0.9


def test_banded_sig_width_does_not_change_bands(spark):
    """sig_bits prefix-extends the plane stream: band codes (and thus
    the candidate set and verified output) are identical at 192- and
    384-bit signatures — only the prefilter's discrimination varies."""
    from readability_ex_spark.operators import similarity as S

    emb, _ = _planted_df(spark, n_base=50)
    vecs = emb.select("vec_id", "embedding")

    def pairs(sig_bits):
        return {
            (r.vec_a, r.vec_b, r.cosine)
            for r in S.embedding_near_dup_banded(
                vecs, threshold=0.9, k_planes=8, n_tables=24,
                sig_bits=sig_bits,
            ).collect()
        }

    assert pairs(192) == pairs(384)


def test_cross_emb_near_dup_drops_planted_batch_dups(spark):
    """Batch vectors near-duplicating an existing vector are dropped;
    unrelated batch vectors survive. The planted frame's base vectors
    (ids < n_base) play the existing corpus, their near-duplicates
    (ids >= n_base) the incoming batch, plus 20 fresh random vectors
    that duplicate nothing."""
    import numpy as np

    from readability_ex_spark.operators.similarity import (
        cross_emb_near_dup_matches,
    )

    emb, n_base = _planted_df(spark)
    existing = emb.filter(F.col("vec_id") < n_base).select(
        "vec_id", "embedding"
    )
    rng = np.random.default_rng(99)
    fresh = rng.standard_normal((20, 64))
    fresh /= np.linalg.norm(fresh, axis=1, keepdims=True)
    fresh_df = spark.createDataFrame(
        [(10_000 + i, [float(x) for x in fresh[i]]) for i in range(20)],
        "vec_id long, embedding array<float>",
    )
    batch = emb.filter(F.col("vec_id") >= n_base).select(
        "vec_id", "embedding"
    ).union(fresh_df)
    dropped = {
        r.vec_id
        for r in cross_emb_near_dup_matches(
            batch, existing, threshold=0.9, k_planes=8, n_tables=24
        ).collect()
    }
    # no false positive: random 64-dim unit vectors never reach 0.9
    assert not any(v >= 10_000 for v in dropped)
    # banded recall on the planted partners
    planted = {i + n_base for i in range(n_base)}
    assert dropped <= planted and len(dropped) / n_base >= 0.9


def test_cross_emb_near_dup_index_path_matches_and_codes_batch_only(
    spark, monkeypatch
):
    """With a persisted (vec_id, cs, sig) index the result is identical
    AND the existing side is never re-coded: the coding derivation runs
    once (the batch's), not twice. (Plan-string counting can't see
    this — both checkpoints cut the visible tree — so the invariant is
    pinned at the call level.)"""
    from readability_ex_spark.operators import similarity as S

    emb, n_base = _planted_df(spark, n_base=50)
    existing = emb.filter(F.col("vec_id") < n_base).select(
        "vec_id", "embedding"
    )
    batch = emb.filter(F.col("vec_id") >= n_base).select(
        "vec_id", "embedding"
    )
    sigs = S.banded_sig_codes(existing, k_planes=8, n_tables=24).select(
        "vec_id", "cs", "sig"
    ).localCheckpoint(eager=True)  # "persisted" index stand-in

    calls = []
    real = S.banded_sig_codes
    monkeypatch.setattr(
        S, "banded_sig_codes",
        lambda *a, **kw: calls.append(1) or real(*a, **kw),
    )
    direct = S.cross_emb_near_dup_matches(
        batch, existing, threshold=0.9, k_planes=8, n_tables=24
    )
    n_direct = len(calls)
    indexed = S.cross_emb_near_dup_matches(
        batch, existing, threshold=0.9, k_planes=8, n_tables=24,
        existing_sigs=sigs,
    )
    n_indexed = len(calls) - n_direct
    assert n_direct == 2 and n_indexed == 1
    assert {r.vec_id for r in direct.collect()} == {
        r.vec_id for r in indexed.collect()
    }
