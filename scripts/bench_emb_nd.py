"""Head-to-head: banded multi-table LSH vs SemDeDup-style k-means cells
as the embedding near-dup PAIR FINDER, against numpy brute-force ground
truth (all text-embedding pairs with cosine >= threshold at the given
sf dir).

Decides the composed near-dup-by-embedding default by measurement
(round-7 verdict #4): for each variant we report candidate volume,
verified-pair recall vs ground truth, and wall time through Spark.

Usage: python scripts/bench_emb_nd.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from readability_ex_spark.operators.embedding import (
        TEXT_EMB_DIM,
        TEXT_EMB_ND_THRESHOLD,
        nonzero_embeddings,
        text_embedding,
    )
    from readability_ex_spark.operators.similarity import (
        _cosine_pairs,
        embedding_near_dup_banded,
        ivf_assign,
        train_ivf,
    )
    from readability_ex_spark.operators.textops import _docs
    from readability_ex_spark.session import get_spark

    spark = get_spark("bench-emb-nd")
    thr = TEXT_EMB_ND_THRESHOLD

    emb = nonzero_embeddings(text_embedding(_docs(spark, sf_dir))).select(
        F.col("doc_id").alias("vec_id"), "embedding"
    )
    emb = emb.localCheckpoint(eager=True)

    # ---- ground truth: brute-force numpy over the collected vectors
    # (bounded: the bench sf dirs are <= 50k docs; this script is the
    # measurement harness, not a production operator)
    rows = emb.collect()
    ids = np.array([r.vec_id for r in rows])
    M = np.array([r.embedding for r in rows], dtype=np.float64)
    # vectors are already L2-normalized by text_embedding
    sims = M @ M.T
    iu = np.triu_indices(len(ids), k=1)
    # operator semantics: round(cosine, 6) >= thr
    mask = np.round(sims[iu], 6) >= thr
    truth = {
        (int(min(a, b)), int(max(a, b)))
        for a, b in zip(ids[iu[0]][mask], ids[iu[1]][mask])
    }
    print(f"ground truth: {len(truth)} pairs >= {thr} over {len(ids)} vecs")

    results = []

    def run(name, df_pairs, n_candidates=None):
        t0 = time.time()
        got = {
            (int(min(r.vec_a, r.vec_b)), int(max(r.vec_a, r.vec_b)))
            for r in df_pairs.collect()
        }
        wall = time.time() - t0
        tp = len(got & truth)
        rec = tp / len(truth) if truth else 1.0
        false = len(got - truth)
        row = {
            "variant": name,
            "pairs": len(got),
            "recall": round(rec, 4),
            "false_pos": false,
            "wall_sec": round(wall, 2),
        }
        if n_candidates is not None:
            row["candidates"] = n_candidates
        results.append(row)
        print(json.dumps(row))

    # ---- banded LSH at several table counts (k=8 fixed)
    for n_tables in (10, 16, 24, 32):
        pairs = embedding_near_dup_banded(
            emb, threshold=thr, dim=TEXT_EMB_DIM, k_planes=8,
            n_tables=n_tables,
        )
        run(f"banded k=8 T={n_tables}", pairs)

    # ---- SemDeDup-style cells: k-means cells + within-cell verify.
    # Recall ceiling = pairs that share a cell; pairs straddling a cell
    # boundary are invisible by construction.
    sample = M  # full table IS the bounded sample at bench scale
    for n_cells in (16, 64):
        cents = train_ivf(sample, n_cells=n_cells, seed=42, iters=10)
        assigned = ivf_assign(emb, cents).localCheckpoint(eager=True)
        a = assigned.select(
            F.col("vec_id").alias("vec_a"),
            F.col("embedding").alias("emb_a"),
            "cell",
        )
        b = assigned.select(
            F.col("vec_id").alias("vec_b"),
            F.col("embedding").alias("emb_b"),
            "cell",
        )
        cos = _cosine_pairs(F.col("emb_a"), F.col("emb_b"))
        pairs = (
            a.join(b, "cell")
            .filter(F.col("vec_a") < F.col("vec_b"))
            .select("vec_a", "vec_b", F.round(cos, 6).alias("cosine"))
            .filter(F.col("cosine") >= thr)
        )
        run(f"semdedup cells={n_cells}", pairs)

    print(json.dumps({"summary": results}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
