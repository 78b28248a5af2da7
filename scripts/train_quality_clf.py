"""Train a document-quality classifier from a labeled table and persist it.

Input: any parquet table with a text column and a boolean label column
(your labeled sample — e.g. human judgments, or distilled from a
stronger model).  Training is driver-side and bounded
(``qualityclf.train_quality_classifier``); the persisted model is the
small (bucket, weight) parquet ``prepare_corpus.py --clf-model``
consumes.

    spark-submit scripts/train_quality_clf.py \
        --input labeled.parquet --label-col is_good \
        --output models/quality_clf

Prints the model's accuracy back on the full labeled table (scored
with the SAME distributed plan the corpus build uses), so a bad label
column or a non-separable sample is visible before anyone filters
100 TB with it.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="labeled parquet table")
    ap.add_argument("--output", required=True, help="model output path")
    ap.add_argument("--label-col", required=True)
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument(
        "--max-rows", type=int, default=2000,
        help="training-sample cap (deterministic md5-ordered draw)",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    from readability_ex_spark.operators.qualityclf import (
        save_model,
        train_quality_classifier,
        with_quality_scores,
    )

    spark = SparkSession.builder.appName("train_quality_clf").getOrCreate()
    df = spark.read.parquet(args.input)
    model = train_quality_classifier(
        df,
        args.label_col,
        text_col=args.text_col,
        id_col=args.id_col,
        max_rows=args.max_rows,
    )
    save_model(model, spark, args.output)

    scored = with_quality_scores(
        df, model, text_col=args.text_col, id_col=args.id_col
    )
    acc = (
        scored.select(
            ((F.col("clf_score") > 0.5) == F.col(args.label_col))
            .cast("int")
            .alias("ok")
        )
        .agg(F.avg("ok"))
        .first()[0]
    )
    n = df.count()
    print(f"model_buckets={len(model.weights)} bias={model.bias}")
    print(f"labeled_rows={n} accuracy={acc:.4f}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
