"""Trained document-quality classifier over hashed bag-of-words — the
fastText/CCNet-style model layer above the hand-written Gopher rules.

Production corpus pipelines (GPT-3, CCNet, LLaMA) train a small linear
classifier on labeled documents and score every crawl page with it;
the heavy part is the corpus-wide scoring pass, not the training.  The
split here matches that shape:

- **Training** is driver-side numpy over a BOUNDED deterministic
  sample (``train_quality_classifier``): logistic regression with
  full-batch gradient descent, fixed epochs, zero randomness — the
  same model from the same sample on every run.  A sample is the
  right input: a linear model's loss curve flattens in the low
  thousands of examples, while scoring must touch every row.
- **Scoring** is one Spark plan with NO UDF
  (``with_quality_scores``): tokens hash to one of 256 buckets via
  an md5-hex prefix (the engine-portable trick the simhash/minhash
  operators already rely on — Spark and DuckDB produce identical md5
  strings, so the DuckDB oracle reproduces the features exactly),
  one ``explode_outer`` pass joins the BROADCAST 256-row weight
  table, and the doc-level mean feeds a sigmoid.  Identical plan
  shape (and shuffle budget: one doc-keyed partial agg) to
  ``lmquality.unigram_logprob``.

The model serializes as a plain (bucket, weight) table + bias, so it
rides the same sidecar lifecycle as ``_lm_vocab`` if persisted, and
:func:`clf_score_sql` inlines it into a DuckDB expression for the
oracle twin (the pattern ``operators/bpe.py`` established).

``default_model()`` is a deterministic smoke model trained on an
embedded labeled micro-corpus — it exists so the checked query is a
pure function of the code; real use trains on real labels (the unit
tests train one against the Gopher rule verdicts and check it
reproduces them on held-out docs).

No reference counterpart (training-data layer).  Feature hashing:
Weinberger et al. 2009; quality-classifier practice: Brown et al.
2020 §A.2, Wenzek et al. (CCNet) 2020.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from readability_ex_spark.operators.tokenize import ws_tokens

N_BUCKETS = 256  # md5 first-2-hex buckets; plenty for a linear model
_HEX = "0123456789abcdef"
BUCKETS = tuple(a + b for a in _HEX for b in _HEX)

TRAIN_EPOCHS = 300
TRAIN_LR = 0.5
TRAIN_L2 = 1e-4
SCORE_DECIMALS = 6


def tokens_expr(text_col: str = "text") -> Column:
    """Lowercased whitespace tokens; empty array for empty/NULL text
    (the shared corpus tokenizer shape — see corpus.with_quality_rules)."""
    return ws_tokens(text_col, lower=True)


def bucket_expr(token: Column) -> Column:
    """Feature bucket of a token: first 2 hex chars of md5 (256-way
    hashing trick, identical string in Spark and DuckDB)."""
    return F.substring(F.md5(token), 1, 2)


@dataclass(frozen=True)
class QualityModel:
    """A trained linear model: per-bucket weights + bias.

    ``weights`` maps every 2-hex bucket to its weight (missing buckets
    mean 0.0 — the serialized table may omit them)."""

    weights: dict[str, float]
    bias: float

    def to_df(self, spark: SparkSession) -> DataFrame:
        """The broadcastable (bucket, w) weight table (non-zero rows).

        Built via pandas so createDataFrame takes the Arrow path — the
        plain-list path row-pickles with per-element verification
        (~0.4 s warm even for tiny frames; same fix as materialize_ivf's
        centroids)."""
        import pandas as pd

        rows = [(b, w) for b, w in sorted(self.weights.items()) if w != 0.0]
        pdf = pd.DataFrame(
            {"bucket": [b for b, _ in rows], "w": [w for _, w in rows]}
        )
        return spark.createDataFrame(pdf, "bucket string, w double")


def _features(texts: list[str]):
    """Hashed mean bag-of-words matrix for the trainer (numpy),
    computing the SAME buckets the Spark/DuckDB expressions produce."""
    import hashlib

    import numpy as np

    from readability_ex_spark.operators.tokenize import py_ws_tokens

    x = np.zeros((len(texts), N_BUCKETS))
    idx = {b: i for i, b in enumerate(BUCKETS)}
    for r, text in enumerate(texts):
        # EXACT twin of tokens_expr — str.split() would train weights
        # on buckets the distributed scorer never produces (it swallows
        # U+00A0 and strips non-space whitespace the JVM trim keeps)
        toks = py_ws_tokens(text, lower=True)
        for t in toks:
            x[r, idx[hashlib.md5(t.encode("utf-8")).hexdigest()[:2]]] += 1.0
        if toks:
            x[r] /= len(toks)
    return x


def train_quality_model(
    texts: list[str], labels: list[bool]
) -> QualityModel:
    """Deterministic full-batch logistic regression (numpy, fixed
    epochs/learning rate, zero-initialized — no RNG anywhere)."""
    import numpy as np

    x = _features(texts)
    y = np.asarray(labels, dtype=float)
    w = np.zeros(N_BUCKETS)
    b = 0.0
    n = max(len(texts), 1)
    for _ in range(TRAIN_EPOCHS):
        z = x @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - y
        w -= TRAIN_LR * ((x.T @ g) / n + TRAIN_L2 * w)
        b -= TRAIN_LR * float(g.mean())
    weights = {
        BUCKETS[i]: round(float(w[i]), 8)
        for i in range(N_BUCKETS)
        if w[i] != 0.0
    }
    return QualityModel(weights=weights, bias=round(float(b), 8))


def train_quality_classifier(
    df: DataFrame,
    label_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_rows: int = 2000,
) -> QualityModel:
    """Train on a BOUNDED deterministic sample of ``df`` (md5-ordered
    by id — rerun-stable, engine-agnostic, no RNG), labels from
    ``label_col``.  The collect is capped at ``max_rows`` rows of text:
    training is the cheap driver-side half; scoring stays distributed."""
    rows = (
        df.select(
            F.col(text_col).alias("t"), F.col(label_col).alias("y")
        )
        .orderBy(F.md5(F.col(id_col).cast("string")))
        .limit(max_rows)
        .collect()
    )
    return train_quality_model(
        [r.t for r in rows], [bool(r.y) for r in rows]
    )


def with_quality_scores(
    docs: DataFrame,
    model: QualityModel,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """``docs`` plus ``clf_score`` (sigmoid, rounded) — one
    explode_outer pass, broadcast weight join, doc-keyed partial agg;
    the corpus is scanned once and never shuffled on token."""
    spark = docs.sparkSession
    wdf = F.broadcast(model.to_df(spark))
    toks = docs.select(
        F.col(id_col),
        F.explode_outer(tokens_expr(text_col)).alias("_tok"),
    )
    sums = (
        toks.join(wdf, bucket_expr(F.col("_tok")) == wdf["bucket"], "left")
        .groupBy(id_col)
        .agg(
            F.sum(F.coalesce(F.col("w"), F.lit(0.0))).alias("_s"),
            F.count("_tok").alias("_n"),
        )
        .select(
            F.col(id_col),
            F.round(
                F.lit(1.0)
                / (
                    F.lit(1.0)
                    + F.exp(
                        -(
                            F.lit(model.bias)
                            + F.when(
                                F.col("_n") > 0, F.col("_s") / F.col("_n")
                            ).otherwise(F.lit(0.0))
                        )
                    )
                ),
                SCORE_DECIMALS,
            ).alias("clf_score"),
        )
    )
    return docs.join(sums, id_col)


def save_model(
    model: QualityModel, spark: SparkSession, path: str
) -> None:
    """Persist as one small parquet: (bucket, w) weight rows plus a
    single bias row with ``bucket`` NULL — self-contained, the same
    idiom as ``lmquality``'s ``_total`` vocab row, so it can ride the
    corpus sidecar lifecycle (``sidecars.py``)."""
    import pandas as pd

    rows = [
        (b, float(w)) for b, w in sorted(model.weights.items())
    ] + [(None, float(model.bias))]
    pdf = pd.DataFrame(
        {"bucket": [b for b, _ in rows], "w": [w for _, w in rows]}
    )
    spark.createDataFrame(pdf, "bucket string, w double").coalesce(
        1
    ).write.mode("overwrite").parquet(path)


def load_model(spark: SparkSession, path: str) -> QualityModel:
    """Inverse of :func:`save_model` (bounded collect: <= 257 rows)."""
    rows = spark.read.parquet(path).collect()
    bias = 0.0
    weights: dict[str, float] = {}
    for r in rows:
        if r.bucket is None:
            bias = r.w
        else:
            weights[r.bucket] = r.w
    return QualityModel(weights=weights, bias=bias)


def clf_score_sql(
    model: QualityModel, text_col: str = "text", id_col: str = "doc_id"
) -> str:
    """DuckDB CTE block computing ``clf_score`` per ``id_col`` from
    ``documents`` — the model inlined as a VALUES weight table, the
    same md5-prefix buckets, mean, and sigmoid as the Spark plan."""
    vals = ", ".join(
        f"('{b}', {w!r})" for b, w in sorted(model.weights.items())
    )
    return f"""
        cw(bucket, w) AS (VALUES {vals}),
        ctk AS (
          SELECT {id_col},
                 unnest(CASE WHEN {text_col} IS NULL
                              OR trim({text_col}) = ''
                        THEN CAST([] AS VARCHAR[])
                        ELSE regexp_split_to_array(
                               lower(trim({text_col})), '\\s+')
                        END) AS tok
          FROM documents),
        csum AS (
          SELECT t.{id_col},
                 sum(coalesce(w.w, 0.0)) AS s,
                 count(t.tok) AS n
          FROM ctk t LEFT JOIN cw w
            ON substr(md5(t.tok), 1, 2) = w.bucket
          GROUP BY t.{id_col}),
        cscore AS (
          SELECT d.{id_col},
                 round(1.0 / (1.0 + exp(-({model.bias!r} +
                       CASE WHEN coalesce(c.n, 0) > 0
                            THEN c.s / c.n ELSE 0.0 END))),
                       {SCORE_DECIMALS}) AS clf_score
          FROM documents d LEFT JOIN csum c USING ({id_col}))
    """


# embedded labeled micro-corpus for the deterministic default model:
# "good" rows look like prose (stopword-bearing sentences), "bad" rows
# look like the spam/keyword-stuffing a quality classifier downranks.
_GOOD_TEMPLATES = (
    "the quick study of {0} and the slow review of {1} went to print",
    "a committee of {0} agreed to publish the report and the survey "
    "of {1}",
    "results of the {0} trial were shared and sent to the {1} journal",
    "the history of {0} is rich and the future of {1} is uncertain",
)
_BAD_TEMPLATES = (
    "buy {0} cheap {0} discount {0} sale {0} offer {0} now",
    "{0} {0} {0} {1} {1} {1} click here click here",
    "win {0} free {1} casino bonus jackpot {0} {1} prize",
    "best {0} top {0} cheap {1} deal {1} promo code",
)
_TOPICS = (
    "glass", "rivers", "metals", "orchards", "lenses", "bridges",
    "engines", "gardens", "harbors", "meadows", "signals", "timber",
    "quarries", "mills", "canals",
)


def default_model() -> QualityModel:
    """The deterministic smoke model (pure function of the code): one
    labeled micro-corpus, one training run, no I/O — so the checked
    query's oracle can inline the identical weights."""
    texts, labels = [], []
    for i, topic in enumerate(_TOPICS):
        other = _TOPICS[(i + 1) % len(_TOPICS)]
        for tpl in _GOOD_TEMPLATES:
            texts.append(tpl.format(topic, other))
            labels.append(True)
        for tpl in _BAD_TEMPLATES:
            texts.append(tpl.format(topic, other))
            labels.append(False)
    return train_quality_model(texts, labels)


def score_texts(model: QualityModel, texts: list[str]) -> list[float]:
    """Driver-side reference scorer (numpy-free, per-row) for tests."""
    import hashlib

    from readability_ex_spark.operators.tokenize import py_ws_tokens

    out = []
    for text in texts:
        toks = py_ws_tokens(text, lower=True)
        s = sum(
            model.weights.get(
                hashlib.md5(t.encode("utf-8")).hexdigest()[:2], 0.0
            )
            for t in toks
        )
        z = model.bias + (s / len(toks) if toks else 0.0)
        out.append(round(1.0 / (1.0 + math.exp(-z)), SCORE_DECIMALS))
    return out


def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc trained-classifier quality score (the deterministic
    default model) over the documents table."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        with_quality_scores(docs, default_model())
        .select("doc_id", "clf_score")
        .orderBy("doc_id")
    )
