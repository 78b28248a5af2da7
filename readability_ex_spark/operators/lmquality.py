"""Corpus-statistics language-model quality scoring (CCNet-style).

CCNet (Wenzek et al. 2020) ranks crawl documents by language-model
perplexity and keeps the low-perplexity head; pipelines without a
trained LM use the corpus's OWN unigram statistics as the model — a
document full of common words scores near the corpus average, while
gibberish / boilerplate-id / non-linguistic pages fall into the OOV
floor and score far below it.  This module is that stage: a unigram LM
estimated from corpus term frequencies, scored per document.

Model: ``p(tok) = c_tok / total`` for the top-``vocab_size`` tokens by
corpus frequency (ties broken bytewise — deterministic across engines),
``p(oov) = 1 / total`` (count-1 floor).  Per-document score is the mean
natural-log probability over the doc's whitespace tokens:

    lm_logprob = (sum over in-vocab tokens of ln(c_tok)) / n - ln(total)

(the OOV terms contribute ``ln 1 = 0`` to the sum), NULL for empty docs.

Plan shape at 100 TB:

- the VOCAB BUILD is one token-level hash aggregation (the same shuffle
  as any document-frequency count) followed by a top-K on the
  vocab-cardinality table — this is the expensive, amortizable half,
  so :func:`unigram_vocab`'s output is a plain DataFrame a pipeline
  persists next to its other sidecar artifacts and reuses across runs
  (pass it back via ``vocab=``);
- SCORING is a broadcast join of exploded tokens against the bounded
  vocab (vocab_size + 1 rows) and a per-document partial aggregation —
  the corpus is scanned once and never shuffled on token; the only
  exchange is doc-cardinality after map-side combine.

No reference counterpart (training-data layer).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DEFAULT_VOCAB_SIZE = 24  # < the 31 distinct synthetic tokens -> real OOV
LOGPROB_DECIMALS = 4  # absorbs summation-order ulps across engines


def _tokens(text_col: str):
    from readability_ex_spark.operators.tokenize import ws_tokens

    return ws_tokens(text_col)


def unigram_vocab(
    docs: DataFrame,
    text_col: str = "text",
    vocab_size: int = DEFAULT_VOCAB_SIZE,
) -> DataFrame:
    """Top-``vocab_size`` corpus tokens with their counts plus a single
    ``_total`` row (token NULL) carrying the corpus token total.

    The total rides inside the same small artifact so a persisted vocab
    is self-contained: re-scoring a new batch against last month's
    corpus model needs this one table and nothing else.
    """
    toks = docs.select(F.explode(_tokens(text_col)).alias("token"))
    tf = toks.groupBy("token").agg(F.count("*").alias("c"))
    top = tf.orderBy(F.col("c").desc(), F.col("token").asc()).limit(
        vocab_size
    )
    total = tf.agg(F.sum("c").alias("c")).select(
        F.lit(None).cast("string").alias("token"), "c"
    )
    return top.unionByName(total)


def unigram_logprob(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_size: int = DEFAULT_VOCAB_SIZE,
    vocab: DataFrame | None = None,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-document mean unigram log-probability vs the corpus model.

    Returns ``(id_col, *carry_cols, n_tokens, n_oov, lm_logprob)``;
    ``lm_logprob`` is rounded to :data:`LOGPROB_DECIMALS`
    (engine-portable) and NULL for token-less docs.  Pass a persisted
    :func:`unigram_vocab` result as ``vocab`` to skip the corpus-wide
    build (the incremental-update path); by default the model is
    estimated from ``docs`` itself.  ``carry_cols`` ride through the
    single scoring pass (grouped with the unique id, so grouping is
    unchanged) — the alternative, joining the result back onto
    ``docs``, would re-derive the whole upstream plan a second time.
    """
    if vocab is None:
        vocab = unigram_vocab(docs, text_col, vocab_size)
    vocab = vocab.localCheckpoint(eager=False)  # built once, used twice
    total_df = vocab.filter(F.col("token").isNull()).select(
        F.log(F.col("c").cast("double")).alias("_ln_total")
    )
    entries = vocab.filter(F.col("token").isNotNull()).select(
        "token", F.log(F.col("c").cast("double")).alias("_ln_c")
    )
    # explode_outer keeps a NULL-token row for empty docs, so the doc
    # set survives one single pass — a "restore empty docs" join back
    # to ``docs`` would re-derive the whole upstream plan a second time
    # (Spark plans are trees), which inside a composed corpus build
    # means re-running the dedup pipeline
    toks = docs.select(
        F.col(id_col),
        *[F.col(c) for c in carry_cols],
        F.explode_outer(_tokens(text_col)).alias("token"),
    )
    per_doc = (
        toks.join(F.broadcast(entries), "token", "left")
        .groupBy(id_col, *carry_cols)
        .agg(
            F.count("token").alias("n_tokens"),
            F.sum(
                F.when(
                    F.col("token").isNotNull() & F.col("_ln_c").isNull(), 1
                ).otherwise(0)
            ).alias("n_oov"),
            F.sum(F.coalesce("_ln_c", F.lit(0.0))).alias("_s"),
        )
    )
    return per_doc.crossJoin(F.broadcast(total_df)).select(
        id_col,
        *carry_cols,
        "n_tokens",
        "n_oov",
        F.when(
            F.col("n_tokens") > 0,
            F.round(
                F.col("_s") / F.col("n_tokens") - F.col("_ln_total"),
                LOGPROB_DECIMALS,
            ),
        ).alias("lm_logprob"),
    )


def dsir_weights(
    docs: DataFrame,
    target_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_size: int = DEFAULT_VOCAB_SIZE,
    target_vocab: DataFrame | None = None,
    self_vocab: DataFrame | None = None,
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): per document,
    ``log p_target(doc) - log p_self(doc)`` under unigram models of a
    small TARGET corpus (the domain you want more of) and of the
    training corpus itself.  Documents that look more like the target
    than like the average of their own corpus get positive weights;
    resample/keep by descending weight.

    Returns ``(id_col, n_tokens, target_logprob, self_logprob,
    dsir_weight)`` (all NULL-scored rows are token-less docs).  Both
    models are :func:`unigram_vocab` artifacts — pass persisted ones to
    skip the builds.  Plan: the target build is tiny (the target corpus
    is a sample by construction), the self build is the one amortizable
    token shuffle, and scoring is ONE corpus pass — a single
    explode_outer with both bounded vocab tables broadcast-joined onto
    the same token stream and both log-prob sums folded in one
    doc-level aggregation (two sums in one agg cost the same exchange
    as one; a second ``unigram_logprob`` pass would scan the corpus
    twice).  The corpus is never shuffled on token.
    """
    if target_vocab is None:
        target_vocab = unigram_vocab(target_df, text_col, vocab_size)
    if self_vocab is None:
        self_vocab = unigram_vocab(docs, text_col, vocab_size)
    target_vocab = target_vocab.localCheckpoint(eager=False)
    self_vocab = self_vocab.localCheckpoint(eager=False)

    def _split(vocab: DataFrame, tag: str):
        total = vocab.filter(F.col("token").isNull()).select(
            F.log(F.col("c").cast("double")).alias(f"_ln_total_{tag}")
        )
        entries = vocab.filter(F.col("token").isNotNull()).select(
            "token", F.log(F.col("c").cast("double")).alias(f"_ln_c_{tag}")
        )
        return total, entries

    t_total, t_entries = _split(target_vocab, "t")
    s_total, s_entries = _split(self_vocab, "s")
    # explode_outer: the NULL-token row keeps empty docs in the single
    # pass (see unigram_logprob's plan-tree note)
    toks = docs.select(
        F.col(id_col), F.explode_outer(_tokens(text_col)).alias("token")
    )
    per_doc = (
        toks.join(F.broadcast(t_entries), "token", "left")
        .join(F.broadcast(s_entries), "token", "left")
        .groupBy(id_col)
        .agg(
            F.count("token").alias("n_tokens"),
            F.sum(F.coalesce("_ln_c_t", F.lit(0.0))).alias("_st"),
            F.sum(F.coalesce("_ln_c_s", F.lit(0.0))).alias("_ss"),
        )
    )

    def _logprob(sum_col: str, total_col: str):
        return F.when(
            F.col("n_tokens") > 0,
            F.round(
                F.col(sum_col) / F.col("n_tokens") - F.col(total_col),
                LOGPROB_DECIMALS,
            ),
        )

    return (
        per_doc.crossJoin(F.broadcast(t_total.crossJoin(s_total)))
        .select(
            id_col,
            "n_tokens",
            _logprob("_st", "_ln_total_t").alias("target_logprob"),
            _logprob("_ss", "_ln_total_s").alias("self_logprob"),
        )
        .withColumn(
            "dsir_weight",
            F.round(
                F.col("target_logprob") - F.col("self_logprob"),
                LOGPROB_DECIMALS,
            ),
        )
    )


def lm_buckets(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    n_buckets: int = 3,
    vocab_size: int = DEFAULT_VOCAB_SIZE,
    vocab: DataFrame | None = None,
) -> DataFrame:
    """CCNet's head/middle/tail split: per-language perplexity buckets.

    Wenzek et al. 2020 §4.4 cut each language's documents into three
    equal perplexity bands and train preferentially on the "head"
    (most-fluent) band.  Here bucket 1 = highest ``lm_logprob`` =
    lowest perplexity = head; ties and NULL scores (empty docs) order
    deterministically (score DESC NULLS LAST, id ASC), so the split is
    rerun-stable and engine-portable (``ntile`` agrees across engines
    under a total order).

    Plan: scoring is the single-pass broadcast shape of
    :func:`unigram_logprob`; the bucket assignment is ONE window per
    language.  A window partition cannot be split, so on a corpus
    where one language dominates this exact-rank variant funnels that
    language through one task — use :func:`lm_bucket_thresholds` +
    :func:`assign_lm_buckets` (percentile thresholds, broadcast, pure
    codegen CASE) as the 100 TB path and keep this one for
    oracle-exact work at audit scale.
    """
    from pyspark.sql import Window

    # lang rides through the single scoring pass — the old restore
    # join (docs.select(id, lang).join(scored)) re-derived the docs
    # upstream twice, the exact pattern unigram_logprob's own
    # explode_outer comment forbids
    keyed = unigram_logprob(
        docs, id_col, text_col, vocab_size, vocab, carry_cols=(lang_col,)
    )
    w = Window.partitionBy(lang_col).orderBy(
        F.col("lm_logprob").desc_nulls_last(), F.col(id_col).asc()
    )
    bucket = F.ntile(n_buckets).over(w)
    return keyed.select(
        id_col,
        lang_col,
        "lm_logprob",
        bucket.alias("lm_bucket"),
        F.when(bucket == 1, F.lit("head"))
        .when(bucket == n_buckets, F.lit("tail"))
        .otherwise(F.lit("middle"))
        .alias("lm_band"),
    )


def lm_bucket_thresholds(
    scored: DataFrame,
    lang_col: str = "lang",
    n_buckets: int = 3,
    score_col: str = "lm_logprob",
) -> DataFrame:
    """Per-language bucket CUT POINTS (approx percentiles of
    ``score_col``) — the scalable alternative to :func:`lm_buckets`'
    exact rank: one tiny agg (#languages rows, broadcastable), then
    :func:`assign_lm_buckets` is a free codegen CASE over every row,
    no total ordering anywhere.  Band boundaries can differ from the
    exact split by the sketch's rank error at the cut, which CCNet's
    use (train on the head band) tolerates by construction."""
    qs = [i / n_buckets for i in range(1, n_buckets)]
    return scored.filter(F.col(score_col).isNotNull()).groupBy(
        lang_col
    ).agg(
        F.percentile_approx(score_col, qs).alias("_cuts")
    )


def assign_lm_buckets(
    scored: DataFrame,
    thresholds: DataFrame,
    lang_col: str = "lang",
    score_col: str = "lm_logprob",
    n_buckets: int = 3,
) -> DataFrame:
    """``scored`` plus ``lm_bucket`` from broadcast ``thresholds``:
    bucket = 1 + number of cut points strictly above the score (cuts
    are ascending percentiles; bucket 1 = top scores = head).  NULL
    scores — and languages the threshold table never saw — land in
    bucket ``n_buckets`` (the tail, with the other unscorables)."""
    joined = scored.join(F.broadcast(thresholds), lang_col, "left")
    below = F.size(F.filter("_cuts", lambda c: c > F.col(score_col)))
    return joined.withColumn(
        "lm_bucket",
        F.when(
            F.col(score_col).isNull() | F.col("_cuts").isNull(),
            F.lit(n_buckets),
        ).otherwise(below + 1),
    ).drop("_cuts")


def q_unigram_logprob(spark, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return unigram_logprob(docs).orderBy("doc_id")


def q_lm_buckets(spark, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return lm_buckets(docs).orderBy("doc_id")


def q_dsir_weights(spark, sf_dir: str) -> DataFrame:
    """DSIR weights of the training split against the eval-split
    'target domain' (the same deterministic md5 split decontamination
    uses).  The train frame is checkpointed once — it feeds both the
    self-model build and the scoring pass, and the composed job
    (prepare_corpus.py) checkpoints its corpus before this stage for
    the same plan-tree reason."""
    from readability_ex_spark.operators.decontam import _eval_split

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    target = _eval_split(docs)
    train = docs.join(
        target.select("doc_id"), "doc_id", "left_anti"
    ).localCheckpoint(eager=False)
    return dsir_weights(train, target).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Interpolated bigram LM (one order past the unigram model)
# ---------------------------------------------------------------------------

DEFAULT_BIGRAM_SIZE = 64  # top pairs kept; testdata has ~900 possible
BIGRAM_LAMBDA = 0.75  # bigram weight; 1-lambda = 0.25 is float-exact


def _pair_strings(text_col: str):
    """Adjacent-token pair strings 'prev w' (tokens are whitespace-free
    by construction, so the join key is unambiguous)."""
    toks = _tokens(text_col)
    n = F.size(toks)
    return F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def bigram_vocab(
    docs: DataFrame,
    text_col: str = "text",
    bigram_size: int = DEFAULT_BIGRAM_SIZE,
) -> DataFrame:
    """Top-``bigram_size`` adjacent-token pairs with corpus counts,
    keyed by the 'prev w' pair string (ties bytewise) — the persistable
    second-order half of the LM model, built by the same one
    token-scale hash aggregation as :func:`unigram_vocab`."""
    pf = (
        docs.select(F.explode(_pair_strings(text_col)).alias("pair"))
        .groupBy("pair")
        .agg(F.count("*").alias("c"))
    )
    return pf.orderBy(F.col("c").desc(), F.col("pair").asc()).limit(
        bigram_size
    )


def bigram_logprob(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_size: int = DEFAULT_VOCAB_SIZE,
    bigram_size: int = DEFAULT_BIGRAM_SIZE,
    lam: float = BIGRAM_LAMBDA,
    vocab: DataFrame | None = None,
    bigrams: DataFrame | None = None,
) -> DataFrame:
    """Per-document mean log-probability under a Jelinek-Mercer
    interpolated bigram model — one order closer to CCNet's KenLM than
    the unigram score, from the same corpus-statistics machinery.

    Per position i: ``p = lam * c(prev,w)/c(prev) + (1-lam) * p_uni(w)``
    with ``p_uni(w) = c(w)/total`` (count-1 OOV floor); position 1
    scores pure unigram; an OOV ``prev`` has no usable context, so its
    successor scores ``(1-lam) * p_uni`` (the bigram term is zero by
    construction, never a lookup miss treated as mass).

    Returns ``(id, n_tokens, n_bigram_hits, lm2_logprob)`` with the
    score rounded to :data:`LOGPROB_DECIMALS`, NULL for empty docs.
    Pass persisted :func:`unigram_vocab` / :func:`bigram_vocab` frames
    to skip the model builds (the incremental path).

    Scale shape: model build = two token-scale hash aggs (amortizable
    artifacts); scoring = ONE corpus pass exploding positions, three
    broadcast joins against bounded tables (vocab twice — word and
    context — plus pairs), one doc-keyed agg. The corpus is never
    shuffled on token or pair.
    """
    if vocab is None:
        vocab = unigram_vocab(docs, text_col, vocab_size)
    vocab = vocab.localCheckpoint(eager=False)
    if bigrams is None:
        bigrams = bigram_vocab(docs, text_col, bigram_size)
    total_df = vocab.filter(F.col("token").isNull()).select(
        F.col("c").cast("double").alias("_total")
    )
    uni_w = vocab.filter(F.col("token").isNotNull()).select(
        F.col("token").alias("w"), F.col("c").alias("_c_w")
    )
    uni_prev = vocab.filter(F.col("token").isNotNull()).select(
        F.col("token").alias("prev"), F.col("c").alias("_c_prev")
    )
    pair_c = bigrams.select("pair", F.col("c").alias("_c_pw"))

    toks = _tokens(text_col)
    n = F.size(toks)
    # positions via arrays_zip over the token array and its 1-shifted
    # self — single array ops, NOT a per-position transform lambda
    # (interpreted HOFs measured ~5x the whole-query cost at sf0.1;
    # the BENCH/BASELINE.md HOF rule applied at the expression level).
    # arrays_zip pads the shorter side with NULL, so position 1 gets
    # prev=NULL and an empty doc yields one all-NULL row — exactly the
    # explode_outer(empty) shape the aggregation expects.
    prevs = F.concat(
        F.array(F.lit(None).cast("string")),
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
    )
    positions = F.arrays_zip(toks.alias("w"), prevs.alias("prev"))
    # explode_outer keeps empty docs in the single pass (tree-plan rule:
    # a restore-join would re-derive the whole upstream)
    rows = docs.select(
        F.col(id_col), F.explode_outer(positions).alias("_p")
    ).select(
        id_col,
        F.col("_p.w").alias("w"),
        F.col("_p.prev").alias("prev"),
        F.concat_ws(" ", F.col("_p.prev"), F.col("_p.w")).alias("_pair_key"),
    )
    # NB concat_ws skips NULLs — guard the pair join on prev IS NOT NULL
    scored = (
        rows.join(F.broadcast(uni_w), "w", "left")
        .join(F.broadcast(uni_prev), "prev", "left")
        .join(
            F.broadcast(pair_c),
            (F.col("_pair_key") == F.col("pair"))
            & F.col("prev").isNotNull(),
            "left",
        )
        .crossJoin(F.broadcast(total_df))
    )
    p_uni = F.coalesce(F.col("_c_w"), F.lit(1)) / F.col("_total")
    p = (
        F.when(F.col("prev").isNull(), p_uni)
        .when(F.col("_c_prev").isNull(), F.lit(1.0 - lam) * p_uni)
        .otherwise(
            F.lit(lam)
            * (
                F.coalesce(F.col("_c_pw"), F.lit(0))
                / F.col("_c_prev").cast("double")
            )
            + F.lit(1.0 - lam) * p_uni
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count("w").alias("n_tokens"),
        F.sum(
            F.when(F.col("_c_pw").isNotNull(), 1).otherwise(0)
        ).alias("n_bigram_hits"),
        F.sum(F.when(F.col("w").isNotNull(), F.log(p))).alias("_s"),
    )
    return per_doc.select(
        id_col,
        "n_tokens",
        F.col("n_bigram_hits").cast("long").alias("n_bigram_hits"),
        F.when(
            F.col("n_tokens") > 0,
            F.round(F.col("_s") / F.col("n_tokens"), LOGPROB_DECIMALS),
        ).alias("lm2_logprob"),
    )


def q_bigram_logprob(spark, sf_dir: str) -> DataFrame:
    """Interpolated bigram LM score per document (self-trained model)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return bigram_logprob(docs).orderBy("doc_id")
