"""Corpus-mixing operators: deterministic sampling and token-budget
packing — the stage between "deduped corpus" and "training mix".

Both are pure DataFrame plans (no RNG state, no driver loops):

- ``deterministic_sample``: hash-based per-stratum sampling. Unlike
  ``df.sample``/``sampleBy`` (engine-specific RNG streams), the keep
  decision is a pure function of the row id — reruns, resumes, and
  other engines (the DuckDB oracle) reproduce it exactly, and a
  re-crawled url keeps landing in the same split.
- ``token_budget_pack``: per-language token budgets filled best-first —
  a windowed cumulative sum over quality-ordered docs, the standard
  shape for "take the best N billion tokens per language".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


SAMPLE_HEX_DIGITS = 6  # rate resolution 16^-6 ≈ 6e-8


def sample_hex_threshold(rate: float, digits: int = SAMPLE_HEX_DIGITS) -> str:
    """Lexicographic keep-threshold for ``deterministic_sample``: a row
    is kept iff its md5-prefix string sorts below this. 'g' sorts above
    every hex digit, so rate >= 1 keeps everything."""
    n = int(round(max(rate, 0.0) * 16**digits))
    if n >= 16**digits:
        return "g"
    return format(n, f"0{digits}x")


def deterministic_sample(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each row iff the first hex digits of md5(id) sort below the
    stratum's rate threshold (uniform draw over 16^6 buckets).

    Unlike RNG sampling the decision is a pure function of the id —
    engine-portable (string compare of md5 hex, identical in Spark and
    DuckDB), rerun/resume-stable, and a re-crawled url keeps landing in
    the same split. At 100 TB this is a codegen'd filter: no shuffle,
    no per-partition RNG seeding, and adding strata later never changes
    earlier keep decisions (each row's draw is rate-independent).
    """
    draw = F.substring(F.md5(F.col(id_col).cast("string")), 1, SAMPLE_HEX_DIGITS)
    threshold = F.lit(sample_hex_threshold(default_rate))
    for stratum, r in sorted(rates.items()):
        threshold = F.when(
            F.col(stratum_col) == stratum, F.lit(sample_hex_threshold(r))
        ).otherwise(threshold)
    return df.filter(draw < threshold)


def token_budget_pack(
    df: DataFrame,
    budget_per_stratum: int,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    quality_col: str = "quality_score",
) -> DataFrame:
    """Fill each stratum's token budget best-first: order docs by
    (quality desc, id asc — deterministic tiebreak) and keep the longest
    PREFIX whose running token total stays within budget. This is prefix
    truncation, not knapsack packing: the cumulative sum includes every
    higher-quality doc whether or not it was kept, so the first doc that
    overflows the budget also ends the stratum — a deliberately simple,
    single-window rule (skip-and-continue packing would need a stateful
    scan; the quality ordering makes the prefix the right cut anyway:
    everything below the cut is worse than everything above it).

    One window per stratum — a single hash shuffle on the stratum key;
    at crawl scale strata are languages/domains (dozens), so pair this
    with salting only if one stratum dominates (or pack per-shard
    budgets and merge).
    """
    w = (
        Window.partitionBy(stratum_col)
        .orderBy(F.col(quality_col).desc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("_cum", F.sum(F.col(tokens_col)).over(w))
        .filter(F.col("_cum") <= budget_per_stratum)
        .drop("_cum")
    )


SAMPLE_RATES = {"en": 0.5, "de": 0.25, "fr": 0.1}
# 2k tokens/lang binds on every sf table (per-lang totals are 3.5k-12k),
# so the checked entry exercises the cut, not a vacuous filter
PACK_BUDGET = 2_000


def _docs_with_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    from readability_ex_spark.operators.tokenize import ws_tokens

    toks = ws_tokens("text")
    n_tokens = F.size(toks).cast("long")
    n_stop = F.regexp_count(
        F.col("text"), F.lit(r"\b(the|a|of|and|to)\b")
    ).cast("long")
    stop_ratio = F.when(n_tokens > 0, n_stop.cast("double") / n_tokens).otherwise(
        F.lit(0.0)
    )
    len_part = F.least(n_tokens.cast("double") / F.lit(400.0), F.lit(1.0))
    return docs.select(
        "doc_id",
        "lang",
        n_tokens.alias("n_tokens"),
        F.round(len_part * 0.5 + stop_ratio * 0.5, 6).alias("quality_score"),
    )


def mixture_sample(
    df: DataFrame,
    weights: dict[str, float],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    weight_col: str | None = None,
) -> DataFrame:
    """Sample to TARGET MIX PROPORTIONS (Pile-style corpus mixing):
    ``weights[s]`` is the share stratum ``s`` should hold in the
    output, and the output is the largest mix the data can support —
    the binding stratum (smallest ``n_s / w_s``) is kept whole and
    every other stratum is downsampled to match.  Strata without a
    weight are dropped.

    Unlike :func:`deterministic_sample` (caller-fixed per-stratum
    rates), the rates here are DERIVED from the corpus: with totals
    ``n_s``, the achievable mix size is ``T = min_s(n_s / w_s)`` and
    stratum ``s`` keeps ``rate_s = min(1, w_s * T / n_s)``.  The keep
    decision reuses the same md5-prefix draw, so membership is stable
    under reruns and engine-portable.

    ``weight_col`` switches the mix's UNIT from documents to that
    column's mass (pass ``n_tokens`` for Pile-style TOKEN-share
    mixing, the unit a training run actually consumes): stratum totals
    become ``sum(weight_col)``, so the derived rates target the
    weighted shares.  Membership stays the per-doc md5 draw — docs
    sample uniformly within a stratum, so the realized weighted share
    is unbiased around the target (exact only in expectation; a
    doc-length-aware draw would break rerun-stable membership).

    Plan shape: one tiny per-stratum count aggregation (rows =
    #strata), a scalar min over it, and a BROADCAST join of the rate
    table back to the corpus followed by a codegen string-compare
    filter — the corpus is scanned once and never shuffled.  At 100 TB
    the count agg is the only extra pass, and pipelines that already
    materialize per-stratum stats can feed them in instead.
    """
    bad = {s: w for s, w in weights.items() if not w > 0}
    if bad or not weights:
        # w <= 0 makes n/w infinite (or the rate NaN) inside the plan —
        # reject up front; "drop this stratum" is spelled by omission
        raise ValueError(f"mixture weights must be > 0, got: {bad}")
    spark = df.sparkSession
    # pandas (Arrow) path for the tiny weight frame: the plain-list
    # createDataFrame row-pickles with per-element verification, ~0.4 s
    # warm even for a handful of rows (same fix as materialize_ivf)
    import pandas as _pd

    _items = sorted(weights.items())
    wdf = spark.createDataFrame(
        _pd.DataFrame(
            {stratum_col: [s for s, _ in _items], "_w": [w for _, w in _items]}
        ),
        f"{stratum_col} string, _w double",
    )
    # Spark plans are trees, not DAGs: without the checkpoint the
    # per-stratum count agg (a full corpus scan) would run twice —
    # once under the rate table and once under the scalar min.  The
    # checkpointed frame is #strata rows.
    # sum BEFORE casting: an integral weight column sums exactly in
    # long arithmetic (summation order irrelevant), so the derived
    # rates are bit-identical across engines and partitionings
    mass = (
        F.sum(weight_col).cast("double")
        if weight_col
        else F.count("*").cast("double")
    )
    counts = (
        df.groupBy(stratum_col)
        .agg(mass.alias("_n"))
        .join(F.broadcast(wdf), stratum_col)
        .localCheckpoint(eager=False)
    )
    tmax = counts.agg(
        F.min(F.col("_n").cast("double") / F.col("_w")).alias("_t")
    )
    rates = (
        counts.crossJoin(F.broadcast(tmax))
        .select(
            stratum_col,
            F.least(
                F.lit(1.0),
                F.col("_w") * F.col("_t") / F.col("_n").cast("double"),
            ).alias("_rate"),
        )
        .select(
            stratum_col,
            F.when(F.col("_rate") >= 1.0, F.lit("g"))
            .otherwise(
                F.lpad(
                    F.lower(
                        F.hex(
                            F.floor(
                                F.col("_rate") * F.lit(float(16**SAMPLE_HEX_DIGITS))
                            )
                        )
                    ),
                    SAMPLE_HEX_DIGITS,
                    "0",
                )
            )
            .alias("_thresh"),
        )
    )
    draw = F.substring(
        F.md5(F.col(id_col).cast("string")), 1, SAMPLE_HEX_DIGITS
    )
    return (
        df.join(F.broadcast(rates), stratum_col, "left")
        .filter(draw < F.coalesce(F.col("_thresh"), F.lit("")))
        .drop("_thresh")
    )


def shard_assign(
    df: DataFrame,
    shard_tokens: int,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Assign each doc to a training shard of ~``shard_tokens`` tokens
    (per stratum) — the step between "filtered corpus" and "training
    files", where loaders want same-language files of roughly equal
    token mass.

    A doc belongs to ``floor(start_offset / shard_tokens)`` where
    ``start_offset`` is the running token total of all earlier docs in
    its stratum (deterministic ``id_col`` order).  A doc straddling a
    boundary stays in the shard its offset starts in, so shards
    overflow by at most one document — the standard cheap rule; exact
    bin packing would need a stateful scan for no downstream benefit.
    Appending docs with larger ids never reassigns existing shards
    (monotone, like the md5-draw samplers).

    One window per stratum (a single hash exchange on the stratum key)
    — same budget and same skew caveat as :func:`token_budget_pack`:
    strata are languages/domains (dozens); shard WITHIN a stratum by
    hash-bucketing ``id_col`` first if one stratum ever dominates.
    Output = input columns + ``shard_id`` (0-based within stratum).
    """
    if shard_tokens <= 0:
        raise ValueError(f"shard_tokens must be > 0, got {shard_tokens}")
    w = (
        Window.partitionBy(stratum_col)
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(tokens_col)).over(w)
    return df.withColumn(
        "shard_id",
        F.floor((cum - F.col(tokens_col)) / F.lit(float(shard_tokens))),
    )


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    shard_col: str | None = None,
) -> DataFrame:
    """Pack docs into fixed-length training sequences: each doc maps to
    the one-or-more length-``seq_len`` sequences its tokens land in,
    with the token slice ``[tok_from, tok_to)`` of the doc that fills
    each — the map a sequence-building writer consumes (GPT-style
    packing: concatenate docs in deterministic ``id_col`` order, cut
    every ``seq_len`` tokens; a doc straddling a boundary SPLITS across
    sequences, unlike :func:`shard_assign`'s whole-doc rule, so every
    sequence is exactly full except each stratum's last).

    Plan: one window (cumulative token offset) plus an ``explode`` of
    the per-doc sequence range — output rows = docs + boundary
    crossings (≈ total_tokens/seq_len extra), never tokens.  Window
    partition = ``stratum_col`` (plus ``shard_col`` when given: pack
    within :func:`shard_assign` shards so a dominant language's window
    stays bounded by the shard size — the 100 TB shape; global
    sequence ids are then (shard_id, seq_id) pairs).

    Zero-token docs get no row (nothing to pack). Output = ``id_col``,
    partition keys, ``seq_id`` (0-based per partition), ``tok_from``/
    ``tok_to`` (doc-relative, ``tok_to`` exclusive), ``seq_off`` (where
    the slice starts inside the sequence).
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be > 0, got {seq_len}")
    keys = [stratum_col] + ([shard_col] if shard_col else [])
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n = F.col(tokens_col).cast("long")
    start = F.sum(tokens_col).over(w).cast("long") - n
    end = start + n
    L = F.lit(seq_len).cast("long")
    positioned = df.select(
        *keys, F.col(id_col), n.alias("_n"), start.alias("_start"),
        end.alias("_end"),
    ).filter(F.col("_n") > 0)
    exploded = positioned.select(
        *keys,
        id_col,
        "_start",
        "_end",
        # `div` = exact integer division on longs (no double rounding;
        # offsets at 100 TB exceed a double's 53-bit exact range later
        # than a long's 63 bits); DuckDB spells it `//`
        F.explode(
            F.sequence(
                F.expr(f"_start div {seq_len}"),
                F.expr(f"(_end - 1) div {seq_len}"),
            )
        ).alias("seq_id"),
    )
    seq_lo = F.col("seq_id") * L
    return exploded.select(
        *keys,
        id_col,
        "seq_id",
        F.greatest(F.col("_start"), seq_lo).alias("_lo"),
        F.least(F.col("_end"), seq_lo + L).alias("_hi"),
        F.col("_start"),
    ).select(
        *keys,
        id_col,
        "seq_id",
        (F.col("_lo") - F.col("_start")).alias("tok_from"),
        (F.col("_hi") - F.col("_start")).alias("tok_to"),
        (F.col("_lo") - seq_lo).alias("seq_off"),
    )


SEQ_LEN = 512  # binds at every sf (per-lang totals are 3.5k-12k tokens)


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_with_signals(spark, sf_dir).select(
        "doc_id", "lang", "n_tokens"
    )
    return pack_sequences(docs, SEQ_LEN).orderBy("doc_id", "seq_id")


SHARD_TOKENS = 3_000  # binds at every sf (per-lang totals are 3.5k-12k)


def q_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_with_signals(spark, sf_dir).select(
        "doc_id", "lang", "n_tokens"
    )
    return shard_assign(docs, SHARD_TOKENS).orderBy("doc_id")


# Target mix for the checked query: weights sum to 1; 'es'/'zh' carry
# no weight and are dropped. One weighted stratum (smallest n/w) is
# kept whole, the others downsample to the 50/30/20 mix.
MIXTURE_WEIGHTS = {"en": 0.5, "fr": 0.3, "de": 0.2}


def q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang"
    )
    return mixture_sample(docs, MIXTURE_WEIGHTS).orderBy("doc_id")


def q_mixture_sample_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-share mixing (Pile's actual unit): the same 50/30/20
    targets with rates derived from per-language TOKEN mass."""
    docs = _docs_with_signals(spark, sf_dir).select(
        "doc_id", "lang", "n_tokens"
    )
    return mixture_sample(
        docs, MIXTURE_WEIGHTS, weight_col="n_tokens"
    ).orderBy("doc_id")


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language sample (en 50%, de 25%, fr 10%,
    others dropped) — the reproducible alternative to sampleBy."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "n_chars"
    )
    return deterministic_sample(docs, SAMPLE_RATES).orderBy("doc_id")


def q_token_budget_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-quality-first packing of a 2k-token budget per language."""
    return token_budget_pack(
        _docs_with_signals(spark, sf_dir), PACK_BUDGET
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Deterministic train/val/test split
# ---------------------------------------------------------------------------

SPLIT_SALT = "split"
SPLIT_VAL_FRAC = 0.05
SPLIT_TEST_FRAC = 0.05


def corpus_split(
    df: DataFrame,
    val_frac: float = SPLIT_VAL_FRAC,
    test_frac: float = SPLIT_TEST_FRAC,
    id_col: str = "doc_id",
    salt: str = SPLIT_SALT,
    out_col: str = "split",
) -> DataFrame:
    """Assign every row a deterministic train/val/test split.

    The draw is the md5-hex prefix of ``salt || ':' || id`` — a pure
    function of the id, so (a) a document's split NEVER changes as the
    corpus grows or is rebuilt (no eval-set contamination from docs
    migrating between splits across versions), (b) reruns and other
    engines reproduce it exactly, and (c) the draw is independent of
    ``deterministic_sample``'s (different salt domain), so sampling a
    corpus never biases its split. Bands: ``[0, test)`` test,
    ``[test, test+val)`` val, rest train.

    At 100 TB this is a codegen'd projection — no shuffle, no RNG
    state, fused into whatever scan precedes it.
    """
    if val_frac < 0 or test_frac < 0 or val_frac + test_frac > 1:
        raise ValueError("need val_frac, test_frac >= 0 summing to <= 1")
    draw = F.substring(
        F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))),
        1,
        SAMPLE_HEX_DIGITS,
    )
    t_test = sample_hex_threshold(test_frac)
    t_val = sample_hex_threshold(test_frac + val_frac)
    return df.withColumn(
        out_col,
        F.when(draw < F.lit(t_test), F.lit("test"))
        .when(draw < F.lit(t_val), F.lit("val"))
        .otherwise(F.lit("train")),
    )


def q_corpus_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document split assignment (5% val / 5% test bands)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return corpus_split(docs).select("doc_id", "split").orderBy("doc_id")
