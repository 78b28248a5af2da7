"""Text-analysis operators for training-data pipelines.

Token counting, quality scoring, language id (stopword-vote heuristic),
document fingerprinting, exact dedup, MinHash signatures. All built-in
``pyspark.sql.functions`` (JVM-side, codegen) — no Python UDFs — so they
stay fast at 100 TB and are DuckDB-oracle expressible.

Portability notes for the oracle: hashes use md5 (identical hex string in
Spark and DuckDB); MinHash uses *lexicographic min of seeded md5 strings*
as the permutation, which is engine-agnostic (Spark's xxhash64/hash and
DuckDB's hash() disagree, md5 strings do not).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Stopword vote lists for the language-id heuristic (tiny by design —
# deterministic and SQL-expressible; a production run would swap in a
# fastText-style model behind the same column contract).
_LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "es": ["el", "la", "los"],
    "fr": ["le", "les", "des"],
    "de": ["der", "die", "und"],
}

N_MINHASH_SIG = 4  # signature width for the oracle-checked variant


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _tokens_col():
    """Whitespace tokens of trimmed text; empty text -> empty array."""
    return F.when(F.trim(F.col("text")) == "", F.array().cast("array<string>")).otherwise(
        F.split(F.trim(F.col("text")), r"\s+")
    )


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token count + distinct-token count per document."""
    docs = _docs(spark, sf_dir)
    return (
        docs.select(
            "doc_id",
            F.size(_tokens_col()).cast("long").alias("n_tokens"),
            F.size(F.array_distinct(_tokens_col())).cast("long").alias("n_distinct_tokens"),
        )
        .orderBy("doc_id")
    )


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cheap quality signals: length, mean token length, stopword ratio.

    score = clamp01(n_tokens/400) * 0.5 + stopword_ratio * 0.5 — a
    deterministic toy combination of the standard Gopher-style signals.
    """
    docs = _docs(spark, sf_dir)
    n_tokens = F.size(_tokens_col()).cast("long")
    n_stop = F.regexp_count(F.col("text"), F.lit(r"\b(the|a|of|and|to)\b")).cast("long")
    stop_ratio = F.when(n_tokens > 0, n_stop.cast("double") / n_tokens).otherwise(
        F.lit(0.0)
    )
    len_part = F.least(n_tokens.cast("double") / F.lit(400.0), F.lit(1.0))
    return (
        docs.select(
            "doc_id",
            n_tokens.alias("n_tokens"),
            n_stop.alias("n_stopwords"),
            F.round(stop_ratio, 6).alias("stopword_ratio"),
            F.round(len_part * 0.5 + stop_ratio * 0.5, 6).alias("quality_score"),
        )
        .orderBy("doc_id")
    )


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-vote language guess; ties broken by fixed language order."""
    docs = _docs(spark, sf_dir)
    votes = {
        lang: sum(
            (F.regexp_count(F.col("text"), F.lit(rf"\b{w}\b")) for w in words),
            F.lit(0),
        )
        for lang, words in _LANG_MARKERS.items()
    }
    # greatest-vote winner; ties keep the earlier language in priority
    # order (en > es > fr > de) because only strictly-greater votes win.
    order = list(_LANG_MARKERS)
    guess = F.lit("und")
    guess_v = F.lit(0)
    for lang in order:
        v = votes[lang]
        take = v > guess_v
        guess = F.when(take, F.lit(lang)).otherwise(guess)
        guess_v = F.when(take, v).otherwise(guess_v)
    return (
        docs.select("doc_id", "lang", guess.alias("lang_guess"))
        .orderBy("doc_id")
    )


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: md5 of whitespace-normalized, lowercased text."""
    docs = _docs(spark, sf_dir)
    norm = F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
    return (
        docs.select("doc_id", F.md5(norm).alias("fingerprint"))
        .orderBy("doc_id")
    )


def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via fingerprint group-by: canonical id + dupe count.

    At 100 TB this is a single hash shuffle on the 32-byte fingerprint,
    with map-side partial aggregation; output is the dedup manifest.
    """
    docs = _docs(spark, sf_dir)
    norm = F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
    return (
        docs.select("doc_id", F.md5(norm).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.min("doc_id").alias("canonical_id"),
            F.count("*").alias("n_copies"),
        )
        .orderBy("fingerprint")
    )


def minhash_signature(n_sig: int = N_MINHASH_SIG):
    """MinHash signature columns over whitespace tokens.

    Permutation i = lexicographic order of md5(i || '|' || token); the
    signature element is the min. Engine-agnostic and deterministic.
    """
    toks = F.array_distinct(_tokens_col())

    def hasher(seed: int):
        # NB: the lambda must take exactly one arg — F.transform treats a
        # two-arg lambda as (element, index).
        return lambda t: F.md5(F.concat(F.lit(f"{seed}|"), t))

    return [
        F.array_min(F.transform(toks, hasher(i))).alias(f"sig{i}")
        for i in range(n_sig)
    ]


def q_minhash_sig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document MinHash signature (oracle-checked width-4 variant)."""
    docs = _docs(spark, sf_dir)
    return docs.select("doc_id", *minhash_signature()).orderBy("doc_id")


def q_minhash_band_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding: candidate near-dup pairs sharing a (sig0, sig1) band.

    The scale path of near-dedup: band-bucket self-join instead of the
    O(n^2) cross join. Bands with a single member produce no pairs.
    """
    docs = _docs(spark, sf_dir)
    sigs = docs.select("doc_id", *minhash_signature())
    a = sigs.select(
        F.col("doc_id").alias("doc_a"), F.col("sig0"), F.col("sig1")
    )
    b = sigs.select(
        F.col("doc_id").alias("doc_b"), F.col("sig0"), F.col("sig1")
    )
    return (
        a.join(b, ["sig0", "sig1"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .orderBy("doc_a", "doc_b")
    )


def q_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: band-bucket candidate join
    (sig0, sig1) -> exact token-set Jaccard verification >= 0.8.

    The scale shape: candidates come from the band join (no O(n^2)
    cross), the quadratic verify runs only within candidate pairs."""
    docs = _docs(spark, sf_dir)
    sigs = docs.select(
        "doc_id",
        F.array_distinct(_tokens_col()).alias("toks"),
        *minhash_signature(2),
    )
    a = sigs.select(
        F.col("doc_id").alias("doc_a"), F.col("toks").alias("toks_a"),
        "sig0", "sig1",
    )
    b = sigs.select(
        F.col("doc_id").alias("doc_b"), F.col("toks").alias("toks_b"),
        "sig0", "sig1",
    )
    inter = F.size(F.array_intersect("toks_a", "toks_b"))
    union = F.size(F.array_union("toks_a", "toks_b"))
    jac = F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))
    return (
        a.join(b, ["sig0", "sig1"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= 0.8)
        .orderBy("doc_a", "doc_b")
    )


def q_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus rollup: docs, distinct sources, char totals —
    the monitoring-table shape of the extraction job's counters."""
    docs = _docs(spark, sf_dir)
    return (
        docs.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("source").alias("n_sources"),
            F.sum("n_chars").alias("total_chars"),
            F.round(F.avg("n_chars"), 2).alias("avg_chars"),
        )
        .orderBy("lang")
    )


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-set Jaccard for same-source doc pairs (blocked near-dup).

    Blocking key = source (in the page pipeline: host); within a block the
    pairwise Jaccard is exact. array_intersect/union stay JVM-side.
    """
    docs = _docs(spark, sf_dir)
    toks = docs.select(
        "doc_id",
        "source",
        F.array_distinct(_tokens_col()).alias("toks"),
    )
    a = toks.select(
        F.col("source"),
        F.col("doc_id").alias("doc_a"),
        F.col("toks").alias("toks_a"),
    )
    b = toks.select(
        F.col("source"),
        F.col("doc_id").alias("doc_b"),
        F.col("toks").alias("toks_b"),
    )
    inter = F.size(F.array_intersect("toks_a", "toks_b"))
    union = F.size(F.array_union("toks_a", "toks_b"))
    jac = F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))
    return (
        a.join(b, "source")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.round(jac, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.5)
        .orderBy("doc_a", "doc_b")
    )


N_SIMHASH_BITS = 16
_ODD_HEX = "13579bdf"  # hex digits with lsb=1


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash per document over distinct whitespace tokens.

    Bit i uses the lsb of hex digit i of md5(token) — engine-agnostic
    (identical md5 hex in Spark and DuckDB), so the oracle can recompute
    it exactly. Near-dup candidates are docs at small Hamming distance;
    at 100 TB this joins on simhash bands like MinHash-LSH.
    """
    docs = _docs(spark, sf_dir)
    toks = F.array_distinct(_tokens_col())

    def bit(i: int):
        def vote(t):
            d = F.substring(F.md5(t), i + 1, 1)
            return F.when(F.instr(F.lit(_ODD_HEX), d) > 0, 1).otherwise(-1)

        total = F.aggregate(
            F.transform(toks, lambda t: vote(t)), F.lit(0), lambda a, v: a + v
        )
        return F.when(total > 0, F.lit(1 << i)).otherwise(F.lit(0))

    simhash = bit(0)
    for i in range(1, N_SIMHASH_BITS):
        simhash = simhash + bit(i)
    return (
        docs.select("doc_id", simhash.cast("long").alias("simhash"))
        .orderBy("doc_id")
    )


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary column plumbing: treat text bytes as a fake payload,
    emit typed metadata (byte length, deterministic fake dims).

    Real image/audio decode is stubbed (libs not in container) — see
    readability_ex_spark/operators/multimodal.py for the mapInPandas
    plumbing; this query checks the schema/derivation contract.
    """
    docs = _docs(spark, sf_dir)
    payload = F.col("text").cast("binary")
    n_bytes = F.octet_length(payload).cast("long")
    return (
        docs.select(
            "doc_id",
            n_bytes.alias("n_bytes"),
            (F.pmod(n_bytes, F.lit(640)) + F.lit(1)).cast("long").alias("fake_width"),
            (F.pmod(n_bytes, F.lit(480)) + F.lit(1)).cast("long").alias("fake_height"),
        )
        .orderBy("doc_id")
    )
