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

import pandas as pd

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

# b×r LSH banding defaults for the oracle-checked near-dup path.
# 3 bands × 2 rows: candidate recall at Jaccard j is 1-(1-j^2)^3
# (~95% at j=0.8 vs ~64% for the old single band). MAX_BAND_BUCKET is
# deliberately small so the cap *binds* on the sf0.01 synthetic corpus
# and the drop semantics are oracle-verified; production callers pass
# their own (corpus.near_dup_pairs defaults to 1000).
N_LSH_BANDS = 3
N_LSH_ROWS = 2
MAX_BAND_BUCKET = 50


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _tokens_col():
    """Whitespace tokens of trimmed text; empty text -> empty array."""
    from readability_ex_spark.operators.tokenize import ws_tokens

    return ws_tokens("text")


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


# BPE-style pre-tokenizer regex (GPT-2 shape, ASCII classes, NO
# lookahead — RE2 (DuckDB) has no lookahead, and ASCII classes dodge
# Java-vs-RE2 unicode-property differences, keeping the oracle exact):
# contractions | space?letters | space?digits | space?other-punct-run
BPE_TOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s']+"


def q_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token count: matches of the GPT-2-style pre-tokenizer
    regex — the unit LLM training budgets are priced in (whitespace
    tokens undercount punctuation-heavy text badly). Pure
    ``regexp_count``: JVM-side, codegen, one scan."""
    docs = _docs(spark, sf_dir)
    n_ws = F.size(_tokens_col()).cast("long")
    n_bpe = F.regexp_count(F.col("text"), F.lit(BPE_TOKEN_RE)).cast("long")
    return (
        docs.select(
            "doc_id",
            n_bpe.alias("n_bpe_tokens"),
            n_ws.alias("n_ws_tokens"),
            F.round(
                F.when(n_ws > 0, n_bpe.cast("double") / n_ws).otherwise(0.0), 6
            ).alias("bpe_per_ws"),
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


K_GRAM = 3  # winnowing k-gram width (TOKENS — see q_winnow_fingerprint)
WINNOW_WINDOW = 4  # hashes per winnowing window


def q_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al.): rolling
    token k-gram hashes, one selected minimum per window of
    WINNOW_WINDOW consecutive hashes, distinct per document.

    Unlike the whole-document md5 (``q_fingerprint``), the winnowed set
    detects PARTIAL overlap: two documents sharing any run of
    >= k + window - 1 TOKENS share at least one fingerprint. k-grams
    are at token boundaries, not per character position: per-char
    8-grams carried ~6x more md5 calls (one per char vs one per token)
    for no extra recall at paragraph granularity — a shared run of
    W words is caught either way, and sub-word overlap isn't a dedup
    signal. The hash is md5 of the space-joined token k-gram
    (engine-portable; the guarantee needs only determinism, not a true
    incremental hash), the window minimum is the lexicographic md5 min
    — both exactly reproducible in DuckDB. At 100 TB the exploded
    (fingerprint, doc) table group-bys on fingerprint for overlap
    candidates — linear, one shuffle, same shape as exact dedup.
    """
    return winnow_fingerprints(_docs(spark, sf_dir)).orderBy(
        "doc_id", "fingerprint"
    )


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = K_GRAM,
    window: int = WINNOW_WINDOW,
) -> DataFrame:
    """(id, fingerprint) winnowed fingerprint rows — see
    q_winnow_fingerprint for the guarantee and scale shape.

    Normalization stays JVM-side (the exact lower/collapse expression
    the DuckDB oracle mirrors — Python's str.lower/\\s would diverge on
    unicode); the per-token md5 + sliding-window minimum runs in an
    Arrow-vectorized pandas UDF. Spark's higher-order functions are
    interpreted, so an md5 lambda per position carried a ~100x constant
    over hashlib in a plain loop (BENCH/BASELINE.md HOF rule); the
    window minimum is a monotonic deque — O(n), not O(n*window).
    Selection compares raw 16-byte digests (byte order == the hex
    order DuckDB's min compares, two hex digits per byte) and renders
    hex only for the selected minima."""
    from collections import deque
    from hashlib import md5 as _md5

    from pyspark.sql.functions import pandas_udf

    # digest per k-gram string, memoized across the task's batches:
    # duplicate-heavy corpora repeat shared paragraphs' k-grams across
    # documents, so each distinct gram pays hashlib once per task
    _gram_memo: dict[str, bytes] = {}

    @pandas_udf("array<string>")
    def _winnow(norm: pd.Series) -> pd.Series:
        memo = _gram_memo
        out = []
        for tx in norm:
            toks = tx.split(" ") if tx else []
            if len(toks) < k + window - 1:
                out.append([])
                continue
            grams = []
            for i in range(len(toks) - k + 1):
                g = " ".join(toks[i : i + k])
                d = memo.get(g)
                if d is None:
                    d = _md5(g.encode("utf-8")).digest()
                    memo[g] = d
                grams.append(d)
            fps = set()
            dq: deque[int] = deque()  # indices of a rising-min run
            for i, g in enumerate(grams):
                while dq and grams[dq[-1]] >= g:
                    dq.pop()
                dq.append(i)
                if dq[0] <= i - window:
                    dq.popleft()
                if i >= window - 1:
                    fps.add(grams[dq[0]])
            out.append(sorted(g.hex() for g in fps))
        return pd.Series(out)

    txt = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    return df.select(F.col(id_col), _winnow(txt).alias("_fps")).select(
        F.col(id_col), F.explode("_fps").alias("fingerprint")
    )


# fingerprints in more docs than this are stop-grams (df cut) — 50 on
# the sf corpora keeps real shared-paragraph pairs (measured: df p50=3,
# p99=31; at 20 the near-dup chains' shared content was cut and no pair
# reached threshold) while the true boilerplate tail (df up to 345) drops.
# WINNOW_MAX_DF is the FLOOR: the effective default cut scales with the
# corpus as max(WINNOW_MAX_DF, n_docs // WINNOW_DF_SCALE), so duplicate
# families that outgrow a fixed 50 still surface their overlap pairs at
# crawl scale (a fixed cut silently loses recall as families grow).
WINNOW_MAX_DF = 50
WINNOW_DF_SCALE = 1000  # docs per unit of df headroom
WINNOW_CONTAINMENT = 0.5


def winnow_overlap_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = WINNOW_CONTAINMENT,
    max_df: int | None = None,
    df_scale: int = WINNOW_DF_SCALE,
    k: int = K_GRAM,
    window: int = WINNOW_WINDOW,
) -> DataFrame:
    """PARTIAL-overlap pairs via winnowed fingerprints: containment
    |F_a ∩ F_b| / min(|F_a|, |F_b|) >= ``threshold``. Catches a doc
    quoting / embedding another's paragraphs — a different failure mode
    than whole-document near-dup (Jaccard dilutes a large doc containing
    a small one; containment doesn't).

    Same inverted-index shape as the shingle verify: explode
    (fingerprint, id), drop fingerprints shared by more than ``max_df``
    docs (the classic document-frequency cut — ubiquitous 8-gram
    boilerplate would otherwise turn quadratic AND carry no overlap
    signal), self-join on fingerprint, count per pair. Containment
    denominators use the PRE-cut set sizes, so the df cut only ever
    lowers the score — a pair can be missed when its shared run is
    pure boilerplate, never over-reported. Requires threshold > 0.

    ``max_df`` tracks the corpus BY DEFAULT: when None (the default) it
    is ``max(WINNOW_MAX_DF, n_docs // df_scale)`` from one cheap
    count() of the input (a count-star over parquet reads only
    footers), so duplicate families that outgrow the fixed floor still
    surface their overlap pairs as the corpus scales — a fixed cut
    under-detects when families grow past it (at sf0.1 the synthetic
    families exceed 50). Exact-dup collapse first
    (``corpus.dedup_keep_manifest`` ordering) also keeps families small
    before this operator runs. Pass an explicit ``max_df`` to skip the
    count (e.g. when the caller already knows the corpus size).
    """
    if threshold <= 0:
        raise ValueError("winnow_overlap_pairs requires threshold > 0")
    if max_df is None:
        max_df = max(WINNOW_MAX_DF, df.count() // df_scale)
    # the pandas-UDF fingerprint pass feeds sizes, the df cut and the
    # join — localCheckpoint so it runs once
    fps = winnow_fingerprints(
        df, id_col=id_col, text_col=text_col, k=k, window=window
    ).localCheckpoint(eager=False)
    sizes = fps.groupBy(id_col).agg(F.count("*").alias("_n"))
    dfreq = fps.groupBy("fingerprint").agg(F.count("*").alias("_df"))
    bounded = (
        fps.join(dfreq, "fingerprint")
        .filter(F.col("_df") <= max_df)
        .drop("_df")
        # both self-join sides read this — checkpoint so the df-cut join
        # runs once, not per side
        .localCheckpoint(eager=False)
    )
    a = bounded.select("fingerprint", F.col(id_col).alias("id_a"))
    b = bounded.select("fingerprint", F.col(id_col).alias("id_b"))
    inter = (
        a.join(b, "fingerprint")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("_inter"))
    )
    na = sizes.select(F.col(id_col).alias("id_a"), F.col("_n").alias("_na"))
    nb = sizes.select(F.col(id_col).alias("id_b"), F.col("_n").alias("_nb"))
    containment = F.col("_inter").cast("double") / F.least("_na", "_nb")
    return (
        inter.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a", "id_b", F.round(containment, 6).alias("containment")
        )
        .filter(F.col("containment") >= threshold)
    )


def q_winnow_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial-overlap pairs (winnowed-fingerprint containment >=
    WINNOW_CONTAINMENT, corpus-scaled df cut: fingerprints in more than
    max(WINNOW_MAX_DF, n_docs // WINNOW_DF_SCALE) docs drop)."""
    return (
        winnow_overlap_pairs(_docs(spark, sf_dir))
        .select(
            F.col("id_a").alias("doc_a"),
            F.col("id_b").alias("doc_b"),
            "containment",
        )
        .orderBy("doc_a", "doc_b")
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


def _minhash_expr(seed: int, text_col: str = "text"):
    """Unaliased MinHash element: min of md5(seed || '|' || token).

    Permutation ``seed`` = lexicographic order of the seeded md5 string;
    engine-agnostic (Spark and DuckDB produce identical md5 hex).
    """
    toks = F.array_distinct(_tokens_col() if text_col == "text" else _text_tokens(text_col))

    # NB: the lambda must take exactly one arg — F.transform treats a
    # two-arg lambda as (element, index).
    return F.array_min(
        F.transform(toks, lambda t: F.md5(F.concat(F.lit(f"{seed}|"), t)))
    )


def _text_tokens(text_col: str):
    from readability_ex_spark.operators.tokenize import ws_tokens

    return ws_tokens(text_col)


def minhash_signature(n_sig: int = N_MINHASH_SIG):
    """MinHash signature columns over whitespace tokens."""
    return [_minhash_expr(i).alias(f"sig{i}") for i in range(n_sig)]


def _band_hash_expr(band: int, rows_per_band: int, text_col: str = "text"):
    """Band hash = md5 of the '|'-joined r signature elements of the band.

    ``F.concat`` (not concat_ws) so a NULL signature (empty doc)
    propagates to a NULL band hash — matching DuckDB `||` semantics;
    NULL bands are filtered before the candidate join.
    """
    parts: list = []
    for k in range(rows_per_band):
        if k:
            parts.append(F.lit("|"))
        parts.append(_minhash_expr(band * rows_per_band + k, text_col))
    return F.md5(F.concat(*parts))


def lsh_band_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_bands: int = N_LSH_BANDS,
    rows_per_band: int = N_LSH_ROWS,
    max_bucket: int = MAX_BAND_BUCKET,
) -> DataFrame:
    """b-bands × r-rows MinHash-LSH candidate pairs, OR-ed across bands.

    The scale shape of near-dedup at 100 TB:

    - explode each doc to b tiny (id, band_id, band_hash) rows — b× row
      multiplication but each row is ~40 bytes, so the shuffle stays
      proportional to the doc COUNT, not the corpus size;
    - drop buckets larger than ``max_bucket`` BEFORE the self-join. A
      boilerplate bucket (parked domains, empty pages) is quadratic in
      its size — at crawl scale one bucket of 10^6 urls would emit
      5·10^11 pairs in a single task. Dropped-bucket members are
      near-identical by construction, so the linear-cost exact-dup
      manifest covers them — ``corpus.dedup_keep_manifest`` composes the
      two stages in that order (exact collapse first, LSH on survivors),
      so the fallback is code, not a caller obligation;
    - self-join per (band_id, band_hash) bucket, OR the bands together
      with a pair-distinct. Recall at Jaccard j is 1-(1-j^r)^b vs j^r
      for a single band.

    Returns distinct (id_a, id_b) with id_a < id_b.
    """
    # localCheckpoint: the b*r seeded-md5 signature pass (interpreted
    # HOF lambdas over every token — the expensive part) runs ONCE; the
    # bucket-count branch and both self-join sides reuse the tiny
    # (id, band_id, band_hash) blocks instead of re-scanning the corpus
    # (without it the plan re-scans the source 8-12x). Blocks are freed
    # when the DataFrame is GC'd.
    bands = _band_blocks(df, id_col, text_col, n_bands, rows_per_band)
    # Bucket-size cap: one extra agg on the same (band_id, band_hash)
    # keys — AQE reuses the exchange, so the cap costs no extra shuffle.
    counts = bands.groupBy("band_id", "band_hash").agg(F.count("*").alias("_n"))
    bounded = (
        bands.join(counts, ["band_id", "band_hash"])
        .filter(F.col("_n") <= max_bucket)
        .drop("_n")
        # both self-join sides read this — checkpoint so the bucket-count
        # join runs once (bands alone was already checkpointed, but the
        # count+join subtree still re-ran per side)
        .localCheckpoint(eager=False)
    )
    a = bounded.select(F.col(id_col).alias("id_a"), "band_id", "band_hash")
    b = bounded.select(F.col(id_col).alias("id_b"), "band_id", "band_hash")
    return (
        a.join(b, ["band_id", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def band_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_bands: int = N_LSH_BANDS,
    rows_per_band: int = N_LSH_ROWS,
) -> DataFrame:
    """(id, band_id, band_hash) rows — the banded-LSH block table of one
    frame (the explode stage of lsh_band_candidates, factored so the
    cross-corpus variant builds both sides with identical hashes).

    This is also the PERSISTABLE index shape for incremental updates:
    a corpus build writes these rows once (``prepare_corpus.py`` ->
    ``{output}/_bands``) and every later ``--update`` batch equality-joins
    against the stored table instead of re-banding the whole corpus —
    the artifact is ~40 bytes × b per document, independent of text
    size, so at 100 TB it is a small fraction of the corpus.

    The b×r seeded-md5 signature pass runs as ONE Arrow pandas UDF over
    the (JVM-tokenized) distinct-token arrays, not as b×r interpreted
    ``transform`` lambdas (which re-hashed every token once per
    signature element — the BENCH/BASELINE.md HOF rule; measured
    1.5 s -> 0.3 s at sf0.1).  Bit-exact to the expression form it
    replaces and to the DuckDB oracle: hashlib md5 hex == Spark md5 ==
    DuckDB md5 on utf-8 bytes; the per-seed signature is the
    lexicographic min of those hex strings (Python ``min`` on ASCII hex
    == Spark ``array_min`` binary collation); the band hash is md5 of
    the '|'-joined signatures, with an empty token set yielding a NULL
    band (the F.concat NULL-propagation contract).  Per-(seed, token)
    digests memoize across a task's batches — vocab is Zipfian, so
    each distinct token hashes n_seeds times per task, not per
    document."""
    from pyspark.sql.functions import pandas_udf

    n_seeds = n_bands * rows_per_band
    seed_pre = [f"{s}|".encode() for s in range(n_seeds)]
    _memo: dict[str, list[str]] = {}

    @pandas_udf("array<string>")
    def _bands(toks: pd.Series) -> pd.Series:
        from hashlib import md5

        memo = _memo
        out = []
        for arr in toks:
            if arr is None or len(arr) == 0:
                out.append([None] * n_bands)
                continue
            uniq = set(arr)
            sig = [None] * n_seeds
            for tok in uniq:
                digs = memo.get(tok)
                if digs is None:
                    tb = tok.encode("utf-8")
                    digs = [
                        md5(seed_pre[s] + tb).hexdigest()
                        for s in range(n_seeds)
                    ]
                    memo[tok] = digs
                for s in range(n_seeds):
                    d = digs[s]
                    if sig[s] is None or d < sig[s]:
                        sig[s] = d
            out.append(
                [
                    md5(
                        "|".join(
                            sig[j * rows_per_band + k]
                            for k in range(rows_per_band)
                        ).encode("utf-8")
                    ).hexdigest()
                    for j in range(n_bands)
                ]
            )
        return pd.Series(out)

    toks_col = _tokens_col() if text_col == "text" else _text_tokens(text_col)
    return (
        df.select(
            F.col(id_col),
            F.posexplode(_bands(toks_col)).alias("band_id", "band_hash"),
        )
        .filter(F.col("band_hash").isNotNull())
        .select(id_col, F.col("band_id").cast("int").alias("band_id"), "band_hash")
    )


def _band_blocks(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_bands: int,
    rows_per_band: int,
) -> DataFrame:
    """``band_index`` checkpointed: the signature pass (the expensive
    part) runs once even when the plan consumes the blocks several
    times (bucket-count branch + both self-join sides)."""
    return band_index(df, id_col, text_col, n_bands, rows_per_band).localCheckpoint(
        eager=False
    )


def cross_near_dup_matches(
    batch: DataFrame,
    existing: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    n_bands: int = N_LSH_BANDS,
    rows_per_band: int = N_LSH_ROWS,
    max_bucket: int = MAX_BAND_BUCKET,
    existing_bands: DataFrame | None = None,
    existing_partition_col: str | None = None,
    partition_of=None,
) -> DataFrame:
    """Batch docs that near-duplicate an EXISTING corpus doc: the
    cross-corpus variant of banded MinHash-LSH, for incremental updates
    (a new crawl's paraphrase of an already-kept page should not append).

    Candidates = equality join of the two frames' band blocks on
    (band_id, band_hash) — the batch side is small, the existing side's
    blocks are linear in corpus size and capped per bucket like the
    self-join path (over-cap boilerplate buckets are the exact
    manifest's job). Verify = exact shingle Jaccard on the candidate
    pairs only, with the existing side's shingle computation semi-joined
    down to CANDIDATE ids first — only pages that collided in some band
    ever have their text read and shingled, a point lookup into the
    url-bucketed corpus rather than a linear pass.

    ``existing_bands``: a persisted ``band_index`` table for the
    existing side (``(id_col, band_id, band_hash)`` — what
    ``prepare_corpus.py`` writes as ``{output}/_bands``).  When given,
    the existing corpus is NOT re-banded — its text is only touched for
    verify candidates — which is the difference between an incremental
    update that scales with the BATCH and one that re-reads the world.

    ``existing_partition_col`` + ``partition_of``: when the existing
    corpus is stored partitioned by a derivable key (e.g.
    ``url_bucket = pmod(xxhash64(url), 64)``), pass the column name and
    the ``id -> partition value`` expression builder; the candidates'
    bounded partition-value set is then collected driver-side and the
    verify read statically partition-prunes to those partitions — the
    existing text scan touches only the candidates' buckets instead of
    every file.  Returns distinct batch ids (``id_col``) to drop.
    """
    bb = _band_blocks(batch, id_col, text_col, n_bands, rows_per_band)
    if existing_bands is not None:
        eb = existing_bands.select(id_col, "band_id", "band_hash")
    else:
        eb = _band_blocks(existing, id_col, text_col, n_bands, rows_per_band)
    counts = eb.groupBy("band_id", "band_hash").agg(
        F.count("*").alias("_n")
    )
    eb = eb.join(counts, ["band_id", "band_hash"]).filter(
        F.col("_n") <= max_bucket
    ).drop("_n")
    cand = (
        bb.select(F.col(id_col).alias("_batch_id"), "band_id", "band_hash")
        .join(
            eb.select(
                F.col(id_col).alias("_existing_id"), "band_id", "band_hash"
            ),
            ["band_id", "band_hash"],
        )
        .select("_batch_id", "_existing_id")
        .distinct()
        # candidates feed the verify join AND the existing-side shingle
        # pruning below — checkpoint so the band join runs once
        .localCheckpoint(eager=False)
    )
    bsh = batch.select(
        F.col(id_col).alias("_batch_id"),
        shingle_expr(text_col).alias("_sh_b"),
    )
    cand_ids = cand.select(F.col("_existing_id").alias(id_col)).distinct()
    if existing_partition_col is not None and partition_of is not None:
        # static partition pruning for the verify read: the candidates'
        # partition-value set is bounded by the layout's bucket count,
        # so collecting it driver-side is a bounded action (the same
        # pattern as the materialized-ANN probe), and the resulting
        # isin() reaches the scan as a PartitionFilter — the existing
        # text scan touches only candidate buckets instead of every
        # file. (Dynamic partition pruning cannot see through the
        # checkpointed candidate table, so the static filter is the
        # reliable route.)
        buckets = [
            r[0]
            for r in cand_ids.select(
                partition_of(F.col(id_col)).alias("_b")
            ).distinct().collect()
        ]
        existing = existing.filter(
            F.col(existing_partition_col).isin(buckets)
            if buckets
            else F.lit(False)
        )
    esh = (
        existing.join(cand_ids, [id_col], "left_semi")
        .select(
            F.col(id_col).alias("_existing_id"),
            shingle_expr(text_col).alias("_sh_e"),
        )
    )
    verified = (
        cand.join(bsh, "_batch_id")
        .join(esh, "_existing_id")
        .withColumn(
            "_jac",
            F.when(
                F.size(F.array_union("_sh_b", "_sh_e")) > 0,
                F.size(F.array_intersect("_sh_b", "_sh_e")).cast("double")
                / F.size(F.array_union("_sh_b", "_sh_e")),
            ).otherwise(F.lit(0.0)),
        )
        .filter(F.col("_jac") >= threshold)
    )
    return verified.select(
        F.col("_batch_id").alias(id_col)
    ).distinct()


# deterministic corpus split for the oracle-checked cross-corpus query:
# doc_id % CROSS_SPLIT_MOD == 0 plays the incoming batch, the rest the
# existing corpus — real dup families in the synthetic tables straddle
# the split, so the query exercises genuine cross-side matches
CROSS_SPLIT_MOD = 4
CROSS_NEAR_DUP_THRESHOLD = 0.5


def q_cross_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch docs near-duplicating the existing side of a deterministic
    corpus split (the incremental-update drop verdict, oracle-checked:
    banding, existing-side bucket cap, and shingle-Jaccard verify all
    recomputed by DuckDB)."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    batch = docs.filter(F.col("doc_id") % CROSS_SPLIT_MOD == 0)
    existing = docs.filter(F.col("doc_id") % CROSS_SPLIT_MOD != 0)
    return cross_near_dup_matches(
        batch, existing, threshold=CROSS_NEAR_DUP_THRESHOLD
    ).orderBy("doc_id")


def q_minhash_sig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document MinHash signature (oracle-checked width-4 variant)."""
    docs = _docs(spark, sf_dir)
    return docs.select("doc_id", *minhash_signature()).orderBy("doc_id")


def q_minhash_band_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """b×r LSH banding: candidate near-dup pairs sharing any band bucket,
    with buckets capped at MAX_BAND_BUCKET (drops quadratic boilerplate
    buckets — their members are covered by the exact-dup manifest)."""
    docs = _docs(spark, sf_dir)
    return (
        lsh_band_candidates(docs)
        .select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"))
        .orderBy("doc_a", "doc_b")
    )


def near_dup_verified_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    n_bands: int = N_LSH_BANDS,
    rows_per_band: int = N_LSH_ROWS,
    max_bucket: int = MAX_BAND_BUCKET,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: b×r capped band candidates ->
    exact token-set Jaccard verification >= ``threshold``. Returns
    (id_a, id_b, jaccard) with id_a < id_b.

    The scale shape: candidates come from the capped band join (never
    O(n^2), never quadratic in a boilerplate bucket), the exact verify
    runs only within candidate pairs."""
    cands = lsh_band_candidates(
        df,
        id_col=id_col,
        text_col=text_col,
        n_bands=n_bands,
        rows_per_band=rows_per_band,
        max_bucket=max_bucket,
    )
    toks = df.select(
        F.col(id_col), F.array_distinct(_text_tokens(text_col)).alias("toks")
    )
    pairs = (
        cands.join(
            toks.select(
                F.col(id_col).alias("id_a"), F.col("toks").alias("toks_a")
            ),
            "id_a",
        )
        .join(
            toks.select(
                F.col(id_col).alias("id_b"), F.col("toks").alias("toks_b")
            ),
            "id_b",
        )
    )
    inter = F.size(F.array_intersect("toks_a", "toks_b"))
    union = F.size(F.array_union("toks_a", "toks_b"))
    jac = F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))
    return (
        pairs.select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def q_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs (capped b×r bands, Jaccard >= 0.8)."""
    return (
        near_dup_verified_pairs(_docs(spark, sf_dir))
        .select(
            F.col("id_a").alias("doc_a"),
            F.col("id_b").alias("doc_b"),
            "jaccard",
        )
        .orderBy("doc_a", "doc_b")
    )


def corpus_top_ngrams(
    docs: DataFrame,
    n: int = 2,
    k: int = 50,
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` corpus ``n``-grams by occurrence count (ties broken
    bytewise) — the corpus-analysis table (Google-ngrams shape) behind
    boilerplate review and tokenizer-vocabulary sanity checks.

    Plan: stride-1 n-gram strings per doc (a short-array higher-order
    transform — per the BENCH HOF rule, fine at dozens-to-hundreds of
    lambdas per row), ONE token-scale hash agg (map-side combined), and
    a global top-k over the gram-cardinality table (TakeOrdered — no
    full sort materialization).  Output ``(gram, c)``.
    """
    from readability_ex_spark.operators.tokenize import ws_tokens

    toks = ws_tokens(text_col)
    n_grams = F.size(toks) - F.lit(n - 1)
    grams = F.when(
        n_grams > 0,
        F.transform(
            F.sequence(F.lit(0), n_grams - 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        docs.select(F.explode(grams).alias("gram"))
        .groupBy("gram")
        .agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc(), F.col("gram").asc())
        .limit(k)
    )


def q_top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return corpus_top_ngrams(docs, n=2, k=50)


# Version of the content-hash rule below. Bumped to 2 when NULL text
# started coalescing to '' (rule 1 let Spark's concat NULL the row and
# bit_xor skip it). A `_checksums` sidecar only verifies against the
# rule that wrote it — consumers compare this against the
# `checksum_rule` pinned in `_sidecars.json` params and refuse
# cross-rule comparisons instead of reporting phantom drift.
CONTENT_HASH_RULE = 2


def content_hash60(id_col, text_col) -> "F.Column":
    """Order-independent-aggregatable 60-bit content hash: the first 15
    hex chars of md5(id|text) parsed as a long.  md5 + hex-parse are
    byte-identical in Spark (``conv``) and DuckDB (``CAST('0x…')``),
    unlike xxhash64 — the engine-portable ingredient a checksum oracle
    needs.  60 bits so the parse never overflows a signed 64-bit int.

    NULL text coalesces to '' so the row still contributes its id to
    the checksum (Spark ``concat`` would otherwise return NULL and
    ``bit_xor`` would silently skip the row — two corpora differing
    only in NULL-text rows' ids would checksum identically), and so
    both engines agree (DuckDB ``concat`` skips NULLs instead)."""
    payload = F.concat(
        F.col(id_col).cast("string"),
        F.lit("|"),
        F.coalesce(F.col(text_col), F.lit("")),
    )
    return F.conv(F.substring(F.md5(payload), 1, 15), 16, 10).cast("long")


def corpus_checksums(
    df: DataFrame,
    id_col: str = "url",
    text_col: str = "text",
    bucket_expr=None,
    n_buckets: int = 16,
) -> DataFrame:
    """Per-bucket integrity rollup: ``(bucket, n_docs, content_xor)``
    where ``content_xor`` is the BIT_XOR of each row's 60-bit content
    hash — order-independent (XOR commutes), so the checksum of a
    shard is stable across task scheduling, and any single changed /
    dropped / duplicated row flips it.  The verification a corpus
    consumer runs before training: one map + one hash agg, no text
    ever leaves the executor.  ``bucket_expr`` defaults to a pmod of
    the id hash; pass the corpus's own storage-partition column to
    checksum physical shards."""
    bucket = (
        bucket_expr
        if bucket_expr is not None
        else F.pmod(F.xxhash64(id_col), F.lit(n_buckets)).cast("int")
    )
    return (
        df.select(
            bucket.alias("bucket"),
            content_hash60(id_col, text_col).alias("_h"),
        )
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.bit_xor("_h").alias("content_xor"),
        )
    )


def q_corpus_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard-integrity checksums over the documents table, bucketed by
    the portable ``doc_id % 16`` so the oracle shares the arithmetic."""
    docs = _docs(spark, sf_dir)
    return corpus_checksums(
        docs,
        id_col="doc_id",
        text_col="text",
        bucket_expr=F.pmod(F.col("doc_id"), F.lit(16)).cast("int"),
    ).orderBy("bucket")


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


APPROX_TOL = 0.05  # documented relative tolerance for the HLL sketch


def q_corpus_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-scale cardinality rollup: per-language doc counts with
    ``approx_count_distinct`` (HLL++) source cardinality.

    At 10^12 rows an exact countDistinct shuffles every distinct value;
    the HLL sketch aggregates in fixed memory with map-side combine —
    the SURVEY §2.B shape for monitoring-table cardinalities. The raw
    sketch estimate is engine-specific (Spark HLL++ vs DuckDB HLL), so
    the checked contract is the exact count plus a boolean asserting the
    sketch landed within APPROX_TOL of it — the tolerance is the
    documented hash strategy for the approx column (rsd=0.02 keeps the
    estimator well inside 5% at any cardinality the sf tables reach).
    """
    docs = _docs(spark, sf_dir)
    ex = F.countDistinct("source")
    ap = F.approx_count_distinct("source", rsd=0.02)
    return (
        docs.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            ex.alias("n_sources_exact"),
            (
                F.abs(ap.cast("double") - ex.cast("double"))
                <= F.lit(APPROX_TOL) * ex.cast("double")
            ).alias("approx_within_tol"),
        )
        .orderBy("lang")
    )


W_SHINGLE = 5  # words per shingle for the oracle-checked variant
MAX_SOURCE_BLOCK = 500  # blocks larger than this are dropped (see docstring)


def shingle_expr(text_col: str = "text", w: int = W_SHINGLE):
    """Distinct hashed w-word shingles — the real MinHash input unit.

    Shingle i = tokens[i..i+w-1] joined by one space, then reduced to
    the first 16 hex chars of its md5: set operations over fixed 16-char
    tokens are ~2x cheaper than over raw multi-word strings, Jaccard is
    unchanged modulo 2^-64 collisions, and md5 keeps the DuckDB oracle
    exact. Docs shorter than w tokens have an empty shingle set (they
    can't be near-dups of anything at shingle granularity).

    The tokenization stays JVM-side (the expression the oracle mirrors);
    the per-window md5 runs in an Arrow-vectorized pandas UDF producing
    the IDENTICAL strings — the original `transform(sequence(...), md5)`
    higher-order expression is interpreted and measured ~25 µs/gram
    (4.5–6.8 s for 210–250k grams at sf0.1); hashlib in a plain loop is
    ~50× cheaper (the BENCH/BASELINE.md HOF rule, third application).
    First-occurrence order is preserved like array_distinct; every
    consumer treats the result as a set.
    """
    from hashlib import md5 as _md5

    from pyspark.sql.functions import pandas_udf

    # NO cross-document digest memo here, unlike band_index/winnow: a
    # w>=5-token window is nearly unique outside dup families (13-gram
    # decontamination measured 1.2x SLOWER with a memo — the dict of
    # long string keys was pure miss overhead)

    @pandas_udf("array<string>")
    def _sh(tok_arrs: pd.Series) -> pd.Series:
        out = []
        for toks in tok_arrs:
            if toks is None or len(toks) < w:
                out.append([])
                continue
            seen: set[str] = set()
            res: list[str] = []
            join = " ".join
            for i in range(len(toks) - w + 1):
                h = _md5(
                    join(toks[i : i + w]).encode("utf-8")
                ).hexdigest()[:16]
                if h not in seen:
                    seen.add(h)
                    res.append(h)
            out.append(res)
        return pd.Series(out)

    return _sh(_text_tokens(text_col))


def shingle_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    block_col: str = "source",
    text_col: str = "text",
    w: int = W_SHINGLE,
    threshold: float = 0.5,
    max_block: int = MAX_SOURCE_BLOCK,
) -> DataFrame:
    """w-shingle Jaccard for same-block doc pairs (blocked near-dup).

    Verify plan = inverted-index count join: explode each doc's shingle
    set to (block, shingle, id) rows, self-join on (block, shingle), and
    count shared shingles per pair => |A∩B|; |A∪B| = n_a + n_b − |A∩B|
    from the pre-computed set sizes. Work is proportional to
    CO-OCCURRING shingles instead of pairs × array length — the previous
    per-pair array_intersect/array_union over ~450-element arrays
    measured ~10× slower at sf0.1 (18 s vs the pack). Requires
    ``threshold > 0``: the index only surfaces pairs sharing at least
    one shingle, and J >= threshold > 0 implies a shared shingle, so no
    pair at or above any positive threshold is missed.

    Blocking key = ``block_col`` (in the page pipeline: host). The
    within-block shingle join is quadratic in a shingle's block
    frequency, so blocks larger than ``max_block`` are dropped — at
    crawl scale one mega-host (e.g. a blog platform) would otherwise put
    10^7 docs behind one key and emit 10^13 pairs. Dropped blocks are
    routed through the LSH path by ``corpus.dedup_keep_manifest`` /
    ``near_dup_pairs_with_fallback`` (``lsh_band_candidates`` caps
    per-bucket work regardless of host size).
    """
    if threshold <= 0:
        raise ValueError(
            "shingle_jaccard_pairs requires threshold > 0 (the inverted "
            "index only surfaces pairs sharing at least one shingle)"
        )
    # localCheckpoint: the shingle construction (interpreted HOF lambdas,
    # the expensive part) runs once; the block-count branch and the
    # inverted-index explode reuse the materialized blocks instead of
    # recomputing it 3-4x. Blocks are freed when the DataFrame is GC'd.
    t = df.select(
        F.col(block_col).alias("_block"),
        F.col(id_col),
        shingle_expr(text_col, w).alias("_sh"),
    ).localCheckpoint(eager=False)
    counts = t.groupBy("_block").agg(F.count("*").alias("_n"))
    bounded = (
        t.join(counts, "_block").filter(F.col("_n") <= max_block).drop("_n")
        # both inverted-index sides explode this — checkpoint so the
        # block-count join runs once, not per side (t alone was already
        # checkpointed; the arrays are pre-explode, so the blocks stay
        # small)
        .localCheckpoint(eager=False)
    )
    inv = bounded.select(
        "_block",
        F.col(id_col).alias("_id"),
        F.size("_sh").alias("_sz"),
        F.explode("_sh").alias("_shingle"),
    )
    a = inv.select(
        "_block",
        "_shingle",
        F.col("_id").alias("id_a"),
        F.col("_sz").alias("_na"),
    )
    b = inv.select(
        "_block",
        "_shingle",
        F.col("_id").alias("id_b"),
        F.col("_sz").alias("_nb"),
    )
    # sound size prefilter: J <= min(|A|,|B|)/max(|A|,|B|), so pairs with
    # mismatched shingle counts can never reach the threshold — drop them
    # AT the shingle join, before the pair aggregation sees them
    size_ok = F.least("_na", "_nb").cast("double") >= (
        F.lit(float(threshold)) * F.greatest("_na", "_nb")
    )
    inter = (
        a.join(b, ["_block", "_shingle"])
        .filter((F.col("id_a") < F.col("id_b")) & size_ok)
        .groupBy("id_a", "id_b", "_na", "_nb")
        .agg(F.count("*").alias("_inter"))
    )
    jac = F.col("_inter").cast("double") / (
        F.col("_na") + F.col("_nb") - F.col("_inter")
    )
    return (
        inter.select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def q_shingle_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-word-shingle Jaccard >= 0.5 for same-source pairs (capped blocks)."""
    docs = _docs(spark, sf_dir)
    return (
        shingle_jaccard_pairs(docs)
        .select(
            F.col("id_a").alias("doc_a"),
            F.col("id_b").alias("doc_b"),
            "jaccard",
        )
        .orderBy("doc_a", "doc_b")
    )


N_SIMHASH_BITS = 16
_ODD_HEX = "13579bdf"  # hex digits with lsb=1


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash per document over distinct whitespace tokens.

    Bit i uses the lsb of hex digit i of md5(token) — engine-agnostic
    (identical md5 hex in Spark and DuckDB), so the oracle can recompute
    it exactly. The legacy narrow variant of ``simhash64`` (kept for the
    16-bit column contract); like simhash64, the votes run in an
    Arrow-vectorized pandas UDF — 16 interpreted ``F.aggregate`` passes
    per doc measured ~3 ms/doc vs ~0.1 ms for hashlib + one numpy LUT
    pass (BENCH/BASELINE.md HOF rule). Tokenization stays JVM-side (the
    expression the oracle mirrors).
    """
    import numpy as np
    from hashlib import md5 as _md5

    from pyspark.sql.functions import pandas_udf

    lut = np.zeros(256, dtype=np.int32)
    for ch in _ODD_HEX:
        lut[ord(ch)] = 1

    @pandas_udf("long")
    def _sim(toks: pd.Series) -> pd.Series:
        weights = 1 << np.arange(N_SIMHASH_BITS)
        out = []
        for arr in toks:
            if arr is None:  # null text -> null tokens -> null simhash
                out.append(None)
                continue
            totals = np.zeros(N_SIMHASH_BITS, dtype=np.int64)
            for t in arr:
                hx = _md5(t.encode("utf-8")).hexdigest()[:N_SIMHASH_BITS]
                totals += 2 * lut[np.frombuffer(hx.encode(), np.uint8)] - 1
            out.append(int(((totals > 0) * weights).sum()))
        return pd.Series(out)

    docs = _docs(spark, sf_dir)
    toks = F.array_distinct(_tokens_col())
    return docs.select("doc_id", _sim(toks).alias("simhash")).orderBy("doc_id")


N_SIMHASH64_BANDS = 4  # 4 × 16-bit bands of the 64-bit simhash
SIMHASH_MAX_HAMMING = 3  # near-dup verify threshold over all 64 bits


def simhash64(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, band0..band3) 64-bit SimHash as 4 × 16-bit band columns.

    Bit g (0..63) = sign of the token-vote sum, where token t votes +1
    if hex digit g of md5(t)||md5('#'||t) has lsb=1 else -1 — the same
    engine-agnostic md5-digit trick as the 16-bit variant, widened to
    64 bits, so the DuckDB oracle recomputes it exactly. Band k packs
    bits 16k..16k+15; near-dup candidates join on any equal band
    (Hamming <= 3 over 64 bits guarantees at least one of 4 bands is
    identical — pigeonhole).

    Tokenization stays JVM-side (codegen'd split/array_distinct, the
    exact expression the oracle mirrors); the md5 votes run in an
    Arrow-vectorized pandas UDF — Spark's higher-order functions are
    interpreted, and 64 per-bit aggregates over the token array
    measured ~3 ms/doc vs ~0.1 ms for hashlib + one numpy LUT pass.
    """
    import numpy as np
    from hashlib import md5

    from pyspark.sql.functions import pandas_udf

    lut = np.zeros(256, dtype=np.int32)
    for ch in _ODD_HEX:
        lut[ord(ch)] = 1

    # per-token ±1 vote vector, memoized across the task's batches
    # (integer addition is order-independent, so memoized totals are
    # exactly the per-occurrence totals; vocab is Zipfian, so each
    # distinct token pays its two md5 calls once per task, not per doc)
    _vote_memo: dict[str, "np.ndarray"] = {}

    @pandas_udf(
        "struct<band0:bigint,band1:bigint,band2:bigint,band3:bigint>"
    )
    def _bands(toks: pd.Series) -> pd.DataFrame:
        memo = _vote_memo
        out = {f"band{k}": [] for k in range(N_SIMHASH64_BANDS)}
        weights = 1 << np.arange(16)
        for arr in toks:
            if arr is None:  # null text -> null tokens -> null bands
                for k in range(N_SIMHASH64_BANDS):
                    out[f"band{k}"].append(None)
                continue
            totals = np.zeros(64, dtype=np.int64)
            for t in arr:
                votes = memo.get(t)
                if votes is None:
                    tb = t.encode("utf-8")
                    hx = md5(tb).hexdigest() + md5(b"#" + tb).hexdigest()
                    votes = (
                        2 * lut[np.frombuffer(hx.encode(), np.uint8)] - 1
                    ).astype(np.int64)
                    memo[t] = votes
                totals += votes
            bits = totals > 0
            for k in range(N_SIMHASH64_BANDS):
                out[f"band{k}"].append(
                    int((bits[k * 16 : (k + 1) * 16] * weights).sum())
                )
        return pd.DataFrame(out)

    toks = F.array_distinct(_text_tokens(text_col))
    return df.select(F.col(id_col), _bands(toks).alias("_s")).select(
        id_col, "_s.band0", "_s.band1", "_s.band2", "_s.band3"
    )


def q_simhash64(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per document, emitted as 4 × 16-bit bands."""
    return simhash64(_docs(spark, sf_dir)).orderBy("doc_id")


def simhash_near_dup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = SIMHASH_MAX_HAMMING,
    max_bucket: int = MAX_BAND_BUCKET,
) -> DataFrame:
    """SimHash near-dup: band-bucket candidates -> Hamming verify.

    Same scale shape as MinHash-LSH: explode each doc to 4 tiny
    (id, band_id, band_val) rows, cap degenerate buckets (all-identical
    boilerplate hashes to one simhash — quadratic without the cap),
    self-join per band, pair-distinct, then verify full 64-bit Hamming
    distance <= ``max_hamming`` via bit_count(xor) on the 4 bands.
    With 4 bands, Hamming <= 3 implies at least one band matches
    (pigeonhole), so — unlike MinHash banding — the candidate stage has
    perfect recall for the verify predicate, modulo capped buckets
    (whose members are exact-ish duplicates covered by the linear
    exact-dup manifest).
    """
    # sims feeds the band explode AND both sides of the verify join —
    # localCheckpoint materializes the (pandas-UDF) signature pass once;
    # blocks are freed when the DataFrame is GC'd
    sims = simhash64(df, id_col=id_col, text_col=text_col).localCheckpoint(
        eager=False
    )
    bands = (
        sims.select(
            F.col(id_col),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(k).cast("int").alias("band_id"),
                            F.col(f"band{k}").alias("band_val"),
                        )
                        for k in range(N_SIMHASH64_BANDS)
                    ]
                )
            ).alias("b"),
        )
        .select(id_col, "b.band_id", "b.band_val")
    )
    counts = bands.groupBy("band_id", "band_val").agg(F.count("*").alias("_n"))
    bounded = (
        bands.join(counts, ["band_id", "band_val"])
        .filter(F.col("_n") <= max_bucket)
        .drop("_n")
        # both self-join sides read this — checkpoint so the band
        # explode + bucket-count join run once, not per side
        .localCheckpoint(eager=False)
    )
    a = bounded.select(F.col(id_col).alias("id_a"), "band_id", "band_val")
    b = bounded.select(F.col(id_col).alias("id_b"), "band_id", "band_val")
    cands = (
        a.join(b, ["band_id", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    sa = sims.select(
        F.col(id_col).alias("id_a"),
        *[F.col(f"band{k}").alias(f"a{k}") for k in range(N_SIMHASH64_BANDS)],
    )
    sb = sims.select(
        F.col(id_col).alias("id_b"),
        *[F.col(f"band{k}").alias(f"b{k}") for k in range(N_SIMHASH64_BANDS)],
    )
    hamming = sum(
        (
            F.bit_count(F.col(f"a{k}").bitwiseXOR(F.col(f"b{k}")))
            for k in range(N_SIMHASH64_BANDS)
        ),
        F.lit(0),
    )
    return (
        cands.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", hamming.cast("long").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


def q_simhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (Hamming <= 3 over 64 bits, capped bands)."""
    return (
        simhash_near_dup(_docs(spark, sf_dir))
        .select(
            F.col("id_a").alias("doc_a"),
            F.col("id_b").alias("doc_b"),
            "hamming",
        )
        .orderBy("doc_a", "doc_b")
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


# -- unicode text normalization (pre-tokenization canonical form) -----------
# The stage every tokenizer-bound corpus runs before counting anything:
# strip control/zero-width characters, canonicalize whitespace runs, and
# NFC-normalize so visually identical strings (precomposed vs combining
# marks) dedupe and tokenize identically. Character classes are written
# in the Java-regex ∩ RE2 dialect (two-digit \xhh escapes + literal
# chars above 0x7f) so the DuckDB oracle runs the same patterns.

# C0 controls except \t \n \r, DEL + C1 controls, zero-width + BOM
_CTRL_CLASS = (
    "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f"
    + "".join(chr(c) for c in range(0x80, 0xA0))
    + "​‌‍﻿]"
)
_WS_CLASS = "[ \\t\\n\\r\\f]+"


def normalize_text(
    df: DataFrame, text_col: str = "text", out_col: str = "text_norm"
) -> DataFrame:
    """Canonical text: control strip -> whitespace collapse -> trim ->
    NFC. The regex stages are pure codegen; NFC runs in one Arrow pass
    (``unicodedata`` — there is no JVM-side normalize expression), so
    the whole stage is a map fused into the scan, zero shuffles.
    """
    from unicodedata import normalize as _nfc

    from pyspark.sql.functions import pandas_udf

    cleaned = F.trim(
        F.regexp_replace(
            F.regexp_replace(
                F.coalesce(F.col(text_col), F.lit("")), _CTRL_CLASS, ""
            ),
            _WS_CLASS,
            " ",
        )
    )

    @pandas_udf("string")
    def _norm(s: pd.Series) -> pd.Series:
        return s.map(lambda t: _nfc("NFC", t))

    return df.withColumn(out_col, _norm(cleaned))


def q_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized-text digest per document (hash-comparable; DuckDB
    recomputes via the same regex chain + nfc_normalize)."""
    docs = _docs(spark, sf_dir)
    out = normalize_text(docs)
    return out.select(
        "doc_id",
        F.md5("text_norm").alias("norm_hash"),
        F.length("text_norm").cast("long").alias("n_chars_norm"),
        (F.col("text_norm") != F.coalesce(F.col("text"), F.lit(""))).alias(
            "changed"
        ),
    ).orderBy("doc_id")


# -- encoding quality (mojibake / replacement-char detection) ---------------
# A crawl's charset handling fails in recognizable ways: U+FFFD
# replacement characters from invalid byte sequences, stray control
# bytes, and UTF-8-decoded-as-latin1 artifacts (the "mojibake"
# signatures). These are cheap codegen counters a corpus build uses to
# route documents to re-decoding or the reject pile.

# classic UTF-8-read-as-latin1 artifacts: 'â€¦' family (punctuation) and
# 'Ã' + accented-latin continuation ('Ã©' = é, 'Ã¼' = ü, ...)
_MOJIBAKE_RE = "(â€|Ã[©¨¼±³¤¶«»¯])"
_REPLACEMENT_CHAR = "�"


def q_encoding_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document encoding-health counters: replacement chars,
    control chars, mojibake signatures, and an all-clear verdict."""
    docs = _docs(spark, sf_dir)
    c = F.coalesce(F.col("text"), F.lit(""))
    n_repl = F.regexp_count(c, F.lit(_REPLACEMENT_CHAR)).cast("long")
    n_ctrl = F.regexp_count(c, F.lit(_CTRL_CLASS)).cast("long")
    n_moji = F.regexp_count(c, F.lit(_MOJIBAKE_RE)).cast("long")
    return (
        docs.select(
            "doc_id",
            n_repl.alias("n_replacement"),
            n_ctrl.alias("n_control"),
            n_moji.alias("n_mojibake"),
            ((n_repl + n_ctrl + n_moji) == 0).alias("enc_ok"),
        )
        .orderBy("doc_id")
    )
