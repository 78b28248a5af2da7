"""Pure-Python reference oracles for the dedup/fingerprint operators:
recompute the exact same md5-based constructions row-by-row in Python
and compare with the distributed results on randomized inputs. Guards
the operators against refactoring regressions independently of the
DuckDB parity harness."""

from __future__ import annotations

import random
import re
from hashlib import md5

from readability_ex_spark.operators.textops import (
    MAX_BAND_BUCKET,
    N_LSH_BANDS,
    N_LSH_ROWS,
    K_GRAM,
    WINNOW_WINDOW,
    lsh_band_candidates,
    simhash64,
    winnow_fingerprints,
)

_WORDS = [f"w{i}" for i in range(60)]


def _random_docs(seed: int, n: int = 40):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        k = rng.randint(0, 30)
        rows.append((i, " ".join(rng.choice(_WORDS) for _ in range(k))))
    return rows


def _tokens(text: str) -> list[str]:
    t = text.strip(" ")
    if t == "":
        return []
    # mirror F.trim (spaces only) + split(\s+) — re.A because Java's
    # and RE2's \s are ASCII-classed (unicode \xa0 is NOT whitespace
    # there, unlike Python's default unicode \s)
    out, seen = [], set()
    for tok in re.split(r"\s+", t, flags=re.A):
        if tok not in seen:
            seen.add(tok)
            out.append(tok)
    return out


def _py_band_candidates(rows, n_bands=N_LSH_BANDS, rows_per_band=N_LSH_ROWS,
                        max_bucket=MAX_BAND_BUCKET):
    buckets = {}
    for doc_id, text in rows:
        toks = _tokens(text)
        if not toks:
            continue
        sigs = [
            min(md5(f"{s}|{t}".encode()).hexdigest() for t in toks)
            for s in range(n_bands * rows_per_band)
        ]
        for b in range(n_bands):
            h = md5(
                "|".join(sigs[b * rows_per_band + k] for k in range(rows_per_band))
                .encode()
            ).hexdigest()
            buckets.setdefault((b, h), []).append(doc_id)
    pairs = set()
    for members in buckets.values():
        if len(members) > max_bucket:
            continue
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                pairs.add((ms[i], ms[j]))
    return pairs


def _py_simhash64(text: str):
    toks = _tokens(text)
    totals = [0] * 64
    for t in toks:
        tb = t.encode()
        hx = md5(tb).hexdigest() + md5(b"#" + tb).hexdigest()
        for g, ch in enumerate(hx):
            totals[g] += 1 if ch in "13579bdf" else -1
    bands = []
    for k in range(4):
        v = 0
        for i in range(16):
            if totals[k * 16 + i] > 0:
                v |= 1 << i
        bands.append(v)
    return tuple(bands)


def _py_winnow(text: str, k=K_GRAM, w=WINNOW_WINDOW):
    tx = re.sub(r"\s+", " ", text.strip(" "), flags=re.A).lower()
    toks = tx.split(" ") if tx else []
    if len(toks) < k + w - 1:
        return set()
    grams = [
        md5(" ".join(toks[i : i + k]).encode()).hexdigest()
        for i in range(len(toks) - k + 1)
    ]
    return {min(grams[j : j + w]) for j in range(len(grams) - w + 1)}


def test_lsh_band_candidates_matches_python_oracle(spark):
    rows = _random_docs(seed=11)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.id_a, r.id_b) for r in lsh_band_candidates(df).collect()}
    assert got == _py_band_candidates(rows)


def test_simhash64_matches_python_oracle(spark):
    rows = _random_docs(seed=13, n=25)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.band0, r.band1, r.band2, r.band3)
        for r in simhash64(df).collect()
    }
    for doc_id, text in rows:
        assert got[doc_id] == _py_simhash64(text), doc_id


def test_winnow_matches_python_oracle(spark):
    rng = random.Random(17)
    rows = [
        (i, " ".join(rng.choice(_WORDS) for _ in range(rng.randint(0, 20))))
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {}
    for r in winnow_fingerprints(df).collect():
        got.setdefault(r.doc_id, set()).add(r.fingerprint)
    for doc_id, text in rows:
        assert got.get(doc_id, set()) == _py_winnow(text), doc_id


def test_oracles_agree_on_unicode_whitespace_and_text(spark):
    """\xa0 is NOT whitespace to Spark/DuckDB (ASCII-classed \s) —
    tokens joined by it stay one token; accents survive md5 utf-8."""
    rows = [
        (1, "caf\u00e9 ni\u00f1o caf\u00e9"),
        (2, "a\u00a0b c"),  # \xa0 glues 'a\xa0b' into one token
        (3, "\u00fcber str\u00e4\u00dfe " * 4),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got_pairs = {
        (r.id_a, r.id_b) for r in lsh_band_candidates(df).collect()
    }
    assert got_pairs == _py_band_candidates(rows)
    got_sim = {
        r.doc_id: (r.band0, r.band1, r.band2, r.band3)
        for r in simhash64(df).collect()
    }
    for doc_id, text in rows:
        assert got_sim[doc_id] == _py_simhash64(text), doc_id
    got_w = {}
    for r in winnow_fingerprints(df).collect():
        got_w.setdefault(r.doc_id, set()).add(r.fingerprint)
    for doc_id, text in rows:
        assert got_w.get(doc_id, set()) == _py_winnow(text), doc_id


def test_top_k_per_key_matches_naive_window(spark):
    """Two-stage skew-safe top-k == the naive single-window top-k on
    random data with a heavily skewed key, for several salts (the
    result must be salt-independent)."""
    from pyspark.sql import functions as F

    from readability_ex_spark.operators.relational import top_k_per_key

    rng = random.Random(11)
    rows = []
    rid = 0
    for key, n in (("huge", 500), ("mid", 40), ("tiny", 2), ("one", 1)):
        for _ in range(n):
            rows.append((rid, key, rng.randrange(100)))  # many score ties
            rid += 1
    df = spark.createDataFrame(rows, "row_id long, key string, score long")
    order = [F.col("score").desc(), F.col("row_id").asc()]

    def naive():
        out = {}
        for row_id, key, score in rows:
            out.setdefault(key, []).append((-score, row_id))
        want = []
        for key, lst in out.items():
            for rk, (neg, row_id) in enumerate(sorted(lst)[:5], start=1):
                want.append((key, row_id, -neg, rk))
        return sorted(want)

    want = naive()
    for salt in (
        None,
        F.pmod(F.xxhash64("row_id"), F.lit(4)),
        F.lit(0),  # degenerate salt: falls back to the naive shape
    ):
        got = sorted(
            (r.key, r.row_id, r.score, r.rk)
            for r in top_k_per_key(
                df, ["key"], order, k=5, salt_expr=salt
            ).collect()
        )
        assert got == want


def test_normalize_text_crafted_inputs(spark):
    """Control strip, zero-width removal, whitespace canonicalization,
    and NFC composition on crafted pathological inputs — cross-checked
    against DuckDB's nfc_normalize on the same regex chain."""
    import duckdb

    from readability_ex_spark.operators.textops import (
        _CTRL_CLASS,
        _WS_CLASS,
        normalize_text,
    )

    rows = [
        (1, "plain text"),
        (2, "a\x00b\x01c\x1fd\x7fe"),  # C0 + DEL stripped
        (3, "zero​width‌ joined﻿"),  # ZW + BOM stripped
        (4, "  runs\t\tof \n\n whitespace \f "),  # collapse + trim
        (5, "café vs café"),  # NFC: e + combining acute -> é
        (6, ""),
        (7, None),
        (8, " C1  controls "),  # C1 stripped
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.text_norm for r in normalize_text(df).collect()}
    assert got[1] == "plain text"
    assert got[2] == "abcde"
    assert got[3] == "zerowidth joined"
    assert got[4] == "runs of whitespace"
    assert got[5] == "café vs café"  # both sides composed
    assert got[6] == "" and got[7] == ""
    assert got[8] == "C1 controls"

    con = duckdb.connect()
    for doc_id, text in rows:
        want = con.execute(
            "SELECT nfc_normalize(trim(regexp_replace(regexp_replace("
            "coalesce(?, ''), ?, '', 'g'), ?, ' ', 'g')))",
            [text, _CTRL_CLASS, _WS_CLASS],
        ).fetchone()[0]
        assert got[doc_id] == want, doc_id


def test_encoding_quality_counters(spark, tmp_path):
    """Replacement-char / control / mojibake counters on crafted docs
    (via the checked query against a temp documents table)."""
    import shutil

    from readability_ex_spark.operators.textops import q_encoding_quality

    rows = [
        (1, "clean text here", "en", "s", 15),
        (2, "bad � bytes �", "en", "s", 10),
        (3, "ctrl\x01chars\x9fhere", "en", "s", 10),
        (4, "moji Ã© and â€™ artifacts", "en", "s", 20),
    ]
    d = tmp_path / "enc"
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(d / "documents.parquet"))
    try:
        out = {r.doc_id: r for r in q_encoding_quality(spark, str(d)).collect()}
    finally:
        shutil.rmtree(d, ignore_errors=True)
    assert out[1].enc_ok and out[1].n_replacement == 0
    assert out[2].n_replacement == 2 and not out[2].enc_ok
    assert out[3].n_control == 2 and not out[3].enc_ok
    assert out[4].n_mojibake == 2 and not out[4].enc_ok


def test_top_k_per_key_handles_fewer_rows_than_k(spark):
    from pyspark.sql import functions as F

    from readability_ex_spark.operators.relational import top_k_per_key

    df = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20)], "row_id long, key string, score long"
    )
    got = top_k_per_key(
        df, ["key"], [F.col("score").desc(), F.col("row_id").asc()], k=5
    ).collect()
    assert [(r.row_id, r.rk) for r in sorted(got, key=lambda r: r.rk)] == [
        (2, 1),
        (1, 2),
    ]
