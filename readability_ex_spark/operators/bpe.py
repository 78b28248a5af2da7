"""Minimal trained byte-pair-encoding tokenizer, Spark-first.

Everywhere else in this engine "tokens" are the whitespace/regex proxy
(``textops``) — engine-portable, but a real training run consumes BPE
units, and the proxy drifts 20-40% against any learned vocabulary
(the unit ``token_budget_pack`` / ``shard_assign`` budgets actually
mean).  This module closes that gap with the classic Sennrich et al.
2016 merge-learning loop (stdlib only):

- **train** on a bounded, deterministic sample DRIVER-side (word
  frequencies -> repeatedly merge the most frequent adjacent symbol
  pair; ties broken lexicographically, so training is reproducible);
- **apply** corpus-wide as pure JVM codegen: each learned symbol is
  assigned one PRIVATE-USE character (U+E000..), which makes every
  merge a literal 2-char -> 1-char ``replace`` — the whole tokenizer
  becomes a chain of ``replace()`` calls fused into the scan, with
  **zero Python in the hot path** and zero shuffle.  Token count =
  non-space character count of the encoded string.

The single-char symbol alphabet is what makes the replace-chain
CORRECT: any 2-character window of the encoding IS an adjacent symbol
pair, so a rule can never match across symbol boundaries (a
multi-char-symbol encoding could — e.g. rule "a c" inside "ba c"),
and ``replace``'s left-to-right non-overlapping semantics are exactly
the reference implementation's within-word merge order.  Merges never
contain the space separator, so they never cross word boundaries.

The same replace chain is valid DuckDB SQL, so the oracle twin inlines
the learned merge table verbatim (``bpe_count_sql``).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

# learned symbols are assigned from the BMP private-use area; input
# text is stripped of that range first (both engines) so a corpus
# character can never collide with a symbol id
_PRIVATE_FIRST = 0xE000
_PRIVATE_RE = r"[\x{E000}-\x{F8FF}]"

N_MERGES = 64  # enough to absorb the high-frequency pairs of a crawl
TRAIN_SAMPLE_ROWS = 400  # bounded driver-side training sample


@dataclass(frozen=True)
class BpeModel:
    """A learned merge list + the single-char symbol encoding.

    ``merges``: ``(left, right)`` symbol strings in learned order.
    ``rules``: the same merges as ``(two_char_pattern, one_char_id)``
    literal replacements.  ``symbols``: private char -> underlying
    string (for decoding tokens).
    """

    merges: tuple[tuple[str, str], ...]
    rules: tuple[tuple[str, str], ...]
    symbols: dict[str, str]

    def count_expr(self, text_col: str = "text") -> Column:
        """BPE token count as a pure codegen Column (no UDF): strip
        private-use chars, canonicalize whitespace, run the replace
        chain, count non-space chars."""
        c = F.col(text_col)
        enc = self.encode_expr(text_col)
        n = F.length(F.regexp_replace(enc, " ", ""))
        return (
            F.when(c.isNull() | (F.trim(c) == ""), F.lit(0))
            .otherwise(n)
            .cast("long")
        )

    def encode_expr(self, text_col: str = "text") -> Column:
        base = F.regexp_replace(
            F.regexp_replace(F.trim(F.col(text_col)), _PRIVATE_RE, ""),
            r"\s+",
            " ",
        )
        return reduce(
            lambda col, rule: F.replace(col, F.lit(rule[0]), F.lit(rule[1])),
            self.rules,
            base,
        )

    def encode_word(self, word: str) -> list[str]:
        """Driver/test-side single-word tokenization (same rules)."""
        s = "".join(ch for ch in word if not 0xE000 <= ord(ch) <= 0xF8FF)
        for pat, rep in self.rules:
            s = s.replace(pat, rep)
        return [self.symbols.get(ch, ch) for ch in s]


def train_bpe(texts: list[str], n_merges: int = N_MERGES) -> BpeModel:
    """Classic BPE merge learning over whitespace-split words
    (Sennrich et al. 2016, alg. 1), deterministic: the most frequent
    pair wins each round, ties broken by lexicographic pair order; a
    pair must occur at least twice to merge."""
    from collections import Counter

    wordfreq: Counter[str] = Counter()
    for t in texts:
        if t:
            wordfreq.update(t.split())
    # drop private-use chars from training words (mirrors apply-side)
    seqs: dict[str, tuple[str, ...]] = {
        w: tuple(ch for ch in w if not 0xE000 <= ord(ch) <= 0xF8FF)
        for w in wordfreq
    }
    merges: list[tuple[str, str]] = []
    sym_of: dict[str, str] = {}  # symbol string -> single char id
    rules: list[tuple[str, str]] = []
    symbols: dict[str, str] = {}

    def char_of(sym: str) -> str:
        if len(sym) == 1 and not 0xE000 <= ord(sym) <= 0xF8FF:
            return sym
        return sym_of[sym]

    for i in range(n_merges):
        pairs: Counter[tuple[str, str]] = Counter()
        for w, f in wordfreq.items():
            seq = seqs[w]
            for a, b in zip(seq, seq[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        (a, b), cnt = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))
        if cnt < 2:
            break
        new = a + b
        cid = chr(_PRIVATE_FIRST + i)
        merges.append((a, b))
        sym_of[new] = cid
        symbols[cid] = new
        rules.append((char_of(a) + char_of(b), cid))
        for w, seq in seqs.items():
            out: list[str] = []
            j = 0
            while j < len(seq):
                if j + 1 < len(seq) and seq[j] == a and seq[j + 1] == b:
                    out.append(new)
                    j += 2
                else:
                    out.append(seq[j])
                    j += 1
            seqs[w] = tuple(out)
    return BpeModel(tuple(merges), tuple(rules), symbols)


def train_bpe_on_documents(
    path: str = "/root/testdata/sf0.001/documents.parquet",
    n_merges: int = N_MERGES,
    sample_rows: int = TRAIN_SAMPLE_ROWS,
) -> BpeModel:
    """Train on a pinned, deterministic sample (lowest ``sample_rows``
    doc_ids of the given table) WITHOUT a SparkSession — the model is a
    fixed artifact like a production tokenizer, identical no matter
    which scale factor it is later applied to (and buildable inside
    ``oracle_sql()``, which has no session).  pyarrow keeps this a
    column-pruned local read."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(path, columns=["doc_id", "text"])
    rows = sorted(
        zip(tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist())
    )[:sample_rows]
    return train_bpe([t for _, t in rows], n_merges=n_merges)


def bpe_count_sql(model: BpeModel, text_col: str = "text") -> str:
    """The DuckDB twin of :meth:`BpeModel.count_expr` with the merge
    table inlined as a literal replace chain."""
    base = (
        f"regexp_replace(regexp_replace(trim({text_col}), "
        f"'{_PRIVATE_RE}', '', 'g'), '\\s+', ' ', 'g')"
    )
    enc = base
    for pat, rep in model.rules:
        p = pat.replace("'", "''")
        r = rep.replace("'", "''")
        enc = f"replace({enc}, '{p}', '{r}')"
    return (
        f"CASE WHEN {text_col} IS NULL OR trim({text_col}) = '' THEN 0 "
        f"ELSE length(replace({enc}, ' ', '')) END"
    )


_MODEL_CACHE: dict[tuple, BpeModel] = {}


def default_model() -> BpeModel:
    """The pinned-sample model, cached per process (training is a few
    hundred ms; the parity harness calls the query repeatedly)."""
    key = ("default",)
    if key not in _MODEL_CACHE:
        _MODEL_CACHE[key] = train_bpe_on_documents()
    return _MODEL_CACHE[key]


def q_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc trained-BPE token count next to the whitespace proxy —
    the drift between them is the correction ``token_budget_pack`` /
    ``shard_assign`` budgets need when a real tokenizer defines the
    unit."""
    from readability_ex_spark.operators.textops import _text_tokens

    model = default_model()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    c = F.col("text")
    n_ws = (
        F.when(c.isNull() | (F.trim(c) == ""), F.lit(0))
        .otherwise(F.size(_text_tokens("text")))
        .cast("long")
    )
    return docs.select(
        "doc_id",
        model.count_expr("text").alias("n_bpe_tokens"),
        n_ws.alias("n_ws_tokens"),
    ).orderBy("doc_id")
