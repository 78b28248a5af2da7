"""scripts/run_job.py end-to-end in a subprocess (the spark-submit
surface): fresh run, then resume processing zero rows."""

from __future__ import annotations

import shutil
import subprocess
import sys
import tempfile
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def jobdir(spark):
    from readability_ex_spark.sources.pages import synthesize_pages

    d = Path(tempfile.mkdtemp(prefix="job_test_"))
    synthesize_pages(spark, "/root/testdata/sf0.001").limit(120).coalesce(
        1
    ).write.mode("overwrite").parquet(str(d / "pages"))
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _run(jobdir: Path, run_id: str) -> str:
    proc = subprocess.run(
        [
            sys.executable, str(REPO / "scripts" / "run_job.py"),
            "--input", str(jobdir / "pages"),
            "--output", str(jobdir / "out"),
            "--partitions", "4",
            "--run-id", run_id,
        ],
        capture_output=True, text=True, timeout=420, cwd=str(REPO),
    )
    assert proc.returncode == 0, proc.stderr[-1500:]
    return next(
        line for line in proc.stdout.splitlines() if line.startswith("run_id=")
    )


def test_job_then_resume(jobdir, spark):
    first = _run(jobdir, "r0")
    assert "processed=" in first and "processed=0" not in first
    second = _run(jobdir, "r1")
    assert "processed=0" in second
    out = spark.read.parquet(str(jobdir / "out"))
    assert out.count() == out.select("url").distinct().count() > 0
    metrics = spark.read.parquet(str(jobdir / "out" / "_metrics"))
    assert metrics.filter("run_id = 'r0'").count() > 0
    # the north-rule text/spans artifact ships in the job output: ok
    # rows carry block spans that tile the text (verified by slicing)
    ok_rows = out.filter("status = 'ok' and spans is not null").collect()
    assert ok_rows, "no ok rows with spans in job output"
    n_spans = 0
    for r in ok_rows:
        prev_end = -1
        for s in r.spans:
            assert 0 <= s.start < s.end <= len(r.text)
            assert s.start >= prev_end
            prev_end = s.end
            n_spans += 1
    assert n_spans > 0


def test_job_assemble_chains(spark):
    """--chain-pages + --assemble-chains emits merged multi-page articles."""
    d = Path(tempfile.mkdtemp(prefix="job_chain_"))
    try:
        def page(n, total=3):
            nxt = (
                f'<a rel="next" href="/art/page/{n + 1}">Next page</a>'
                if n < total else ""
            )
            return (
                f"<html><body><article><p>page {n} body text, long enough, "
                f"with commas, to matter.</p>{nxt}</article></body></html>"
            )

        rows = [
            (f"http://s.test/art/page/{n}", None, page(n).encode(), "t", "en")
            for n in (1, 2, 3)
        ]
        spark.createDataFrame(
            rows,
            schema="url string, warc_ts timestamp, html binary, text string, lang string",
        ).coalesce(1).write.mode("overwrite").parquet(str(d / "pages"))

        proc = subprocess.run(
            [
                sys.executable, str(REPO / "scripts" / "run_job.py"),
                "--input", str(d / "pages"),
                "--output", str(d / "out"),
                "--partitions", "2",
                "--chain-pages", "5",
                "--assemble-chains",
                "--run-id", "chain0",
            ],
            capture_output=True, text=True, timeout=420, cwd=str(REPO),
        )
        assert proc.returncode == 0, proc.stderr[-1500:]
        merged = spark.read.parquet(str(d / "out" / "_assembled")).collect()
        assert len(merged) == 1 and merged[0].n_pages == 3
        assert 'id="readability-page-3"' in merged[0].content
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_extract_url_cli():
    """Single-document CLI (reference scripts/readability_url.sh): html
    in -> JSON out, --content-only prints the article HTML, non-zero
    exit when not readable."""
    import json

    fixture = Path(
        "/root/reference/test/fixtures/readability-test-pages/001/source.html"
    )
    proc = subprocess.run(
        [
            sys.executable, str(REPO / "scripts" / "extract_url.py"),
            str(fixture), "--url", "http://fakehost/test/",
        ],
        capture_output=True, text=True, timeout=120, cwd=str(REPO),
    )
    assert proc.returncode == 0, proc.stderr[-500:]
    out = json.loads(proc.stdout)
    assert out["title"] and out["content"].startswith("<div id=\"readability-page-1\"")
    assert out["length"] == len(out["text_content"])

    only = subprocess.run(
        [
            sys.executable, str(REPO / "scripts" / "extract_url.py"),
            str(fixture), "--url", "http://fakehost/test/", "--content-only",
        ],
        capture_output=True, text=True, timeout=120, cwd=str(REPO),
    )
    assert only.returncode == 0 and only.stdout == out["content"]

    empty = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "extract_url.py"), "-"],
        input="", capture_output=True, text=True, timeout=120, cwd=str(REPO),
    )
    assert empty.returncode == 1


def test_spark_submit_pyfiles(jobdir):
    """The north-rule submission surface: package.sh builds the zip and
    spark-submit --py-files runs the batch job with the library imported
    from the artifact (run_job.py is copied to an empty dir so nothing
    resolves from the repo checkout)."""
    import os

    pkg = subprocess.run(
        ["sh", str(REPO / "scripts" / "package.sh")],
        capture_output=True, text=True, timeout=120,
    )
    assert pkg.returncode == 0, pkg.stderr[-500:]
    zip_path = REPO / "readability_ex_spark.zip"
    assert zip_path.exists()

    d = Path(tempfile.mkdtemp(prefix="submit_test_"))
    try:
        shutil.copy(REPO / "scripts" / "run_job.py", d / "run_job.py")
        env = dict(os.environ)
        env.pop("PYTHONPATH", None)
        proc = subprocess.run(
            [
                "/opt/spark/bin/spark-submit",
                "--master", "local[4]",
                "--py-files", str(zip_path),
                "--conf", f"spark.sql.warehouse.dir={d / 'wh'}",
                str(d / "run_job.py"),
                "--input", str(jobdir / "pages"),
                "--output", str(d / "out"),
                "--partitions", "4",
                "--run-id", "submit0",
            ],
            capture_output=True, text=True, timeout=600, cwd=str(d), env=env,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        assert any(
            line.startswith("run_id=submit0") and "processed=" in line
            for line in proc.stdout.splitlines()
        ), proc.stdout[-1000:]
        files = list((d / "out").rglob("*.parquet"))
        assert files, "no parquet output written by spark-submit job"
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_prepare_corpus_script(jobdir, spark):
    """scripts/prepare_corpus.py end-to-end: extraction -> keep manifest
    -> quality-filtered corpus + _manifest audit artifact."""
    proc = subprocess.run(
        [
            sys.executable, str(REPO / "scripts" / "prepare_corpus.py"),
            "--input", str(jobdir / "pages"),
            "--output", str(jobdir / "corpus"),
            "--checksums",
            "--partitions", "4",
        ],
        capture_output=True, text=True, timeout=420, cwd=str(REPO),
    )
    assert proc.returncode == 0, proc.stderr[-1500:]
    assert any(
        line.startswith("corpus_docs=") for line in proc.stdout.splitlines()
    )
    corpus = spark.read.parquet(str(jobdir / "corpus"))
    manifest = spark.read.parquet(str(jobdir / "corpus" / "_manifest"))
    n_keep = manifest.filter("keep").count()
    assert corpus.count() == n_keep > 0
    # every corpus url is its own canonical
    assert {r.url for r in corpus.select("url").collect()} == {
        r.url for r in manifest.filter("keep").select("url").collect()
    }
    assert "quality_score" in corpus.columns
    # the dataset card records what was built and how
    import json as _json

    card = _json.loads(
        (jobdir / "corpus" / "_datacard" / "datacard.json").read_text()
    )
    assert card["docs"] == n_keep
    assert sum(v["docs"] for v in card["languages"].values()) == n_keep
    assert all(v["tokens"] > 0 for v in card["languages"].values())
    # per-language quality quantiles ride along with the mean
    assert all(
        0.0 <= v["p50_quality"] <= v["p90_quality"] <= 1.0
        for v in card["languages"].values()
    )
    assert card["stages"]["partitions"] == 4
    # --checksums: the sidecar matches an independent python
    # recomputation (60-bit md5-prefix XOR per storage bucket) over
    # the corpus as written
    import hashlib
    from functools import reduce

    side = {
        r.url_bucket: (r.n_docs, r.content_xor)
        for r in spark.read.parquet(
            str(jobdir / "corpus" / "_checksums")
        ).collect()
    }
    expect: dict[int, list[int]] = {}
    for r in corpus.select("url_bucket", "url", "text").collect():
        h = int(
            hashlib.md5(f"{r.url}|{r.text}".encode()).hexdigest()[:15], 16
        )
        expect.setdefault(r.url_bucket, []).append(h)
    assert side == {
        b: (len(hs), reduce(lambda a, x: a ^ x, hs, 0))
        for b, hs in expect.items()
    }


def test_prepare_corpus_script_quality_keeper(spark, tmp_path):
    """--quality-keeper ships each cluster's argmax-quality member while
    the _manifest audit keeps its 5-column schema and cluster key."""
    import datetime

    ts = datetime.datetime(2024, 6, 1)

    def page(url, body):
        html = (
            f"<html><body><article><p>{body}</p></article></body></html>"
        ).encode()
        return (url, ts, html, "", "en")

    base = " ".join(f"alpha{i} beta{i}" for i in range(30))
    extra = " ".join(f"gamma{i}" for i in range(8))
    spark.createDataFrame(
        [
            # near-dup cluster: b is longer -> higher quality score
            page("http://qk.test/a", base),
            page("http://qk.test/b", base + " " + extra),
            page("http://qk.test/solo", "standalone words " * 20),
        ],
        "url string, warc_ts timestamp, html binary, "
        "text string, lang string",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "pages"))

    out = tmp_path / "corpus"
    proc = subprocess.run(
        [
            sys.executable, str(REPO / "scripts" / "prepare_corpus.py"),
            "--input", str(tmp_path / "pages"),
            "--output", str(out),
            "--quality-keeper",
            "--partitions", "2",
        ],
        capture_output=True, text=True, timeout=420, cwd=str(REPO),
    )
    assert proc.returncode == 0, proc.stderr[-1500:]
    urls = {
        r.url for r in spark.read.parquet(str(out)).select("url").collect()
    }
    assert urls == {"http://qk.test/b", "http://qk.test/solo"}
    manifest = spark.read.parquet(str(out / "_manifest"))
    assert set(manifest.columns) == {
        "url", "fingerprint", "n_copies", "canonical_url", "keep"
    }
    rows = {r.url: r for r in manifest.collect()}
    # cluster key stays min-url even though the survivor moved
    assert rows["http://qk.test/a"].canonical_url == "http://qk.test/a"
    assert rows["http://qk.test/b"].canonical_url == "http://qk.test/a"
    assert not rows["http://qk.test/a"].keep
    assert rows["http://qk.test/b"].keep
    import json as _json

    card = _json.loads((out / "_datacard" / "datacard.json").read_text())
    assert card["stages"]["quality_keeper"] is True


def test_prepare_corpus_script_robots_txt(jobdir, spark):
    """--robots-txt drops pages an RFC 9309 rule disallows for
    --robots-agent; unlisted hosts / unmatched pages survive."""
    spark.createDataFrame(
        [("synth.test", "User-agent: corpusbot\nDisallow: /doc/1*\n")],
        "host string, robots_txt string",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(jobdir / "robots")
    )
    out = jobdir / "corpus_robots"
    proc = subprocess.run(
        [
            sys.executable, str(REPO / "scripts" / "prepare_corpus.py"),
            "--input", str(jobdir / "pages"),
            "--output", str(out),
            "--partitions", "4",
            "--robots-txt", str(jobdir / "robots"),
            "--robots-agent", "CorpusBot",
        ],
        capture_output=True, text=True, timeout=420, cwd=str(REPO),
    )
    assert proc.returncode == 0, proc.stderr[-1500:]
    ids = {
        int(r.url.rsplit("/", 1)[1])
        for r in spark.read.parquet(str(out)).select("url").collect()
    }
    assert ids, "robots filter must not drop everything"
    assert not any(str(i).startswith("1") for i in ids)
    # ids the rule does not match survive (e.g. 2x, 3x, ...)
    assert any(not str(i).startswith("1") for i in ids)


def test_prepare_corpus_script_clf_floor(spark, tmp_path):
    """--clf-model/--clf-floor keep only docs the persisted classifier
    scores above the floor."""
    import datetime
    import hashlib

    from readability_ex_spark.operators.qualityclf import (
        QualityModel,
        save_model,
    )

    ts = datetime.datetime(2024, 6, 1)
    def page(url, body):
        html = (
            f"<html><body><article><p>{body}</p></article></body></html>"
        ).encode()
        return (url, ts, html, "", "en")

    good1 = " ".join(f"steady prose word{i} of record" for i in range(30))
    good2 = " ".join(f"another essay item{i} from print" for i in range(30))
    spam_body = " ".join(["zqspam"] * 120)
    spark.createDataFrame(
        [
            page("http://clf.test/good1", good1),
            page("http://clf.test/good2", good2),
            page("http://clf.test/spam", spam_body),
        ],
        "url string, warc_ts timestamp, html binary, "
        "text string, lang string",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "pages"))

    spam_bucket = hashlib.md5(b"zqspam").hexdigest()[:2]
    save_model(
        # -10 per spam token: the all-spam doc's mean is -10 (score ~0)
        # while an accidental bucket collision in a prose doc shifts the
        # mean by at most ~-0.3 (score stays well above the floor)
        QualityModel(weights={spam_bucket: -10.0}, bias=2.0),
        spark,
        str(tmp_path / "clf"),
    )
    out = tmp_path / "corpus"
    proc = subprocess.run(
        [
            sys.executable, str(REPO / "scripts" / "prepare_corpus.py"),
            "--input", str(tmp_path / "pages"),
            "--output", str(out),
            "--partitions", "2",
            "--clf-model", str(tmp_path / "clf"),
            "--clf-floor", "0.5",
        ],
        capture_output=True, text=True, timeout=420, cwd=str(REPO),
    )
    assert proc.returncode == 0, proc.stderr[-1500:]
    urls = {
        r.url for r in spark.read.parquet(str(out)).select("url").collect()
    }
    assert urls == {"http://clf.test/good1", "http://clf.test/good2"}


def test_prepare_corpus_script_robots_from_crawl(jobdir, spark):
    """--robots-from-crawl lifts the rules off the input's own
    /robots.txt rows — same verdicts as a side table."""
    import datetime

    robots_row = spark.createDataFrame(
        [(
            "http://synth.test/robots.txt",
            datetime.datetime(2024, 6, 1),
            b"User-agent: corpusbot\nDisallow: /doc/1*\n",
            "",
            "en",
        )],
        "url string, warc_ts timestamp, html binary, "
        "text string, lang string",
    )
    pages = spark.read.parquet(str(jobdir / "pages")).unionByName(robots_row)
    pages.coalesce(1).write.mode("overwrite").parquet(
        str(jobdir / "pages_rc")
    )
    out = jobdir / "corpus_rc"
    proc = subprocess.run(
        [
            sys.executable, str(REPO / "scripts" / "prepare_corpus.py"),
            "--input", str(jobdir / "pages_rc"),
            "--output", str(out),
            "--partitions", "4",
            "--robots-from-crawl",
            "--robots-agent", "CorpusBot",
        ],
        capture_output=True, text=True, timeout=420, cwd=str(REPO),
    )
    assert proc.returncode == 0, proc.stderr[-1500:]
    ids = {
        int(r.url.rsplit("/", 1)[1])
        for r in spark.read.parquet(str(out)).select("url").collect()
        if not r.url.endswith("robots.txt")
    }
    assert ids and not any(str(i).startswith("1") for i in ids)


def test_prepare_corpus_script_lm_bands(jobdir, spark):
    """--lm-bands annotates lm_bucket per doc: every language's docs
    span band 1..K with roughly balanced shares."""
    out = jobdir / "corpus_bands"
    proc = subprocess.run(
        [
            sys.executable, str(REPO / "scripts" / "prepare_corpus.py"),
            "--input", str(jobdir / "pages"),
            "--output", str(out),
            "--partitions", "4",
            "--lm-bands", "3",
        ],
        capture_output=True, text=True, timeout=420, cwd=str(REPO),
    )
    assert proc.returncode == 0, proc.stderr[-1500:]
    corpus = spark.read.parquet(str(out))
    assert "lm_bucket" in corpus.columns
    rows = corpus.groupBy("lang", "lm_bucket").count().collect()
    buckets = {r.lm_bucket for r in rows}
    assert buckets <= {1, 2, 3} and 1 in buckets
    # the dominant language gets a real split (all three bands)
    by_lang: dict[str, set] = {}
    for r in rows:
        by_lang.setdefault(r.lang, set()).add(r.lm_bucket)
    assert any(len(v) == 3 for v in by_lang.values())


def test_prepare_corpus_script_pack_sequences(jobdir, spark):
    """--pack-seq-len writes the _sequences sidecar: every shipped doc
    tiled into fixed-length slices within its (lang, shard) windows."""
    out = jobdir / "corpus_seq"
    proc = subprocess.run(
        [
            sys.executable, str(REPO / "scripts" / "prepare_corpus.py"),
            "--input", str(jobdir / "pages"),
            "--output", str(out),
            "--partitions", "4",
            "--shard-tokens", "2000",
            "--pack-seq-len", "256",
        ],
        capture_output=True, text=True, timeout=420, cwd=str(REPO),
    )
    assert proc.returncode == 0, proc.stderr[-1500:]
    assert "sequences=packed" in proc.stdout
    seqs = spark.read.parquet(str(out / "_sequences"))
    corpus = spark.read.parquet(str(out))
    # every corpus doc with tokens appears; slices tile [0, n_tokens)
    joined = seqs.join(
        corpus.select("url", "n_tokens"), "url"
    ).collect()
    assert joined
    per_doc: dict[str, list] = {}
    for r in joined:
        per_doc.setdefault(r.url, []).append(r)
    n_with_tokens = corpus.filter("n_tokens > 0").count()
    assert len(per_doc) == n_with_tokens
    for url, slices in per_doc.items():
        slices.sort(key=lambda r: r.seq_id)
        assert slices[0].tok_from == 0
        assert slices[-1].tok_to == slices[-1].n_tokens
        for a, b in zip(slices, slices[1:]):
            assert b.tok_from == a.tok_to
    import json as _json

    sj = _json.loads((out / "_sidecars.json").read_text())
    assert "_sequences" in sj["artifacts"]


def test_prepare_corpus_script_safety_stages(jobdir, spark):
    """--quality-rules --repetition-rules --scrub-pii write the
    _quality_stats kill-rate artifact and a filtered corpus."""
    out = jobdir / "corpus_safe"
    proc = subprocess.run(
        [
            sys.executable, str(REPO / "scripts" / "prepare_corpus.py"),
            "--input", str(jobdir / "pages"),
            "--output", str(out),
            "--partitions", "4",
            "--quality-rules", "--repetition-rules", "--scrub-pii",
        ],
        capture_output=True, text=True, timeout=420, cwd=str(REPO),
    )
    assert proc.returncode == 0, proc.stderr[-1500:]
    stats = spark.read.parquet(str(out / "_quality_stats")).collect()
    assert len(stats) == 1
    row = stats[0].asDict()
    assert row["quality_n_in"] > 0
    assert 0 <= row["quality_pass_passes_quality"] <= row["quality_n_in"]
    assert row["repetition_n_in"] >= 0
    # scrubbed corpus carries the PII lineage counters
    corpus = spark.read.parquet(str(out))
    assert {"n_email", "n_ipv4", "n_phone"} <= set(corpus.columns)


def test_prepare_corpus_script_contamination_report(jobdir, spark):
    """--decontaminate --contamination-report writes the _contamination
    audit sidecar: the self-quoted eval items report leaks; the clean
    item reports zeros."""
    from pyspark.sql import functions as F

    out = jobdir / "corpus_audit"
    eval_path = jobdir / "evalset_audit"
    quoted = (
        spark.read.parquet(str(jobdir / "pages"))
        .filter(F.col("html").isNotNull())
        .orderBy("url")
        .limit(3)
        .select("text")
    )
    clean = spark.createDataFrame(
        [(" ".join(f"neverleaked{i}" for i in range(20)),)], "text string"
    )
    quoted.unionByName(clean).write.mode("overwrite").parquet(
        str(eval_path)
    )
    proc = subprocess.run(
        [
            sys.executable, str(REPO / "scripts" / "prepare_corpus.py"),
            "--input", str(jobdir / "pages"),
            "--output", str(out),
            "--partitions", "4",
            "--decontaminate", str(eval_path),
            "--contamination-report",
        ],
        capture_output=True, text=True, timeout=420, cwd=str(REPO),
    )
    assert proc.returncode == 0, proc.stderr[-1500:]
    assert "contamination_report=written" in proc.stdout
    rep = spark.read.parquet(str(out / "_contamination"))
    rows = rep.collect()
    assert len(rows) == 4
    leaked = [r for r in rows if r.leaked]
    assert leaked and all(
        r.n_leaked_grams > 0 and r.n_corpus_docs > 0 for r in leaked
    )
    clean_rows = [r for r in rows if not r.leaked]
    assert clean_rows and all(r.n_corpus_docs == 0 for r in clean_rows)
    import json as _json

    sj = _json.loads((out / "_sidecars.json").read_text())
    assert "_contamination" in sj["artifacts"]


def test_prepare_corpus_script_decontaminate_spans(jobdir, spark):
    """--decontaminate-spans cuts quoted eval text from survivors'
    shipped text (run without quality rules: a self-quoted page is
    almost fully cut, and the later quality floor would then drop the
    very rows that prove the stage ran)."""
    from pyspark.sql import functions as F

    out = jobdir / "corpus_spans"
    # eval set = raw body text of pages IN the job input: their own
    # extracted pages quote it verbatim (second paragraph of the synth
    # template is a clean token run)
    eval_path = jobdir / "evalset"
    (
        spark.read.parquet(str(jobdir / "pages"))
        .filter(F.col("html").isNotNull())
        .orderBy("url")
        .limit(5)
        .select(F.monotonically_increasing_id().alias("doc_id"), "text")
        .write.mode("overwrite")
        .parquet(str(eval_path))
    )
    proc = subprocess.run(
        [
            sys.executable, str(REPO / "scripts" / "prepare_corpus.py"),
            "--input", str(jobdir / "pages"),
            "--output", str(out),
            "--partitions", "4",
            "--decontaminate-spans", str(eval_path),
            # DSIR against the same eval target with a floor low enough
            # to keep rows — exercises the stage without starving the
            # span assertions below
            "--dsir-target", str(eval_path),
            "--min-dsir-weight", "-10.0",
        ],
        capture_output=True, text=True, timeout=420, cwd=str(REPO),
    )
    assert proc.returncode == 0, proc.stderr[-1500:]
    corpus = spark.read.parquet(str(out))
    assert "n_decontam_tokens" in corpus.columns
    cut = corpus.filter(F.col("n_decontam_tokens") > 0)
    assert cut.count() > 0
    # the cut text really lost the tokens: shipped text is shorter than
    # the cut count implies impossible otherwise
    r = cut.orderBy(F.col("n_decontam_tokens").desc()).first()
    assert len(r.text.split()) < r.n_decontam_tokens + 400


def test_prepare_corpus_script_filter_stages(jobdir, spark):
    """--blocklist --drop-substring-dups --min-lm-logprob --mixture
    compose: the corpus ships blocklist-clean, substring-deduped text
    restricted to the weighted language mix."""
    out = jobdir / "corpus_filtered"
    proc = subprocess.run(
        [
            sys.executable, str(REPO / "scripts" / "prepare_corpus.py"),
            "--input", str(jobdir / "pages"),
            "--output", str(out),
            "--partitions", "4",
            "--canonical-urls",
            "--blocklist", "dup,casino",
            "--drop-substring-dups",
            "--min-lm-logprob", "-30.0",
            "--mixture", "en=0.5,fr=0.3,de=0.2",
        ],
        capture_output=True, text=True, timeout=420, cwd=str(REPO),
    )
    assert proc.returncode == 0, proc.stderr[-1500:]
    corpus = spark.read.parquet(str(out))
    assert corpus.count() > 0
    # substring-dedup lineage column rides in the output
    assert "n_substr_dup_tokens" in corpus.columns
    # blocklist verdict enforced on the shipped text
    from pyspark.sql import functions as F

    assert (
        corpus.filter(
            F.lower("text").rlike(r"\b(dup|casino)\b")
        ).count()
        == 0
    )
    # mixture drops unweighted languages
    langs = {r.lang for r in corpus.select("lang").distinct().collect()}
    assert langs <= {"en", "fr", "de"}
    # the LM model the corpus was filtered by persists as an artifact
    vocab = spark.read.parquet(str(out / "_lm_vocab"))
    assert vocab.filter("token is null").count() == 1  # the total row
    assert "lm_vocab=estimated" in proc.stdout
    # an --update batch loads the persisted model instead of
    # re-counting the corpus
    upd = subprocess.run(
        [
            sys.executable, str(REPO / "scripts" / "prepare_corpus.py"),
            "--input", str(jobdir / "pages"),
            "--output", str(out),
            "--partitions", "4",
            "--canonical-urls",
            "--blocklist", "dup,casino",
            "--drop-substring-dups",
            "--min-lm-logprob", "-30.0",
            "--mixture", "en=0.5,fr=0.3,de=0.2",
            "--update",
        ],
        capture_output=True, text=True, timeout=420, cwd=str(REPO),
    )
    assert upd.returncode == 0, upd.stderr[-1500:]
    assert "lm_vocab=loaded" in upd.stdout


def test_prepare_corpus_script_domain_cap(jobdir, spark):
    """--max-per-domain binds: every synthesized page shares one host,
    so the corpus collapses to the N highest-quality docs."""
    out = jobdir / "corpus_capped"
    proc = subprocess.run(
        [
            sys.executable, str(REPO / "scripts" / "prepare_corpus.py"),
            "--input", str(jobdir / "pages"),
            "--output", str(out),
            "--partitions", "4",
            "--max-per-domain", "5",
            "--shard-tokens", "400",
            "--export-jsonl", str(jobdir / "corpus_capped_jsonl"),
        ],
        capture_output=True, text=True, timeout=420, cwd=str(REPO),
    )
    assert proc.returncode == 0, proc.stderr[-1500:]
    corpus = spark.read.parquet(str(out))
    rows = corpus.select("url", "quality_score").collect()
    assert len(rows) == 5
    # shard ids annotated: 0-based per language, start-offset rule in
    # url order (recomputed naively over the written corpus)
    shards = corpus.select("lang", "shard_id", "n_tokens", "url").collect()
    assert all(r.shard_id >= 0 for r in shards)
    by_lang: dict[str, list] = {}
    for r in shards:
        by_lang.setdefault(r.lang, []).append(r)
    for rs in by_lang.values():
        cum = 0
        for r in sorted(rs, key=lambda r: r.url):
            assert r.shard_id == cum // 400
            cum += r.n_tokens
    # jsonl export of the final corpus carries the shard ids
    jl = spark.read.json(str(jobdir / "corpus_capped_jsonl"))
    assert set(jl.columns) >= {"url", "text", "lang", "shard_id"}
    assert jl.count() == 5
    # the cap kept the best: no excluded doc outscores a kept one
    from pyspark.sql import functions as F

    kept_min = min(r.quality_score for r in rows)
    full = spark.read.parquet(str(jobdir / "corpus"))  # uncapped run
    better = full.filter(F.col("quality_score") > kept_min).count()
    assert better <= 5


def test_prepare_corpus_script_update_mode(jobdir, spark):
    """--update appends only the new batch's delta to an existing corpus."""
    out = jobdir / "corpus_inc"
    base = [
        sys.executable, str(REPO / "scripts" / "prepare_corpus.py"),
        "--output", str(out), "--partitions", "4",
    ]
    proc = subprocess.run(
        base + ["--input", str(jobdir / "pages")],
        capture_output=True, text=True, timeout=420, cwd=str(REPO),
    )
    assert proc.returncode == 0, proc.stderr[-1500:]
    n0 = spark.read.parquet(str(out)).count()
    urls0 = {r.url for r in spark.read.parquet(str(out)).select("url").collect()}
    # the full build persists the banded-LSH index of every kept doc so
    # later --update runs never re-band the existing corpus
    bands = spark.read.parquet(str(out / "_bands"))
    assert {r.url for r in bands.select("url").distinct().collect()} == urls0

    # batch 2 = the SAME pages (all dups) plus nothing new -> delta is 0
    proc = subprocess.run(
        base + ["--input", str(jobdir / "pages"), "--update",
                "--update-near-dup", "0.8"],
        capture_output=True, text=True, timeout=420, cwd=str(REPO),
    )
    assert proc.returncode == 0, proc.stderr[-1500:]
    after = spark.read.parquet(str(out))
    assert after.count() == n0, "re-feeding the same crawl must append nothing"
    assert {r.url for r in after.select("url").collect()} == urls0
    manifest = spark.read.parquet(str(out / "_manifest"))
    assert manifest.select("url").distinct().count() == manifest.count()
    # empty delta -> the band index is unchanged (no duplicate blocks)
    bands_after = spark.read.parquet(str(out / "_bands"))
    assert bands_after.count() == bands.count()
    assert {
        r.url for r in bands_after.select("url").distinct().collect()
    } == urls0

    # migration path: an update on a corpus that PREDATES the index
    # (no _bands) must rebuild the FULL index, not write a partial
    # delta-only one that later updates would silently trust
    shutil.rmtree(out / "_bands")
    proc = subprocess.run(
        base + ["--input", str(jobdir / "pages"), "--update",
                "--update-near-dup", "0.8"],
        capture_output=True, text=True, timeout=420, cwd=str(REPO),
    )
    assert proc.returncode == 0, proc.stderr[-1500:]
    rebuilt = spark.read.parquet(str(out / "_bands"))
    assert {
        r.url for r in rebuilt.select("url").distinct().collect()
    } == urls0

    # crash-repair: simulate an update that died between artifact
    # appends by deleting a few urls' rows from _manifest and _bands;
    # the next --update must re-derive the missing sidecar rows instead
    # of trusting the incomplete artifacts forever
    from pyspark.sql import functions as F

    man = spark.read.parquet(str(out / "_manifest")).toPandas()
    victims = sorted(man[man["keep"]]["url"])[:3]
    pruned_man = spark.createDataFrame(man[~man["url"].isin(victims)])
    bands_pd = spark.read.parquet(str(out / "_bands")).toPandas()
    pruned_bands = spark.createDataFrame(
        bands_pd[~bands_pd["url"].isin(victims)]
    )
    shutil.rmtree(out / "_manifest")
    shutil.rmtree(out / "_bands")
    pruned_man.write.parquet(str(out / "_manifest"))
    pruned_bands.write.parquet(str(out / "_bands"))

    proc = subprocess.run(
        base + ["--input", str(jobdir / "pages"), "--update",
                "--update-near-dup", "0.8"],
        capture_output=True, text=True, timeout=420, cwd=str(REPO),
    )
    assert proc.returncode == 0, proc.stderr[-1500:]
    assert "manifest_repaired=3" in proc.stdout, proc.stdout
    assert "bands_repaired=3" in proc.stdout, proc.stdout
    healed_man = spark.read.parquet(str(out / "_manifest"))
    healed = healed_man.filter(F.col("url").isin([str(v) for v in victims]))
    assert healed.count() == 3
    assert healed.filter("keep and url = canonical_url").count() == 3
    # no duplicate manifest rows after heal + append cycles
    assert healed_man.select("url").distinct().count() == healed_man.count()
    healed_bands = spark.read.parquet(str(out / "_bands"))
    assert {
        r.url for r in healed_bands.select("url").distinct().collect()
    } == urls0
    # the versioned sidecar manifest records what this corpus carries
    import json as _json

    sj = _json.loads((out / "_sidecars.json").read_text())
    assert sj["version"] == 1
    assert {"_manifest", "_bands", "_datacard"} <= set(sj["artifacts"])


def test_prepare_corpus_lm_vocab_bootstrap(spark, tmp_path):
    """First update of a corpus that predates the _lm_vocab artifact
    estimates the model from the EXISTING corpus (not the batch) and
    persists it — the same no-partial-artifact migration rule as
    _bands/_chunk_df."""
    import datetime

    def page_rows(specs):
        ts = datetime.datetime(2024, 6, 1)
        rows = []
        for url, body in specs:
            html = (
                f"<html><body><article><p>{body}</p></article>"
                "</body></html>"
            ).encode()
            rows.append((url, ts, html, "", "en"))
        return spark.createDataFrame(
            rows,
            "url string, warc_ts timestamp, html binary, "
            "text string, lang string",
        )

    def body(tag):
        return " ".join(f"{tag} common word {i}" for i in range(40))

    out = tmp_path / "corpus"
    page_rows(
        [(f"http://lm.test/{i}", body(f"w{i}")) for i in range(4)]
    ).write.mode("overwrite").parquet(str(tmp_path / "pages1"))
    base = [
        sys.executable, str(REPO / "scripts" / "prepare_corpus.py"),
        "--output", str(out), "--partitions", "2",
        "--min-lm-logprob", "-30.0",
    ]
    build = subprocess.run(
        base + ["--input", str(tmp_path / "pages1")],
        capture_output=True, text=True, timeout=420, cwd=str(REPO),
    )
    assert build.returncode == 0, build.stderr[-1500:]
    assert "lm_vocab=estimated" in build.stdout
    assert (out / "_lm_vocab").exists()

    # simulate a pre-model corpus and update it
    shutil.rmtree(out / "_lm_vocab")
    page_rows(
        [("http://lm.test/new", body("zz"))]
    ).write.mode("overwrite").parquet(str(tmp_path / "pages2"))
    upd = subprocess.run(
        base + ["--input", str(tmp_path / "pages2"), "--update"],
        capture_output=True, text=True, timeout=420, cwd=str(REPO),
    )
    assert upd.returncode == 0, upd.stderr[-1500:]
    assert "lm_vocab=bootstrapped" in upd.stdout
    assert (out / "_lm_vocab").exists()
    # the persisted bootstrap model reflects the EXISTING corpus: its
    # vocabulary includes words no batch doc contains
    vocab_tokens = {
        r.token
        for r in spark.read.parquet(str(out / "_lm_vocab"))
        .select("token")
        .collect()
    }
    assert "w0" in vocab_tokens

    # a second update now LOADS the persisted model
    page_rows(
        [("http://lm.test/new2", body("yy"))]
    ).write.mode("overwrite").parquet(str(tmp_path / "pages3"))
    upd2 = subprocess.run(
        base + ["--input", str(tmp_path / "pages3"), "--update"],
        capture_output=True, text=True, timeout=420, cwd=str(REPO),
    )
    assert upd2.returncode == 0, upd2.stderr[-1500:]
    assert "lm_vocab=loaded" in upd2.stdout


def test_run_job_export_wet(jobdir, spark):
    """--export-wet writes WET conversion files alongside the parquet."""
    d = jobdir / "wet_job"
    proc = subprocess.run(
        [
            sys.executable, str(REPO / "scripts" / "run_job.py"),
            "--input", str(jobdir / "pages"),
            "--output", str(d / "out"),
            "--partitions", "4",
            "--export-wet", str(d / "wet"),
            "--export-jsonl", str(d / "jsonl"),
        ],
        capture_output=True, text=True, timeout=420, cwd=str(REPO),
    )
    assert proc.returncode == 0, proc.stderr[-1500:]
    from readability_ex_spark.sources.warc import read_wet_docs

    wet = read_wet_docs(spark, str(d / "wet"))
    parq = spark.read.parquet(str(d / "out")).filter("status = 'ok'")
    assert {r.url for r in wet.select("url").collect()} == {
        r.url for r in parq.select("url").collect()
    }
    # JSONL export round-trips through a plain json reader with the
    # same ok-row url set and the training-loader field shape
    jl = spark.read.json(str(d / "jsonl"))
    assert set(jl.columns) >= {"url", "title", "text", "lang"}
    assert {r.url for r in jl.select("url").collect()} == {
        r.url for r in parq.select("url").collect()
    }
    import glob

    assert glob.glob(str(d / "jsonl" / "*.json.gz"))


def test_prepare_corpus_chunk_df_cross_batch(spark, tmp_path):
    """The persisted _chunk_df sidecar closes boilerplate counting
    across batches: a chunk at the df cap in the existing corpus is
    dropped from an update batch that pushes it over."""
    import datetime

    from pyspark.sql import functions as F

    boiler = " ".join(f"b{i}" for i in range(30))

    def page_rows(specs):
        ts = datetime.datetime(2024, 6, 1)
        rows = []
        for url, body in specs:
            html = (
                f"<html><body><article><p>{body}</p></article>"
                "</body></html>"
            ).encode()
            rows.append((url, ts, html, "", "en"))
        return spark.createDataFrame(
            rows,
            "url string, warc_ts timestamp, html binary, "
            "text string, lang string",
        )

    def tail(tag):
        return " ".join(f"{tag}x{i}" for i in range(70))

    out = tmp_path / "corpus"
    page_rows(
        [
            ("http://a.test/1", f"{boiler} {tail('a')}"),
            ("http://a.test/2", f"{boiler} {tail('b')}"),
            ("http://a.test/3", tail("c")),
        ]
    ).write.mode("overwrite").parquet(str(tmp_path / "pages1"))
    build = subprocess.run(
        [
            sys.executable, str(REPO / "scripts" / "prepare_corpus.py"),
            "--input", str(tmp_path / "pages1"),
            "--output", str(out),
            "--partitions", "2",
            "--drop-boilerplate",
        ],
        capture_output=True, text=True, timeout=420, cwd=str(REPO),
    )
    assert build.returncode == 0, build.stderr[-1500:]
    assert "chunk_df=rebuilt" in build.stdout
    # df=2 == cap: the boilerplate SURVIVED the full build and is
    # therefore counted in the sidecar
    built = spark.read.parquet(str(out))
    assert built.filter(F.col("text").contains("b0 b1")).count() == 2

    page_rows(
        [("http://a.test/4", f"{boiler} {tail('d')}")]
    ).write.mode("overwrite").parquet(str(tmp_path / "pages2"))
    upd = subprocess.run(
        [
            sys.executable, str(REPO / "scripts" / "prepare_corpus.py"),
            "--input", str(tmp_path / "pages2"),
            "--output", str(out),
            "--partitions", "2",
            "--drop-boilerplate",
            "--update",
        ],
        capture_output=True, text=True, timeout=420, cwd=str(REPO),
    )
    assert upd.returncode == 0, upd.stderr[-1500:]
    assert "chunk_df=loaded" in upd.stdout
    assert "chunk_df=appended" in upd.stdout
    after = spark.read.parquet(str(out))
    new_doc = after.filter(F.col("url") == "http://a.test/4").collect()
    assert len(new_doc) == 1
    # combined df = 2 (existing) + 1 (batch) > cap -> the batch doc
    # ships WITHOUT the boilerplate chunk (existing rows are immutable)
    assert "b0" not in new_doc[0].text
    assert "dx0" in new_doc[0].text


def test_prepare_corpus_chunk_df_counts_over_cap_chunks(spark, tmp_path):
    """The sidecar must persist PRE-verdict counts: a chunk over the
    df cap in the FULL build (removed from every written doc, so
    invisible post-clean) must stay counted, or a later update batch
    re-admits up to max_df fresh copies of exactly that boilerplate
    (ADVICE r5 #1)."""
    import datetime

    from pyspark.sql import functions as F

    boiler = " ".join(f"c{i}" for i in range(30))

    def page_rows(specs):
        ts = datetime.datetime(2024, 6, 1)
        rows = []
        for url, body in specs:
            html = (
                f"<html><body><article><p>{body}</p></article>"
                "</body></html>"
            ).encode()
            rows.append((url, ts, html, "", "en"))
        return spark.createDataFrame(
            rows,
            "url string, warc_ts timestamp, html binary, "
            "text string, lang string",
        )

    def tail(tag):
        return " ".join(f"{tag}x{i}" for i in range(70))

    out = tmp_path / "corpus"
    # df=3 > cap=2: the boilerplate is cut from EVERY written doc
    page_rows(
        [
            ("http://b.test/1", f"{boiler} {tail('a')}"),
            ("http://b.test/2", f"{boiler} {tail('b')}"),
            ("http://b.test/3", f"{boiler} {tail('c')}"),
        ]
    ).write.mode("overwrite").parquet(str(tmp_path / "pages1"))
    build = subprocess.run(
        [
            sys.executable, str(REPO / "scripts" / "prepare_corpus.py"),
            "--input", str(tmp_path / "pages1"),
            "--output", str(out),
            "--partitions", "2",
            "--drop-boilerplate",
        ],
        capture_output=True, text=True, timeout=420, cwd=str(REPO),
    )
    assert build.returncode == 0, build.stderr[-1500:]
    built = spark.read.parquet(str(out))
    assert built.filter(F.col("text").contains("c0 c1")).count() == 0

    # one new copy in the update batch: pre-verdict closure means
    # df = 3 (prior, all removed from written text) + 1 > cap, so the
    # new doc ships without it; the old post-clean sidecar would have
    # counted 0 and kept it
    page_rows(
        [("http://b.test/4", f"{boiler} {tail('d')}")]
    ).write.mode("overwrite").parquet(str(tmp_path / "pages2"))
    upd = subprocess.run(
        [
            sys.executable, str(REPO / "scripts" / "prepare_corpus.py"),
            "--input", str(tmp_path / "pages2"),
            "--output", str(out),
            "--partitions", "2",
            "--drop-boilerplate",
            "--update",
        ],
        capture_output=True, text=True, timeout=420, cwd=str(REPO),
    )
    assert upd.returncode == 0, upd.stderr[-1500:]
    after = spark.read.parquet(str(out))
    new_doc = after.filter(F.col("url") == "http://b.test/4").collect()
    assert len(new_doc) == 1
    assert "c0" not in new_doc[0].text
    assert "dx0" in new_doc[0].text


def test_run_job_host_rank(jobdir, spark):
    """--host-rank writes the _hostrank artifact from the read-back
    output table — a fully-resumed run (processed=0) still ranks the
    whole corpus."""
    proc = subprocess.run(
        [
            sys.executable, str(REPO / "scripts" / "run_job.py"),
            "--input", str(jobdir / "pages"),
            "--output", str(jobdir / "out"),
            "--partitions", "4",
            "--host-rank",
            "--anchors",
            "--inlinks",
            "--frontier", "5",
            "--recrawl", "3",
            "--run-id", "rank0",
        ],
        capture_output=True, text=True, timeout=420, cwd=str(REPO),
    )
    assert proc.returncode == 0, proc.stderr[-1500:]
    ranks = spark.read.parquet(str(jobdir / "out" / "_hostrank")).collect()
    # synthetic pages link only within synth.test -> one host, rank 1
    assert [(r.host, round(r.rank, 9)) for r in ranks] == [
        ("synth.test", 1.0)
    ]
    # --anchors: the nav anchors of the synthetic template aggregate
    # per target with their visible text
    anchors = {
        (r.target, r.anchor_text): r.n_anchors
        for r in spark.read.parquet(
            str(jobdir / "out" / "_anchors")
        ).collect()
    }
    assert anchors[("http://synth.test/", "Home")] > 0
    assert anchors[("http://synth.test/about", "About")] > 0
    # --inlinks: every page carries the nav template, so the nav
    # targets collect one distinct-source edge per page; the kernel
    # outlinks column is per-page deduped, so instances == pages here
    inl = {
        r.target_url: r
        for r in spark.read.parquet(
            str(jobdir / "out" / "_inlinks")
        ).collect()
    }
    n_pages = spark.read.parquet(str(jobdir / "out")).count()
    home = inl["http://synth.test/"]
    assert home.n_inlinks == home.n_src_pages > 0
    assert home.n_src_pages <= n_pages
    assert home.n_src_hosts == 1  # all sources live on synth.test
    # --frontier: linked-but-never-crawled urls only, capped per host
    from readability_ex_spark.operators.urlops import canonicalize_url

    crawled = {
        r.c
        for r in spark.read.parquet(str(jobdir / "out"))
        .select(canonicalize_url("url").alias("c"))
        .collect()
    }
    frontier = spark.read.parquet(str(jobdir / "out" / "_frontier")).collect()
    assert frontier  # the nav template links pages beyond the crawl
    assert all(r.url not in crawled for r in frontier)
    assert all(1 <= r.rk <= 5 for r in frontier)
    assert all(r.host == "synth.test" for r in frontier)
    # --recrawl: KNOWN urls only (frontier's complement), capped per
    # host, aged from the LATEST fetch of each url in the input crawl
    from pyspark.sql import functions as F

    inp = spark.read.parquet(str(jobdir / "pages"))
    known = {r.url for r in inp.select("url").distinct().collect()}
    latest = {
        r.url: r.d
        for r in inp.groupBy("url")
        .agg(F.max(F.to_date("warc_ts")).alias("d"))
        .collect()
    }
    as_of = max(latest.values())
    recrawl = spark.read.parquet(str(jobdir / "out" / "_recrawl")).collect()
    assert recrawl
    assert all(r.url in known for r in recrawl)
    assert all(1 <= r.rk <= 3 for r in recrawl)
    assert all(
        r.age_days == (as_of - latest[r.url]).days and r.age_days >= 0
        for r in recrawl
    )


def test_prepare_corpus_host_rank_floor(spark, tmp_path):
    """--host-rank-floor drops documents on the worst-ranked hosts of
    the batch's own link graph and writes the _hostrank sidecar."""

    def page(host, n, links):
        body = "".join(f'<a href="{u}">l</a>' for u in links)
        # fully disjoint token sets per page so neither exact nor
        # near-dup can collapse the hosts before the rank floor runs
        tag = f"{host.split('.')[0]}{n}"
        para = "".join(
            f"<p>{tag}w{i}a {tag}w{i}b {tag}w{i}c {tag}w{i}d "
            f"{tag}w{i}e {tag}w{i}f {tag}w{i}g {tag}w{i}h, with "
            f"commas, here.</p>"
            for i in range(20)
        )
        return (
            f"http://{host}/p{n}",
            None,
            f"<html><body><article><h1>T</h1>{para}{body}"
            "</article></body></html>",
        )

    rows = [
        # a.test and b.test link to each other; c.test links out but
        # nothing links to c.test -> lowest possible rank (dangling feed)
        page("a.test", 1, ["http://b.test/p1", "http://a.test/p2"]),
        page("a.test", 2, ["http://a.test/p1"]),
        page("b.test", 1, ["http://a.test/p1"]),
        page("c.test", 1, ["http://a.test/p2"]),
    ]
    spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html string"
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "pages"))

    proc = subprocess.run(
        [
            sys.executable, str(REPO / "scripts" / "prepare_corpus.py"),
            "--input", str(tmp_path / "pages"),
            "--output", str(tmp_path / "corpus"),
            "--host-rank-floor", "0.34",
            "--partitions", "2",
        ],
        capture_output=True, text=True, timeout=420, cwd=str(REPO),
    )
    assert proc.returncode == 0, proc.stderr[-1500:]
    corpus = spark.read.parquet(str(tmp_path / "corpus"))
    hosts = {
        r.h
        for r in corpus.selectExpr(
            "regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#@]*@)?([^/?#:]*)', 2) AS h"
        ).collect()
    }
    assert "c.test" not in hosts  # bottom-third host cut
    assert {"a.test", "b.test"} <= hosts
    ranks = spark.read.parquet(str(tmp_path / "corpus" / "_hostrank"))
    got = {r.host: r.rank for r in ranks.collect()}
    assert set(got) == {"a.test", "b.test", "c.test"}
    assert got["c.test"] == min(got.values())
    import json as _json

    sc = _json.loads((tmp_path / "corpus" / "_sidecars.json").read_text())
    assert "_hostrank" in sc["artifacts"]


def test_corpus_diff_script(spark, tmp_path):
    """scripts/corpus_diff.py reports added/removed docs, per-language
    deltas, and the sidecar-manifest diff between two corpus dirs."""
    rows_v1 = [
        ("http://a.test/1", "en", 100, 0.5),
        ("http://a.test/2", "en", 50, 0.4),
        ("http://b.test/1", "fr", 80, 0.6),
    ]
    rows_v2 = rows_v1[:2] + [  # b/1 removed; two added (one new lang)
        ("http://c.test/1", "en", 70, 0.9),
        ("http://d.test/1", "de", 30, 0.2),
    ]
    schema = "url string, lang string, n_tokens long, quality_score double"
    old_dir, new_dir = tmp_path / "v1", tmp_path / "v2"
    spark.createDataFrame(rows_v1, schema).coalesce(1).write.parquet(
        str(old_dir)
    )
    spark.createDataFrame(rows_v2, schema).coalesce(1).write.parquet(
        str(new_dir)
    )
    (old_dir / "_sidecars.json").write_text(
        '{"version": 1, "artifacts": ["_manifest", "_bands"]}'
    )
    (new_dir / "_sidecars.json").write_text(
        '{"version": 1, "artifacts": ["_manifest", "_datacard"]}'
    )
    ck_schema = "url_bucket int, n_docs long, content_xor long"
    spark.createDataFrame(
        [(0, 2, 111), (1, 1, 222)], ck_schema
    ).coalesce(1).write.parquet(str(old_dir / "_checksums"))
    spark.createDataFrame(
        [(0, 2, 111), (1, 2, 999), (2, 1, 5)], ck_schema
    ).coalesce(1).write.parquet(str(new_dir / "_checksums"))
    proc = subprocess.run(
        [
            sys.executable, str(REPO / "scripts" / "corpus_diff.py"),
            "--old", str(old_dir), "--new", str(new_dir),
        ],
        capture_output=True, text=True, timeout=300, cwd=str(REPO),
    )
    assert proc.returncode == 0, proc.stderr[-1500:]
    import json

    rep = json.loads(proc.stdout.splitlines()[-1])
    assert rep["old"]["docs"] == 3 and rep["new"]["docs"] == 4
    assert rep["added_docs"] == 2 and rep["removed_docs"] == 1
    assert rep["added_examples"] == ["http://c.test/1", "http://d.test/1"]
    assert rep["removed_examples"] == ["http://b.test/1"]
    assert rep["languages"]["fr"]["delta_docs"] == -1
    assert rep["languages"]["de"]["old"]["docs"] == 0
    assert rep["languages"]["en"]["delta_tokens"] == 70
    assert rep["artifacts_added"] == ["_datacard"]
    assert rep["artifacts_removed"] == ["_bands"]
    # bucket 0 identical, bucket 1 moved, bucket 2 new on one side
    assert rep["changed_buckets"] == [1, 2]


def test_run_job_frontier_delays(spark, tmp_path):
    """--frontier-agent annotates frontier hosts with the Crawl-delay
    lifted from the crawl's own /robots.txt rows."""
    import datetime

    ts = datetime.datetime(2024, 6, 1)
    body = (
        "<html><body><article>"
        + "".join(
            f"<p>steady prose sentence number {i}, with commas, here.</p>"
            for i in range(12)
        )
        + '<a href="/fresh/a">a</a><a href="/fresh/b">b</a>'
        "</article></body></html>"
    )
    sitemap = (
        b"<urlset><url><loc>http://h.test/from-sitemap</loc></url>"
        b"<url><loc>http://h.test/p1</loc></url></urlset>"  # p1 crawled
    )
    rows = [
        (
            "http://h.test/robots.txt",
            ts,
            b"User-agent: *\nCrawl-delay: 4\nDisallow: /fresh/b\n",
            "",
            "en",
        ),
        ("http://h.test/sitemap.xml", ts, sitemap, "", "en"),
        ("http://h.test/p1", ts, body.encode(), "", "en"),
    ]
    spark.createDataFrame(
        rows,
        "url string, warc_ts timestamp, html binary, "
        "text string, lang string",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "pages"))
    proc = subprocess.run(
        [
            sys.executable, str(REPO / "scripts" / "run_job.py"),
            "--input", str(tmp_path / "pages"),
            "--output", str(tmp_path / "out"),
            "--partitions", "2",
            # cap 2 with 3 candidates, the middle one (url-ascending)
            # robots-disallowed: the filter must run BEFORE the cap, or
            # /fresh/b would consume a quota slot and push from-sitemap
            # out of the schedule
            "--frontier", "2",
            "--frontier-agent", "mybot",
            "--run-id", "fd0",
        ],
        capture_output=True, text=True, timeout=420, cwd=str(REPO),
    )
    assert proc.returncode == 0, proc.stderr[-1500:]
    frontier = {
        r.url: r
        for r in spark.read.parquet(
            str(tmp_path / "out" / "_frontier")
        ).collect()
    }
    # outlink discovery + sitemap discovery; the sitemap's already-
    # crawled loc (p1) must not re-enter, and the robots-disallowed
    # /fresh/b never enters the schedule NOR consumes the host's quota
    # (cap 2 still schedules both allowed urls)
    assert set(frontier) == {
        "http://h.test/fresh/a",
        "http://h.test/from-sitemap",
    }
    # rk stays contiguous 1..k after the pre-cap filter
    assert sorted(r.rk for r in frontier.values()) == [1, 2]
    # mybot has no exact group -> the * group's delay governs
    assert all(r.crawl_delay == 4.0 for r in frontier.values())


def test_prepare_corpus_script_split(spark, tmp_path):
    """--split ships a deterministic train/val/test column (md5 url
    bands), records per-split counts in the datacard, and an --update
    without the flag is refused (band symmetry guard)."""
    import datetime
    import hashlib
    import json as _json

    ts = datetime.datetime(2024, 6, 1)

    def page(i):
        body = " ".join(f"w{i}x{j}" for j in range(40))
        html = (
            f"<html><body><article><p>{body}</p></article></body></html>"
        ).encode()
        return (f"http://sp.test/{i}", ts, html, "", "en")

    spark.createDataFrame(
        [page(i) for i in range(40)],
        "url string, warc_ts timestamp, html binary, "
        "text string, lang string",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "pages"))

    out = tmp_path / "corpus"
    proc = subprocess.run(
        [
            sys.executable, str(REPO / "scripts" / "prepare_corpus.py"),
            "--input", str(tmp_path / "pages"),
            "--output", str(out),
            "--split", "0.25,0.25",
            "--chunk-index", "16,12",
            "--partitions", "2",
        ],
        capture_output=True, text=True, timeout=420, cwd=str(REPO),
    )
    assert proc.returncode == 0, proc.stderr[-1500:]
    rows = spark.read.parquet(str(out)).select("url", "split").collect()
    assert rows and set(r.split for r in rows) <= {"train", "val", "test"}

    # the band is the documented pure function of the url
    def expect(url):
        d = hashlib.md5(f"split:{url}".encode()).hexdigest()[:6]
        t_test = format(int(round(0.25 * 16**6)), "06x")
        t_val = format(int(round(0.5 * 16**6)), "06x")
        return "test" if d < t_test else ("val" if d < t_val else "train")

    assert all(r.split == expect(r.url) for r in rows)
    card = _json.loads((out / "_datacard" / "datacard.json").read_text())
    assert sum(card["splits"].values()) == len(rows)
    # --chunk-index: every shipped doc chunked with valid ordered spans
    shipped = {
        r.url: r.text
        for r in spark.read.parquet(str(out)).select("url", "text").collect()
    }
    chunks = {}
    for r in spark.read.parquet(str(out / "_chunks")).collect():
        chunks.setdefault(r.url, []).append(r)
    assert set(chunks) == set(shipped)
    for url, rs in chunks.items():
        toks = shipped[url].split()
        rs.sort(key=lambda r: r.chunk_id)
        assert rs[-1].tok_end == len(toks)
        for r in rs:
            assert r.chunk_text == " ".join(toks[r.tok_start:r.tok_end])
    # band-symmetry guard: update WITHOUT --split must refuse
    proc2 = subprocess.run(
        [
            sys.executable, str(REPO / "scripts" / "prepare_corpus.py"),
            "--input", str(tmp_path / "pages"),
            "--output", str(out),
            "--update",
            "--partitions", "2",
        ],
        capture_output=True, text=True, timeout=420, cwd=str(REPO),
    )
    assert proc2.returncode != 0
    assert "split" in (proc2.stderr + proc2.stdout)
    # fraction guard: the build recorded its fractions in the sidecar
    # manifest, and an update under DIFFERENT fractions must refuse
    # (bands assigned under two thresholds = cross-batch contamination)
    params = _json.loads((out / "_sidecars.json").read_text())["params"]
    assert params["split"] == [0.25, 0.25]
    proc3 = subprocess.run(
        [
            sys.executable, str(REPO / "scripts" / "prepare_corpus.py"),
            "--input", str(tmp_path / "pages"),
            "--output", str(out),
            "--update",
            "--split", "0.1,0.1",
            "--partitions", "2",
        ],
        capture_output=True, text=True, timeout=420, cwd=str(REPO),
    )
    assert proc3.returncode != 0
    assert "fractions" in (proc3.stderr + proc3.stdout)
    # ...and an update under the SAME fractions goes through, banding
    # the new batch identically
    spark.createDataFrame(
        [page(i) for i in range(40, 50)],
        "url string, warc_ts timestamp, html binary, "
        "text string, lang string",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "pages2"))
    proc4 = subprocess.run(
        [
            sys.executable, str(REPO / "scripts" / "prepare_corpus.py"),
            "--input", str(tmp_path / "pages2"),
            "--output", str(out),
            "--update",
            "--split", "0.25,0.25",
            "--partitions", "2",
        ],
        capture_output=True, text=True, timeout=420, cwd=str(REPO),
    )
    assert proc4.returncode == 0, proc4.stderr[-1500:]
    rows2 = spark.read.parquet(str(out)).select("url", "split").collect()
    assert len(rows2) > len(rows)
    assert all(r.split == expect(r.url) for r in rows2)


def test_compact_corpus_script(spark, tmp_path):
    """compact_corpus.py rewrites each bucket to one file, keeps every
    row and sidecar, and the order-independent _checksums verify the
    content survived (the design reason the checksums ignore layout)."""
    import datetime
    import json as _json

    ts = datetime.datetime(2024, 6, 1)

    def pages(tag, n):
        def page(i):
            body = " ".join(f"{tag}{i}w{j}" for j in range(40))
            html = (
                f"<html><body><article><p>{body}</p></article></body></html>"
            ).encode()
            return (f"http://cp.test/{tag}/{i}", ts, html, "", "en")

        return spark.createDataFrame(
            [page(i) for i in range(n)],
            "url string, warc_ts timestamp, html binary, "
            "text string, lang string",
        )

    pages("a", 30).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "p1")
    )
    pages("b", 30).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "p2")
    )
    out = tmp_path / "corpus"
    for inp, extra in ((tmp_path / "p1", []), (tmp_path / "p2", ["--update"])):
        proc = subprocess.run(
            [
                sys.executable, str(REPO / "scripts" / "prepare_corpus.py"),
                "--input", str(inp),
                "--output", str(out),
                "--checksums",
                "--partitions", "2",
            ] + extra,
            capture_output=True, text=True, timeout=420, cwd=str(REPO),
        )
        assert proc.returncode == 0, proc.stderr[-1500:]
    before = spark.read.parquet(str(out))
    rows_before = sorted(r.url for r in before.select("url").collect())

    proc = subprocess.run(
        [
            sys.executable, str(REPO / "scripts" / "compact_corpus.py"),
            "--corpus", str(out),
            "--verify-checksums",
        ],
        capture_output=True, text=True, timeout=420, cwd=str(REPO),
    )
    assert proc.returncode == 0, proc.stderr[-1500:]
    report = _json.loads(
        next(
            line for line in proc.stdout.splitlines()
            if line.startswith("{")
        )
    )
    assert report["checksums"] == "match"
    assert report["files_after"] <= report["files_before"]
    assert report["max_files_per_bucket_after"] == 1
    after = spark.read.parquet(str(out))
    assert sorted(r.url for r in after.select("url").collect()) == rows_before
    # sidecars moved over intact
    for side in ("_manifest", "_checksums", "_datacard"):
        assert (out / side).exists(), side
    assert not (out.parent / (out.name + ".compacting")).exists()
    assert not (out.parent / (out.name + ".precompact")).exists()


def test_prepare_corpus_script_lm_order2(spark, tmp_path):
    """--lm-order 2 scores the floor/bands with the interpolated bigram
    LM, persists the _lm_bigrams pair table next to _lm_vocab, and an
    --update loads both instead of re-estimating."""
    import datetime

    ts = datetime.datetime(2024, 6, 1)

    def pages(tag, n):
        def page(i):
            body = " ".join(
                f"common word {tag}{i}tok{j}" for j in range(15)
            )
            html = (
                f"<html><body><article><p>{body}</p></article></body></html>"
            ).encode()
            return (f"http://lm2.test/{tag}/{i}", ts, html, "", "en")

        return spark.createDataFrame(
            [page(i) for i in range(n)],
            "url string, warc_ts timestamp, html binary, "
            "text string, lang string",
        )

    pages("a", 25).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "p1")
    )
    pages("b", 10).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "p2")
    )
    out = tmp_path / "corpus"
    proc = subprocess.run(
        [
            sys.executable, str(REPO / "scripts" / "prepare_corpus.py"),
            "--input", str(tmp_path / "p1"),
            "--output", str(out),
            "--min-lm-logprob", "-99",
            "--lm-bands", "3",
            "--lm-order", "2",
            "--partitions", "2",
        ],
        capture_output=True, text=True, timeout=420, cwd=str(REPO),
    )
    assert proc.returncode == 0, proc.stderr[-1500:]
    assert "lm_bigrams=estimated" in proc.stdout
    assert (out / "_lm_vocab").exists() and (out / "_lm_bigrams").exists()
    shipped = spark.read.parquet(str(out))
    n1 = shipped.count()
    assert n1 > 0 and "lm_bucket" in shipped.columns
    # the persisted pair table is the real top-B artifact
    pairs = spark.read.parquet(str(out / "_lm_bigrams")).collect()
    assert pairs and all(r.c >= 1 and " " in r.pair for r in pairs)

    proc2 = subprocess.run(
        [
            sys.executable, str(REPO / "scripts" / "prepare_corpus.py"),
            "--input", str(tmp_path / "p2"),
            "--output", str(out),
            "--update",
            "--min-lm-logprob", "-99",
            "--lm-bands", "3",
            "--lm-order", "2",
            "--partitions", "2",
        ],
        capture_output=True, text=True, timeout=420, cwd=str(REPO),
    )
    assert proc2.returncode == 0, proc2.stderr[-1500:]
    assert "lm_vocab=loaded" in proc2.stdout
    assert "lm_bigrams=loaded" in proc2.stdout
    assert spark.read.parquet(str(out)).count() > n1


def test_prepare_corpus_lm_order2_requires_lm_stage():
    proc = subprocess.run(
        [
            sys.executable, str(REPO / "scripts" / "prepare_corpus.py"),
            "--input", "x", "--output", "y", "--lm-order", "2",
        ],
        capture_output=True, text=True, timeout=120, cwd=str(REPO),
    )
    assert proc.returncode != 0
    assert "--lm-order 2 needs" in proc.stderr


def test_prepare_corpus_semantic_dedup_centroids(spark, tmp_path):
    """--semantic-dedup persists the centroid model (_sem_centroids) on
    a full build and an --update clusters in the SAME space by loading
    it instead of retraining on the batch."""
    import datetime

    ts = datetime.datetime(2024, 6, 1)

    def pages(tag, n):
        def page(i):
            body = " ".join(f"{tag}{i}w{j} filler{j % 5}" for j in range(30))
            html = (
                f"<html><body><article><p>{body}</p></article></body></html>"
            ).encode()
            return (f"http://sc.test/{tag}/{i}", ts, html, "", "en")

        return spark.createDataFrame(
            [page(i) for i in range(n)],
            "url string, warc_ts timestamp, html binary, "
            "text string, lang string",
        )

    pages("a", 20).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "p1")
    )
    pages("b", 8).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "p2")
    )
    out = tmp_path / "corpus"
    proc = subprocess.run(
        [
            sys.executable, str(REPO / "scripts" / "prepare_corpus.py"),
            "--input", str(tmp_path / "p1"),
            "--output", str(out),
            "--semantic-dedup", "0.95",
            "--partitions", "2",
        ],
        capture_output=True, text=True, timeout=420, cwd=str(REPO),
    )
    assert proc.returncode == 0, proc.stderr[-1500:]
    assert "sem_centroids=estimated" in proc.stdout
    cents = spark.read.parquet(str(out / "_sem_centroids")).collect()
    assert cents and all(len(r.centroid) == 64 for r in cents)
    n1 = spark.read.parquet(str(out)).count()

    proc2 = subprocess.run(
        [
            sys.executable, str(REPO / "scripts" / "prepare_corpus.py"),
            "--input", str(tmp_path / "p2"),
            "--output", str(out),
            "--update",
            "--semantic-dedup", "0.95",
            "--partitions", "2",
        ],
        capture_output=True, text=True, timeout=420, cwd=str(REPO),
    )
    assert proc2.returncode == 0, proc2.stderr[-1500:]
    assert "sem_centroids=loaded" in proc2.stdout
    assert spark.read.parquet(str(out)).count() > n1
    # the model was NOT retrained: artifact bytes unchanged
    cents2 = spark.read.parquet(str(out / "_sem_centroids")).collect()
    assert sorted(map(tuple, ((r.cell, tuple(r.centroid)) for r in cents))) \
        == sorted(map(tuple, ((r.cell, tuple(r.centroid)) for r in cents2)))


def test_prepare_corpus_update_schema_guard(spark, tmp_path):
    """--update refuses to append a batch whose schema differs from the
    existing corpus (here: --shard-tokens adds shard_id) — a mixed-
    schema parquet directory reads nondeterministically."""
    import datetime

    ts = datetime.datetime(2024, 6, 1)

    def page(i):
        body = " ".join(f"w{i}x{j}" for j in range(40))
        html = (
            f"<html><body><article><p>{body}</p></article></body></html>"
        ).encode()
        return (f"http://sg.test/{i}", ts, html, "", "en")

    spark.createDataFrame(
        [page(i) for i in range(10)],
        "url string, warc_ts timestamp, html binary, "
        "text string, lang string",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "pages"))
    out = tmp_path / "corpus"
    base = subprocess.run(
        [
            sys.executable, str(REPO / "scripts" / "prepare_corpus.py"),
            "--input", str(tmp_path / "pages"),
            "--output", str(out),
            "--partitions", "2",
        ],
        capture_output=True, text=True, timeout=420, cwd=str(REPO),
    )
    assert base.returncode == 0, base.stderr[-1500:]
    spark.createDataFrame(
        [page(i) for i in range(10, 14)],
        "url string, warc_ts timestamp, html binary, "
        "text string, lang string",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "pages2"))
    upd = subprocess.run(
        [
            sys.executable, str(REPO / "scripts" / "prepare_corpus.py"),
            "--input", str(tmp_path / "pages2"),
            "--output", str(out),
            "--update",
            "--shard-tokens", "100",
            "--partitions", "2",
        ],
        capture_output=True, text=True, timeout=420, cwd=str(REPO),
    )
    assert upd.returncode != 0
    assert "schema" in (upd.stderr + upd.stdout)
    assert "shard_id" in (upd.stderr + upd.stdout)
    # the refused update must not have appended anything
    assert spark.read.parquet(str(out)).count() == spark.read.parquet(
        str(out)
    ).select("url").distinct().count()


def test_prepare_corpus_script_emb_sigs_update(jobdir, spark):
    """--emb-sigs persists the banded-signature index; --update
    --update-emb-near-dup drops a new-url paraphrase the exact
    fingerprint misses, appends the genuinely-fresh doc, extends the
    index with the delta, and rebuilds it in full on a pre-index
    corpus (the same contract as _bands)."""
    from pyspark.sql import functions as F

    out = jobdir / "corpus_emb"
    base = [
        sys.executable, str(REPO / "scripts" / "prepare_corpus.py"),
        "--output", str(out), "--partitions", "4",
    ]
    proc = subprocess.run(
        base + ["--input", str(jobdir / "pages"), "--emb-sigs"],
        capture_output=True, text=True, timeout=420, cwd=str(REPO),
    )
    assert proc.returncode == 0, proc.stderr[-1500:]
    assert "emb_sigs=rebuilt" in proc.stdout, proc.stdout
    urls0 = {r.url for r in spark.read.parquet(str(out)).select("url").collect()}
    sigs = spark.read.parquet(str(out / "_emb_sigs"))
    # key-complete: EVERY corpus url has a row (zero-norm text -> NULL)
    assert {r.url for r in sigs.select("url").distinct().collect()} == urls0

    # batch 2: a paraphrase of an existing page under a NEW url with a
    # tiny visible addition (text fingerprint changes, embedding cosine
    # stays ~1) + genuinely fresh pages the build never saw
    built_pages = spark.read.parquet(str(jobdir / "pages"))
    donor_url = sorted(urls0)[0]
    paraphrase = built_pages.filter(F.col("url") == donor_url).withColumn(
        "url", F.lit("http://synth.test/doc/emb-paraphrase")
    ).withColumn(
        "html",
        F.concat(
            F.col("html"), F.lit(b"<p>tiny appendix sentence here</p>")
        ),
    )
    # the fresh doc is GUARANTEED unique (synthetic sf pages contain
    # real near-dup families, so a held-out page may legitimately be an
    # embedding near-dup of a built one — correct drop, wrong fixture)
    words = " ".join(f"zqfresh{i}token" for i in range(150))
    fresh = built_pages.limit(1).withColumn(
        "url", F.lit("http://synth.test/doc/fresh-emb")
    ).withColumn(
        "html",
        F.lit(
            f"<html><body><article><p>{words}</p></article></body></html>"
            .encode()
        ),
    )
    fresh_urls = {"http://synth.test/doc/fresh-emb"}
    paraphrase.unionByName(fresh).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(jobdir / "pages_emb2"))

    proc = subprocess.run(
        base + ["--input", str(jobdir / "pages_emb2"), "--update",
                "--update-emb-near-dup", "0.8"],
        capture_output=True, text=True, timeout=420, cwd=str(REPO),
    )
    assert proc.returncode == 0, proc.stderr[-1500:]
    assert "emb_sigs=appended" in proc.stdout, proc.stdout
    after = {r.url for r in spark.read.parquet(str(out)).select("url").collect()}
    assert "http://synth.test/doc/emb-paraphrase" not in after, (
        "embedding near-dup must drop the new-url paraphrase"
    )
    assert fresh_urls <= after
    sigs2 = spark.read.parquet(str(out / "_emb_sigs"))
    assert {r.url for r in sigs2.select("url").distinct().collect()} == after
    # no duplicate index rows after the append
    assert sigs2.select("url").distinct().count() == sigs2.count()

    # migration: an update on a corpus that PREDATES the index must
    # rebuild it in FULL, not write a partial delta-only one
    shutil.rmtree(out / "_emb_sigs")
    proc = subprocess.run(
        base + ["--input", str(jobdir / "pages_emb2"), "--update",
                "--update-emb-near-dup", "0.8"],
        capture_output=True, text=True, timeout=420, cwd=str(REPO),
    )
    assert proc.returncode == 0, proc.stderr[-1500:]
    assert "emb_sigs=rebuilt" in proc.stdout, proc.stdout
    rebuilt = spark.read.parquet(str(out / "_emb_sigs"))
    assert {
        r.url for r in rebuilt.select("url").distinct().collect()
    } == after

    # the manifest records the index + WHICH signature scheme wrote it
    import json as _json

    from readability_ex_spark.operators.embedding import EMB_SIG_RULE

    sj = _json.loads((out / "_sidecars.json").read_text())
    assert "_emb_sigs" in sj["artifacts"]
    assert sj["params"]["emb_sig_rule"] == EMB_SIG_RULE

    # an update against an index written under a DIFFERENT scheme must
    # refuse, not silently mix incomparable signatures
    sj["params"]["emb_sig_rule"] = "hash64:k8xT10:sig160:seed42:v0"
    (out / "_sidecars.json").write_text(_json.dumps(sj))
    proc = subprocess.run(
        base + ["--input", str(jobdir / "pages_emb2"), "--update",
                "--update-emb-near-dup", "0.8"],
        capture_output=True, text=True, timeout=420, cwd=str(REPO),
    )
    assert proc.returncode != 0
    assert "refusing to extend/use _emb_sigs" in (
        proc.stderr + proc.stdout
    ), proc.stderr[-800:]
