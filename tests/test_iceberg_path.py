"""Iceberg-guarded source/sink call shapes.

No Iceberg jars ship in this sandbox, so the iceberg branches are
exercised with duck-typed fakes recording the v2 writeTo / format-reader
calls; the parquet fallback is covered by the real-Spark tests
elsewhere (test_pipeline, test_job_script)."""

from __future__ import annotations

from readability_ex_spark.sinks import (
    merge_extracted_iceberg,
    read_done_urls,
    write_extracted,
    write_metrics,
)
from readability_ex_spark.sources.pages import read_pages


class _Recorder:
    def __init__(self, log, name, fail_on=(), fail_msg="NoSuchTableException"):
        self._log = log
        self._name = name
        self._fail_on = fail_on
        self._fail_msg = fail_msg

    def __call__(self, *a, **k):
        self._log.append((self._name, a))
        if self._name in self._fail_on:
            raise RuntimeError(f"{self._fail_msg}: {self._name}")
        return self

    def __getattr__(self, item):
        return _Recorder(
            self._log, f"{self._name}.{item}", self._fail_on, self._fail_msg
        )


def _fake_df(log, fail_on=(), fail_msg="NoSuchTableException"):
    return _Recorder(log, "df", fail_on, fail_msg)


def test_read_pages_iceberg_uses_format_load():
    log = []
    spark = _Recorder(log, "spark")
    read_pages(spark, "crawl.pages", table_format="iceberg")
    names = [n for n, _ in log]
    assert "spark.read.format" in names
    assert ("spark.read.format", ("iceberg",)) in log
    assert ("spark.read.format.load", ("crawl.pages",)) in log


def test_write_extracted_iceberg_appends(spark):
    log = []
    write_extracted(_fake_df(log), "crawl.extracted", table_format="iceberg")
    assert ("df.withColumn.writeTo", ("crawl.extracted",)) in log
    assert any(n == "df.withColumn.writeTo.append" for n, _ in log)


def test_write_extracted_iceberg_creates_on_missing_table(spark):
    log = []
    write_extracted(
        _fake_df(log, fail_on=("df.withColumn.writeTo.append",)),
        "crawl.extracted",
        table_format="iceberg",
    )
    # append failed (no table) -> partitionedBy(...).create()
    assert any(n.endswith("writeTo.partitionedBy.create") for n, _ in log)


def test_write_extracted_iceberg_surfaces_real_append_errors(spark):
    import pytest

    log = []
    with pytest.raises(RuntimeError, match="SCHEMA_MISMATCH"):
        write_extracted(
            _fake_df(
                log,
                fail_on=("df.withColumn.writeTo.append",),
                fail_msg="SCHEMA_MISMATCH",
            ),
            "crawl.extracted",
            table_format="iceberg",
        )
    # no create() attempted: the non-missing-table error propagated
    assert not any(n.endswith(".create") for n, _ in log)


def test_write_metrics_iceberg_sibling_table(spark):
    log = []
    write_metrics(_fake_df(log), "crawl.extracted", "r0", table_format="iceberg")
    assert ("df.withColumn.writeTo", ("crawl.extracted_metrics",)) in log


def test_merge_extracted_iceberg_sql_shape(spark):
    log = []
    sqls = []

    class _Spark:
        def sql(self, q):
            sqls.append(q)

    merge_extracted_iceberg(_Spark(), _fake_df(log), "crawl.extracted")
    assert any(n == "df.createOrReplaceTempView" for n, _ in log)
    assert len(sqls) == 1
    q = sqls[0]
    assert q.startswith("MERGE INTO crawl.extracted t USING")
    assert "t.url = s.url" in q
    assert "WHEN MATCHED THEN UPDATE SET *" in q
    assert "WHEN NOT MATCHED THEN INSERT *" in q


def test_read_done_urls_missing_output_returns_none(spark, tmp_path):
    assert read_done_urls(spark, str(tmp_path / "nope")) is None


def test_read_done_urls_propagates_corrupt_output(spark, tmp_path):
    # a transient/corrupt read must NOT be treated as 'first run' — that
    # would silently disable resume and duplicate the committed output
    import pytest

    out = tmp_path / "out"
    out.mkdir()
    (out / "part-00000.parquet").write_text("this is not parquet")
    with pytest.raises(Exception, match="(?i)parquet|footer|corrupt"):
        read_done_urls(spark, str(out))


def test_read_done_urls_filters_statuses(spark, tmp_path):
    from readability_ex_spark.sinks import TERMINAL_STATUSES as RETRYABLE_DONE

    df = spark.createDataFrame(
        [("u1", "ok"), ("u2", "error"), ("u3", "not_readable")],
        "url string, status string",
    )
    out = str(tmp_path / "out")
    df.write.partitionBy("status").parquet(out)
    # default: every written url is done (the append sink must not
    # re-append deterministically failing urls on every resume)
    assert {r.url for r in read_done_urls(spark, out).collect()} == {
        "u1", "u2", "u3"
    }
    # opt-in retry of transient errors
    retry = {
        r.url
        for r in read_done_urls(spark, out, done_statuses=RETRYABLE_DONE).collect()
    }
    assert retry == {"u1", "u3"}
    only_ok = {
        r.url
        for r in read_done_urls(spark, out, done_statuses=("ok",)).collect()
    }
    assert only_ok == {"u1"}
