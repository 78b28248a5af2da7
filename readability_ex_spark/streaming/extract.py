"""Streaming extraction: new crawl files -> extracted table, continuously.

The reference is a pure batch library (SURVEY.md §2.B: no streaming in
the north rule); this is the natural extension for a live crawl feed:

- ``stream_extraction``: ``readStream`` over the pages table ->
  ``foreachBatch`` running the SAME batch plan (dedup within batch,
  repartition by url-hash, kernel). Output is exactly-once per
  micro-batch: the sink dynamically overwrites the batch's own
  batch_id partition (sinks.write_extracted_batch), so a batch retried
  after a partial write replaces its rows instead of duplicating them.
- ``stream_metrics``: event-time windowed counters over the extraction
  output (watermarked tumbling windows on warc_ts-derived crawl time).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from readability_ex_spark.pipeline import run_extraction
from readability_ex_spark.sinks import write_extracted_batch
from readability_ex_spark.sources.pages import PAGES_SCHEMA


def stream_extraction(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint: str,
    *,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
    quality_rules: bool = False,
    scrub_pii_text: bool = False,
    canonical_urls: bool = False,
    blocklist: tuple[str, ...] | None = None,
    respect_robots: bool = False,
    robots_txt_path: str | None = None,
    robots_agent: str = "*",
    hostrank_path: str | None = None,
    host_rank_floor: float = 0.0,
):
    """Start the streaming extraction query. Returns the StreamingQuery.

    ``available_now=True`` drains everything currently present then
    stops (batch-like test/backfill mode); set False for a continuous
    tail of an arriving crawl.

    ``quality_rules``/``scrub_pii_text``/``canonical_urls``/
    ``blocklist``/``respect_robots``/``robots_txt_path`` run the SAME
    stateless corpus-safety stages as the batch job inside each
    micro-batch
    (per-doc column expressions — no cross-batch state, so streaming
    and batch verdicts agree row-for-row by construction; cross-batch
    work like dedup stays with the stateful operators below)."""
    reader = spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    pages = reader.parquet(input_path)

    low_hosts = None
    if hostrank_path and host_rank_floor > 0:
        # batch-computed host PageRank (_hostrank sidecar of a
        # prepare_corpus --host-rank-floor build, or run_job
        # --host-rank) joined as a static side input: PageRank needs
        # the whole graph, so the STREAM never computes it — it
        # consumes the last batch build's ranks, the standard
        # batch-signal-into-stream shape. Threshold resolved once at
        # query start; each micro-batch pays one broadcast anti-join.
        ranks = spark.read.parquet(hostrank_path)
        thr = ranks.agg(
            F.expr(f"approx_percentile(rank, {host_rank_floor})")
        ).collect()[0][0]
        if thr is not None:
            low_hosts = (
                ranks.filter(F.col("rank") < thr)
                .select("host")
                .localCheckpoint(eager=True)
            )

    robots_rules = None
    if robots_txt_path:
        # host-level REP rules (same stage as the batch script): the
        # (host, robots_txt) side table is static batch input, parsed
        # ONCE at query start and checkpointed — each micro-batch only
        # pays the broadcast verdict join
        from readability_ex_spark.operators.robotstxt import parse_robots

        robots_rules = parse_robots(
            spark.read.parquet(robots_txt_path)
        ).localCheckpoint(eager=True)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if canonical_urls:
            from readability_ex_spark.operators.urlops import (
                canonicalize_url,
            )

            batch_df = batch_df.withColumn(
                "url", canonicalize_url(F.col("url"))
            )
        if robots_rules is not None:
            # host-level REP rules depend only on the url — filter the
            # raw batch rows so a disallowed page never pays extraction
            # and the anti-join's two input references re-derive the
            # micro-batch scan, not the kernel (the post-extraction
            # placement ran the UDF stage twice per micro-batch). Same
            # survivor set as the batch script by construction.
            from readability_ex_spark.operators.robotstxt import (
                robots_filter,
            )

            batch_df = robots_filter(
                batch_df, robots_rules, agent=robots_agent
            )
        if low_hosts is not None:
            # the host floor is url-derived too — drop below-floor
            # hosts' pages BEFORE they pay the kernel (the same
            # reasoning as the robots filter above; the anti-join's
            # references re-derive the micro-batch scan, not the UDF)
            from readability_ex_spark.operators.urlops import host_expr

            batch_df = batch_df.join(
                F.broadcast(low_hosts),
                host_expr(F.col("url")) == low_hosts.host,
                "left_anti",
            )
        extracted = run_extraction(batch_df, dedup=True)
        if respect_robots:
            # same position as the batch script: right after extraction,
            # before any other stage spends work on an excluded page;
            # error/empty rows keep flowing (their flags are NULL =
            # unknown = permissive, and the status accounting needs them)
            from readability_ex_spark.operators.policyops import (
                policy_filter,
            )

            extracted = policy_filter(extracted)
        # stage ORDER mirrors scripts/prepare_corpus.py (pii scrub, THEN
        # blocklist): with both flags on, a doc whose only blocklist hit
        # sits inside later-scrubbed text must get the same verdict in
        # both engines — reordering would drop it in one and keep it in
        # the other
        if scrub_pii_text:
            from readability_ex_spark.operators.pii import scrub_pii

            extracted = (
                scrub_pii(extracted)
                .drop("text")
                .withColumnRenamed("text_scrubbed", "text")
            )
        if blocklist:
            from readability_ex_spark.operators.wordlist import (
                wordlist_hits,
            )

            flagged = wordlist_hits(
                extracted, words=blocklist, id_col="url"
            ).filter("flagged")
            extracted = extracted.join(
                flagged.select("url"), "url", "left_anti"
            )
        if quality_rules:
            from readability_ex_spark.operators.corpus import (
                with_quality_rules,
            )

            cols = extracted.columns
            extracted = (
                with_quality_rules(extracted)
                .filter(
                    (F.col("status") != "ok") | F.col("passes_quality")
                )
                .select(*cols)
            )
        write_extracted_batch(extracted, output_path, batch_id)

    writer = (
        pages.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_dedup_first_seen(
    pages_stream: DataFrame,
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Cross-batch url dedup: emit only the FIRST occurrence of each url
    over the stream's lifetime (within a batch, the earliest ``warc_ts``
    row wins deterministically). A crawl feed revisits urls across
    micro-batches, which neither the within-batch dedup nor the
    committed-output anti-join covers while a batch is in flight — this
    is the custom stateful operator for it.

    Scale shape: ``applyInPandasWithState`` keyed by url — the groupBy
    shuffle partitions the state store across executors, each group
    holds ONE boolean, and ``state_ttl_ms`` (processing-time
    milliseconds, e.g. 30 days for a monthly crawl) expires idle urls
    so state stays bounded on an open-ended crawl instead of growing
    with the url universe. Re-arrivals inside the TTL refresh it.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    schema = pages_stream.schema
    cols = [f.name for f in schema.fields]
    ttl = None if state_ttl_ms is None else int(state_ttl_ms)

    def _first_seen(key, pdfs, state):
        import pandas as pd

        from readability_ex_spark.pipeline import html_tiebreak_py

        if state.hasTimedOut:
            state.remove()
            return
        batch = pd.concat(list(pdfs), ignore_index=True)
        seen = state.exists
        state.update((True,))
        if ttl is not None:
            state.setTimeoutDuration(ttl)
        if not seen and len(batch):
            # deterministic winner even on warc_ts ties (arrival order
            # varies across shuffles/replays): break ties on the payload
            # md5 — html_tiebreak_py, the SAME rule (and hash) as the
            # batch dedup_latest_crawl, so a batch backfill of this
            # stream keeps identical rows
            batch = batch.assign(_h=[html_tiebreak_py(h) for h in batch["html"]])
            yield batch.sort_values(
                ["warc_ts", "_h"], kind="stable"
            ).head(1)[cols]

    return pages_stream.groupBy("url").applyInPandasWithState(
        _first_seen,
        outputStructType=schema,
        stateStructType="seen boolean",
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if ttl is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


def stream_dedup_first_seen_event_time(
    pages_stream: DataFrame,
    watermark: str = "2 hours",
    retention_ms: int = 30 * 24 * 3_600_000,  # one monthly-crawl cycle
) -> DataFrame:
    """Event-time variant of ``stream_dedup_first_seen``: state eviction
    is tied to the ``warc_ts`` WATERMARK instead of wall-clock.

    The processing-time TTL variant evicts a url N wall-clock ms after
    it was last processed — replaying a month of backlogged crawl files
    through it in an hour evicts nothing, and a paused-then-resumed
    query evicts everything. Here each url's state times out when the
    event-time watermark passes (newest observed warc_ts for the url +
    ``retention_ms``), so eviction follows CRAWL time: a backfill
    replay evicts exactly what a live run would have, and late
    re-crawls of a url inside the retention horizon still deduplicate.

    Scale shape is unchanged (one boolean per url, shuffled by url);
    timeout timestamps are clamped above the current watermark (Spark
    rejects a timeout the watermark already passed — an url whose only
    observation is a very late row evicts at the next watermark tick).

    Rows with a NULL ``warc_ts`` carry no event time and are excluded
    from event-time dedup (Spark's watermark filter drops them before
    the stateful operator); use the processing-time TTL variant for
    undated feeds.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    stream = pages_stream.withWatermark("warc_ts", watermark)
    schema = pages_stream.schema
    cols = [f.name for f in schema.fields]
    retention = int(retention_ms)

    def _first_seen(key, pdfs, state):
        import pandas as pd

        from readability_ex_spark.pipeline import html_tiebreak_py

        if state.hasTimedOut:
            state.remove()
            return
        batch = pd.concat(list(pdfs), ignore_index=True)
        seen = state.exists
        state.update((True,))
        # evict when the watermark passes newest-observation + retention;
        # must be strictly beyond the current watermark or Spark raises.
        # NULL-dated rows carry no event time: Spark's late-row filter
        # already excludes them from event-time dedup (documented), but a
        # state update for the url may still fire with an all-NaT batch —
        # NaT.timestamp() would raise, so fall back to the next tick.
        wm = state.getCurrentWatermarkMs()
        dated = batch["warc_ts"].dropna()
        if len(dated):
            max_ts_ms = int(dated.max().timestamp() * 1000)
            state.setTimeoutTimestamp(max(max_ts_ms + retention, wm + 1))
        else:
            state.setTimeoutTimestamp(wm + 1)
        if not seen and len(batch):
            batch = batch.assign(_h=[html_tiebreak_py(h) for h in batch["html"]])
            yield batch.sort_values(
                ["warc_ts", "_h"], kind="stable"
            ).head(1)[cols]

    return stream.groupBy("url").applyInPandasWithState(
        _first_seen,
        outputStructType=schema,
        stateStructType="seen boolean",
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def stream_metrics(
    pages_stream: DataFrame,
    *,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window counters over a streaming pages table:
    docs and bytes per (crawl-hour, lang). Late rows beyond the watermark
    are dropped; state stays bounded."""
    return (
        pages_stream.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), F.col("lang"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.octet_length("html")).alias("n_bytes"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "lang",
            "n_docs",
            "n_bytes",
        )
    )
