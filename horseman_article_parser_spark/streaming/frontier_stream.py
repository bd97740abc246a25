"""Streaming frontier ingestion + crawl metrics (SURVEY §2.9 T1-T8).

The reference's crawl loop is a worker pool pulling from an in-memory
list (/root/reference/scripts/batch-sample-run.js:315-338); its
"rounds" are implicit micro-batches (T1). This module makes that
explicit with Structured Streaming:

- `seed_file_stream` + `StreamingSeedIngest`: new seed-list files
  dropped into a directory arrive as micro-batches (`readStream.text`);
  each batch is trimmed, skip-filtered, canonicalized, claimed against
  the scheduler's URL-seen filter (idempotent bloom test-and-set — a
  replayed batch after failure re-claims already-set bits and yields no
  duplicate frontier rows), and appended to the pending store with
  batch-deterministic seqs. Checkpointing is the streaming engine's
  offset log + our versioned seen-filter manifests (T6).
- `windowed_host_metrics`: per-host windowed counters with a watermark
  for late fetch-completion events (T7/T8) — the streaming restatement
  of the reference's `[progress]` counters
  (/root/reference/scripts/batch-sample-run.js:299-314).

Scale notes: the seed stream shuffles once per batch (the seen-filter's
shard repartition); metrics aggregation is a standard watermarked
hash-agg whose state is bounded by (hosts × open windows).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..functions.urls import canonicalize_url_udf, skip_col
from ..operators.frontier_ops import with_host

# seqs for streamed seeds live above any round-assigned range
STREAM_SEQ_BASE = 1 << 60


def seed_file_stream(spark: SparkSession, seeds_dir: str,
                     max_files_per_trigger: int | None = None) -> DataFrame:
    """S1 as a stream: newline URLs from files appearing in seeds_dir.
    `maxFilesPerTrigger` is the wave-size knob (T1)."""
    reader = spark.readStream.format("text")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.load(seeds_dir)
    return (
        df.select(F.trim("value").alias("url"))
        .filter(F.length("url") > 0)
        .filter(~F.col("url").startswith("#"))
    )


class StreamingSeedIngest:
    """foreachBatch bridge: seed stream → seen-filter claim → pending
    store appends. One instance per scheduler store."""

    def __init__(self, scheduler, batch_seq_stride: int = 1 << 20):
        self.scheduler = scheduler
        self.batch_seq_stride = batch_seq_stride

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        cfg = self.scheduler.config
        cleaned = (
            batch_df.withColumn("url", canonicalize_url_udf(F.col("url")))
            .filter(F.col("url").isNotNull() & ~skip_col(F.col("url")))
            .dropDuplicates(["url"])
        )
        claimed = self.scheduler.seen.claim_unseen(cleaned)
        # deterministic per-batch seq: url-order rank inside the batch
        from ..operators.frontier_ops import ordered_zip_with_index

        from ..plans.crawl import FRONTIER_COLS

        ranked = ordered_zip_with_index(claimed, ["url"], out_col="_idx")
        base = STREAM_SEQ_BASE + batch_id * self.batch_seq_stride
        # Emit the FULL frontier schema: pending/<round> holds 7-column
        # files from init/run_round; appending a 5-column file makes the
        # merged read resolve to an arbitrary footer (attempt/not_before
        # silently dropped, or streamed rows read NULL not_before and are
        # never scheduled). attempt=0 / not_before=0 = immediately eligible.
        rows = with_host(
            ranked.select(
                "url",
                (F.lit(base) + F.col("_idx")).alias("seq"),
                F.lit(0).alias("depth"),
                F.lit(0.0).alias("priority"),
                F.lit(0).alias("attempt"),
                F.lit(0).cast("long").alias("not_before"),
            )
        ).filter(F.col("host").isNotNull()).select(*FRONTIER_COLS)
        last = self.scheduler.store.last_round()
        pending_path = self.scheduler.store.path("pending", last)
        rows.write.mode("append").parquet(pending_path)
        _ = cfg  # politeness applies at wave selection, not ingest

    def start(self, seeds_dir: str, checkpoint_dir: str,
              max_files_per_trigger: int | None = None) -> StreamingQuery:
        stream = seed_file_stream(
            self.scheduler.spark, seeds_dir, max_files_per_trigger
        )
        return (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("append")
            .start()
        )


def windowed_host_metrics(
    events: DataFrame,
    window_duration: str = "1 minute",
    watermark: str = "2 minutes",
    time_col: str = "event_time",
    source_col: str | None = None,
    phase_col: str | None = None,
) -> DataFrame:
    """T7/T8: per-host fetch counters over event-time windows with a
    watermark bounding late-data state.

    source_col: when given, adds the A2 source-count split — n_amp /
    n_dynamic totals per group (the reference logs amp vs dynamic fetch
    totals per run, batch-sample-run.js:376-377).
    phase_col: when given, adds the T8 progress/lineage surface —
    `phases` is the ordered distinct set of phase tags seen in the
    window (the reference emits phase-tagged parse:status progress
    lines, index.js:136-158) and `last_event` the progress watermark
    (latest event time). All additions are plain streaming-safe
    aggregates — no extra shuffle beyond the existing window+host one."""
    aggs = [
        F.count("*").alias("scheduled"),
        F.sum(F.when(F.col("status") == 200, 1).otherwise(0)).alias("ok"),
        F.sum(F.when(F.col("status") != 200, 1).otherwise(0)).alias("err"),
        F.avg("fetch_ms").alias("avg_ms"),
    ]
    extra = []
    if source_col is not None:
        aggs += [
            F.sum(F.when(F.col(source_col) == "amp", 1).otherwise(0))
            .alias("n_amp"),
            F.sum(F.when(F.col(source_col) != "amp", 1).otherwise(0))
            .alias("n_dynamic"),
        ]
        extra += ["n_amp", "n_dynamic"]
    if phase_col is not None:
        aggs += [
            F.array_join(F.sort_array(F.collect_set(F.col(phase_col))), ",")
            .alias("phases"),
            F.max(F.col(time_col)).alias("last_event"),
        ]
        extra += ["phases", "last_event"]
    return (
        events.withWatermark(time_col, watermark)
        .groupBy(F.window(time_col, window_duration).alias("win"), "host")
        .agg(*aggs)
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "host", "scheduled", "ok", "err", "avg_ms", *extra,
        )
    )
