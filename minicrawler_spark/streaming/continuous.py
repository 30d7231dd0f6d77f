"""Continuous crawling on Structured Streaming — the SURVEY §2.10
extension (the reference is a bounded batch over argv; this mode runs
the same round logic incrementally, micro-batch per frontier slice).

Topology:

    {frontier_dir}/*.tsv  --readStream-->  foreachBatch(round)
          ^                                   |         |
          |   discovered links (depth+1)      |         v
          +-----------------------------------+   {output_dir} parquet

- the frontier is a FILE STREAMING SOURCE of tab-separated
  `depth \t url` lines; discovered links are written back into the
  same directory, so BFS happens through the stream itself (each
  wave is a new micro-batch) and Spark's checkpointLocation tracks
  which frontier files are already consumed — restart-safe offsets,
- URL-seen state persists across batches (and restarts) in the
  bloom-sharded SeenFilter (plans/seen.py) under the checkpoint dir,
- per-host crawl-order state (host counts for cross-batch host_seq)
  persists through the SnapshotCatalog table "host_stats",
- each micro-batch runs the SAME crawl_round as batch mode: window
  politeness, host-salted repartition, mapInPandas fetch — so all
  protocol semantics are shared, not reimplemented.

`applyInPandasWithState` is the alternative for per-host state; the
foreachBatch formulation is chosen because the frontier feedback loop
(links -> new source files) needs a sink side-effect anyway, and
state lives in storage (restartable) rather than executor memory.
"""

from __future__ import annotations

import json
import os
import uuid
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import CrawlSettings
from .crawl import (
    FRONTIER_SCHEMA,
    _canonicalize_df,
    crawl_round,
    finalize_results,
)
from ..plans.snapshots import SnapshotCatalog


def write_seeds(frontier_dir: str, urls, depth: int = 0) -> str:
    """Drop a frontier file (depth\\turl per line) into the stream."""
    os.makedirs(frontier_dir, exist_ok=True)
    name = os.path.join(
        frontier_dir, "seeds-%s.tsv" % uuid.uuid4().hex[:12]
    )
    tmp = name + ".tmp"
    with open(tmp, "w") as f:
        for u in urls:
            f.write("%d\t%s\n" % (depth, u))
    os.replace(tmp, name)  # atomic: the file source never sees partials
    return name


def _to_frontier(batch: DataFrame, settings: CrawlSettings) -> DataFrame:
    from pyspark.sql.types import BinaryType, LongType, StringType

    return batch.select(
        F.lit(0).alias("index"),
        F.col("rawurl"),
        F.lit(None).cast(StringType()).alias("base"),
        F.col("depth").cast("int").alias("depth"),
        F.xxhash64("rawurl").alias("seq"),
        F.col("depth").cast("double").alias("priority"),
        F.lit(settings.max_redirects).alias("redirect_limit"),
        F.lit("GET").alias("method"),
        F.lit(None).cast(BinaryType()).alias("post"),
        F.lit(None).cast(StringType()).alias("authorization"),
        F.lit(False).alias("auth_attempt"),
        F.lit("[]").alias("cookies_json"),
        F.lit("[]").alias("redirect_json"),
        F.lit(None).cast(StringType()).alias("customheader"),
        F.lit(0).cast(LongType()).alias("elapsed_ms"),
    )


def crawl_stream(
    spark: SparkSession,
    frontier_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    settings: Optional[CrawlSettings] = None,
    fetcher_spec: str = "minicrawler_spark.sources.fixtures:fixture_fetcher",
    trigger_seconds: float = 1.0,
    archive_dir: Optional[str] = None,
    archive_partitions: int = 8,
):
    """Start the continuous crawl; returns the StreamingQuery.

    `archive_dir`: when given, every micro-batch's done pages are
    ALSO archived as rolled .warc.gz files there (sources/warc.py
    write_warc) before bodies are dropped from the parquet results —
    the streaming twin of the batch crawl->archive pipeline.
    Idempotent across epoch replays: the batch is deterministically
    repartitioned (fixed `archive_partitions` count, hash of url)
    and sorted within partitions before writing, so a replayed
    epoch — even on a restarted cluster with different parallelism —
    produces the same per-file record sets, hence the same
    content-digest-derived file names, and rewrites identical bytes
    atomically instead of duplicating records."""
    settings = settings or CrawlSettings()
    catalog = SnapshotCatalog(checkpoint_dir)
    seen_filter = None
    if settings.dedup:
        from ..plans.seen import SeenFilter

        # the round-2 SeenFilter reloads its sidecar manifest in the
        # constructor, so restart-resume needs no explicit refresh
        seen_filter = SeenFilter(spark, checkpoint_dir + "/seen")

    stream = (
        spark.readStream.schema("depth INT, rawurl STRING")
        .option("sep", "\t")
        .csv(frontier_dir)
    )

    import dataclasses

    run_settings = (
        dataclasses.replace(settings, per_host_budget=0)
        if settings.per_host_budget > 0
        else settings
    )

    def process_batch(batch: DataFrame, epoch_id: int):
        if batch.isEmpty():
            return
        frontier = _to_frontier(batch, settings)
        canon = _canonicalize_df(frontier).localCheckpoint(eager=True)

        if settings.per_host_budget > 0:
            # budget cut BEFORE the seen-add: deferred rows go back
            # into the frontier stream as fresh files, so they must
            # not be marked seen yet
            from pyspark.sql import Window

            valid = canon.filter(F.col("errkind") == "")
            bad = canon.filter(F.col("errkind") != "")
            w = Window.partitionBy("host").orderBy("priority", "seq")
            slotted = valid.withColumn(
                "bslot", F.row_number().over(w) - 1
            )
            deferred = slotted.filter(
                F.col("bslot") >= settings.per_host_budget
            ).select("depth", "rawurl")
            if not deferred.isEmpty():
                (deferred.coalesce(1).write.mode("append")
                 .option("sep", "\t").csv(frontier_dir))
            canon = (
                slotted.filter(F.col("bslot") < settings.per_host_budget)
                .drop("bslot")
                .unionByName(bad)
            ).localCheckpoint(eager=True)

        if seen_filter is not None:
            valid = canon.filter(F.col("errkind") == "")
            bad = canon.filter(F.col("errkind") != "")
            hashed = valid.withColumn("url_hash", F.xxhash64("href"))
            novel = seen_filter.novel(hashed).localCheckpoint(eager=True)
            seen_filter.add(novel.select("url_hash"), assume_novel=True)
            canon = novel.drop("url_hash").unionByName(bad)

        if settings.respect_robots:
            # robots rules persist across micro-batches (and restarts)
            # through the catalog table; new hosts fetched per batch
            from .crawl import ROBOTS_SCHEMA, _robots_gate, fetch_robots

            sdict = settings.as_dict()
            sdict["fetcher"] = fetcher_spec
            valid = canon.filter(F.col("errkind") == "")
            bad = canon.filter(F.col("errkind") != "")
            try:
                robots_df = catalog.read(
                    spark, "robots", schema=ROBOTS_SCHEMA
                )
            except FileNotFoundError:
                robots_df = None
            hosts = valid.select("host", "hostname", "scheme").dropDuplicates(
                ["host"]
            )
            if robots_df is not None:
                hosts = hosts.join(robots_df.select("host"), "host", "left_anti")
            new_robots = fetch_robots(hosts, fetcher_spec, sdict)
            robots_df = (
                new_robots if robots_df is None
                else robots_df.unionByName(new_robots)
            ).localCheckpoint(eager=True)
            catalog.commit(
                "robots", robots_df, snapshot_id=int(epoch_id) + 1,
                summary={"epoch": int(epoch_id)},
            )
            valid, denied = _robots_gate(valid, robots_df, int(epoch_id))
            denied.write.mode("append").parquet(output_dir + "_robots_denied")
            canon = valid.unionByName(bad, allowMissingColumns=True)

        try:
            host_counts = catalog.read(
                spark, "host_stats", schema="host string, host_count long"
            )
        except FileNotFoundError:
            host_counts = None

        parallelism = spark.sparkContext.defaultParallelism
        n_parts = min(parallelism, max(1, canon.count() // 100 + 1))
        fetched, errors, _deferred = crawl_round(
            canon, run_settings, fetcher_spec, int(epoch_id), host_counts,
            n_parts, pre_canonicalized=True,
        )
        fetched = fetched.localCheckpoint(eager=True)

        done = fetched.filter(
            ~F.col("outcome").isin("redirect", "auth_retry")
        )
        err_rows = errors.select(
            *[f.name for f in FRONTIER_SCHEMA.fields],
            "href", "host", "hostname", "scheme", "path_query",
            "outcome", "status", "error_msg", "round",
        )
        if archive_dir is not None:
            from ..sources.warc import write_warc

            write_warc(
                done.repartition(
                    archive_partitions, F.xxhash64("url")
                ).sortWithinPartitions("url"),
                archive_dir,
            ).collect()
        out = finalize_results(
            done.unionByName(err_rows, allowMissingColumns=True)
        ).drop("body", "head", "post")
        out.write.mode("append").parquet(output_dir)

        # cross-batch host_seq continuity
        new_counts = fetched.groupBy("host").agg(
            F.count("*").alias("host_count_new")
        )
        if host_counts is not None:
            merged = (
                host_counts.join(new_counts, "host", "outer")
                .fillna(0)
                .select(
                    "host",
                    (F.col("host_count") + F.col("host_count_new")).alias(
                        "host_count"
                    ),
                )
            )
        else:
            merged = new_counts.select(
                "host", F.col("host_count_new").alias("host_count")
            )
        catalog.commit(
            "host_stats", merged, snapshot_id=int(epoch_id) + 1,
            summary={"epoch": int(epoch_id)},
        )

        # feedback loop: discovered links become new frontier files,
        # written distributed (the file source picks up new part
        # files; no driver-side collect)
        if settings.extract_links:
            links_df = (
                fetched.filter(
                    (F.col("outcome") == "done")
                    & (F.col("depth") < settings.max_depth)
                )
                .select(
                    (F.col("depth") + 1).alias("depth"),
                    F.explode(
                        F.from_json("links_json", "array<string>")
                    ).alias("rawurl"),
                )
                .dropDuplicates(["rawurl"])
            )
            if not links_df.isEmpty():
                (links_df.coalesce(1).write.mode("append")
                 .option("sep", "\t").csv(frontier_dir))

    query = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir + "/offsets")
        .trigger(processingTime="%d milliseconds" % int(trigger_seconds * 1000))
        .start()
    )
    return query
