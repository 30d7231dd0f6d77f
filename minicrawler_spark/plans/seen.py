"""Sharded URL-seen filter with bloom-sidecar partition pruning —
the 10^10-URL scale path (north rule; SURVEY.md §4).

Layout: the seen table is parquet (Iceberg in production), hash-
partitioned into `n_shards` by `url_hash % n_shards` and sorted by
url_hash within each shard. A driver-side sidecar keeps one small
bloom filter per shard (bits packed in numpy, built by an Arrow-batch
pass over that shard only).

Query path for a candidate batch:
1. candidates get url_hash = xxhash64(canonical href),
2. the sidecar drops every candidate whose hash misses the shard's
   bloom (no I/O, no shuffle) — at 10^10 URLs with 1% fpp this prunes
   ~99% of the anti-join probe volume,
3. survivors anti-join ONLY their shard's parquet (partition pruning
   via the shard column), co-partitioned on url_hash so the join is
   shuffle-light.

The in-memory bloom here is the single-node stand-in for per-
partition bloom sidecars stored next to Iceberg data files; the
interface (build_shard_blooms / prune / anti_join_seen) is what a
cluster deployment keeps.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["SeenFilter"]


class SeenFilter:
    def __init__(self, spark: SparkSession, path: str, n_shards: int = 16,
                 bloom_bits_per_key: int = 10):
        self.spark = spark
        self.path = path
        self.n_shards = n_shards
        self.bits_per_key = bloom_bits_per_key
        self._blooms: dict = {}   # shard -> (np.uint64 bitset, m_bits)
        self._count = 0

    # -- write path ---------------------------------------------------

    def add(self, hashed: DataFrame) -> None:
        """Append url_hash values (deduped against current content)."""
        novel = self.novel(hashed)
        out = novel.select(
            "url_hash", F.pmod("url_hash", F.lit(self.n_shards)).alias("shard")
        )
        (out.repartition(self.n_shards, "shard")
            .sortWithinPartitions("url_hash")
            .write.mode("append").partitionBy("shard").parquet(self.path))
        self._refresh_blooms()

    def _refresh_blooms(self) -> None:
        df = self.spark.read.parquet(self.path)
        self._count = df.count()
        m_bits = max(1024, self.bits_per_key * max(self._count, 1))
        m_bits = 1 << int(np.ceil(np.log2(m_bits)))
        per_shard = (
            df.groupBy("shard")
            .agg(F.collect_list("url_hash").alias("hs"))
            .collect()
        )
        self._blooms = {}
        for row in per_shard:
            hs = np.array(row["hs"], dtype=np.int64).view(np.uint64)
            bits = np.zeros(m_bits // 64, dtype=np.uint64)
            for salt in (0xDEADBEEF, 0xC0FFEE42):
                idx = ((hs ^ np.uint64(salt)) * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(m_bits)
                # bitwise_or.at: plain fancy-index |= drops duplicate
                # word indices (numpy buffering) -> false negatives
                np.bitwise_or.at(
                    bits, (idx // np.uint64(64)).astype(np.int64),
                    np.uint64(1) << (idx % np.uint64(64)),
                )
            self._blooms[row["shard"]] = (bits, m_bits)

    # -- read path ----------------------------------------------------

    def _bloom_maybe(self, hashes: np.ndarray, shard: int) -> np.ndarray:
        entry = self._blooms.get(shard)
        if entry is None:
            return np.zeros(len(hashes), dtype=bool)
        bits, m_bits = entry
        ok = np.ones(len(hashes), dtype=bool)
        hs = hashes.view(np.uint64)
        for salt in (0xDEADBEEF, 0xC0FFEE42):
            idx = ((hs ^ np.uint64(salt)) * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(m_bits)
            ok &= (bits[idx // np.uint64(64)] >> (idx % np.uint64(64))).astype(bool) & True
        return ok

    def novel(self, candidates: DataFrame) -> DataFrame:
        """Candidates (with url_hash) not yet in the seen set: bloom
        prune first (Arrow UDF, zero I/O), exact anti-join on the
        survivors only."""
        if not self._blooms:
            return candidates
        blooms = self._blooms
        n_shards = self.n_shards

        from pyspark.sql.functions import pandas_udf
        from pyspark.sql.types import BooleanType

        @pandas_udf(BooleanType())
        def maybe_seen(hashes):
            import pandas as pd

            hs = hashes.to_numpy(dtype=np.int64)
            shards = (hs % n_shards + n_shards) % n_shards
            out = np.zeros(len(hs), dtype=bool)
            for shard in np.unique(shards):
                m = shards == shard
                entry = blooms.get(int(shard))
                if entry is None:
                    continue
                bits, m_bits = entry
                sub = hs[m].view(np.uint64)
                ok = np.ones(sub.size, dtype=bool)
                for salt in (0xDEADBEEF, 0xC0FFEE42):
                    idx = ((sub ^ np.uint64(salt)) * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(m_bits)
                    ok &= ((bits[idx // np.uint64(64)] >> (idx % np.uint64(64))) & np.uint64(1)).astype(bool)
                out[m] = ok
            return pd.Series(out)

        flagged = candidates.withColumn("maybe_seen", maybe_seen(F.col("url_hash")))
        fresh = flagged.filter(~F.col("maybe_seen")).drop("maybe_seen")
        suspects = flagged.filter(F.col("maybe_seen")).drop("maybe_seen")
        seen = self.spark.read.parquet(self.path).select("url_hash")
        confirmed_new = suspects.join(seen, "url_hash", "left_anti")
        return fresh.unionByName(confirmed_new)

    @property
    def count(self) -> int:
        return self._count
