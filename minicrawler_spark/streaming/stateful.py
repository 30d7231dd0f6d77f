"""Custom stateful streaming operator — per-host crawl session stats
via applyInPandasWithState (north-rule / SURVEY §2.10 extension).

The continuous crawl (streaming/continuous.py) emits result rows per
micro-batch; this operator keeps ONE GroupState per host and folds
each batch's rows into it Arrow-batched:

    pages, bytes, errors, EMA fetch latency, first/last virtual time

emitting the running totals per host per trigger ("update" rows), and
a final `closed=true` row when a host goes quiet for `session_gap_s`
of processing time (GroupStateTimeout) — the streaming analogue of
the reference's per-host bookkeeping that dies with the process
(crawler.c has no cross-run host state at all; this is where the
Spark rebuild goes beyond it).

State is a single tuple, so it survives query restarts through the
checkpoint like every other applyInPandasWithState operator. The EMA
uses alpha=0.25 over the per-row elapsed_ms deltas in (round, seq)
arrival order — deterministic for the fixture web's virtual clock.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("host", StringType()),
        StructField("n_pages", LongType()),
        StructField("n_errors", LongType()),
        StructField("total_bytes", LongType()),
        StructField("ema_elapsed_ms", DoubleType()),
        StructField("last_elapsed_ms", LongType()),
        StructField("closed", BooleanType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n_pages", LongType()),
        StructField("n_errors", LongType()),
        StructField("total_bytes", LongType()),
        StructField("ema_elapsed_ms", DoubleType()),
        StructField("last_elapsed_ms", LongType()),
    ]
)

_EMA_ALPHA = 0.25


def host_session_stats(
    results: DataFrame, session_gap_s: float = 30.0
) -> DataFrame:
    """results (streaming or batch DF with host/outcome/content_length/
    elapsed_ms/round/seq columns) -> per-host running session stats.

    On a streaming DF this is applyInPandasWithState in update mode
    with a processing-time timeout of `session_gap_s`; on a batch DF
    the same fold runs via applyInPandas (no timeout rows) so the
    operator is unit-testable without a stream."""

    def fold(rows_iter, st):
        n_pages, n_errors, total_bytes, ema, last = st
        for pdf in rows_iter:
            pdf = pdf.sort_values(["round", "seq"])
            for outcome, clen, elapsed in zip(
                pdf["outcome"], pdf["content_length"], pdf["elapsed_ms"]
            ):
                n_pages += 1
                if outcome in ("error", "timeout", "robots"):
                    n_errors += 1
                total_bytes += int(clen or 0)
                e = int(elapsed or 0)
                ema = (
                    float(e)
                    if ema is None
                    else (1 - _EMA_ALPHA) * ema + _EMA_ALPHA * e
                )
                last = e
        return n_pages, n_errors, total_bytes, ema, last

    def with_state(key, rows_iter, state):
        import pandas as pd

        (host,) = key
        if state.hasTimedOut:
            n_pages, n_errors, total_bytes, ema, last = state.get
            state.remove()
            yield pd.DataFrame(
                [[host, n_pages, n_errors, total_bytes, ema, last, True]],
                columns=[f.name for f in SESSION_SCHEMA.fields],
            )
            return
        st = state.get if state.exists else (0, 0, 0, None, None)
        n_pages, n_errors, total_bytes, ema, last = fold(rows_iter, st)
        state.update((n_pages, n_errors, total_bytes, ema, last))
        state.setTimeoutDuration(int(session_gap_s * 1000))
        yield pd.DataFrame(
            [[host, n_pages, n_errors, total_bytes, ema, last, False]],
            columns=[f.name for f in SESSION_SCHEMA.fields],
        )

    cols = ["host", "outcome", "content_length", "elapsed_ms", "round", "seq"]
    src = results.select(*cols)

    if results.isStreaming:
        from pyspark.sql.streaming.state import GroupStateTimeout

        return src.groupBy("host").applyInPandasWithState(
            with_state,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )

    # Batch mirror of the same fold (state starts empty, no
    # timeouts). One mapInPandas pass over a host-partitioned frame
    # with a SINGLE pandas groupby per Arrow batch — not one pandas
    # frame per host (1500 hosts at sf0.1 made that 1500 tiny-frame
    # constructions); counts/sums vectorize in C, only the EMA
    # recursion walks each group's (already sorted) value array.
    def batch_stage(batches):
        import numpy as np
        import pandas as pd

        err_set = {"error", "timeout", "robots"}
        # a host's rows can span several Arrow batches of the same
        # partition: concat the partition (its hosts are complete
        # here thanks to the repartition) before grouping
        parts = [pdf for pdf in batches if len(pdf)]
        if parts:
            pdf = pd.concat(parts, ignore_index=True)
            pdf = pdf.sort_values(["host", "round", "seq"])
            pdf["content_length"] = pdf["content_length"].fillna(0)
            pdf["elapsed_ms"] = pdf["elapsed_ms"].fillna(0)
            pdf["_err"] = pdf["outcome"].isin(err_set)
            g = pdf.groupby("host", sort=False)
            agg = g.agg(
                n_pages=("outcome", "size"),
                n_errors=("_err", "sum"),
                total_bytes=("content_length", "sum"),
                last_elapsed_ms=("elapsed_ms", "last"),
            )
            emas = []
            for _, vals in g["elapsed_ms"]:
                ema = None
                for e in vals.to_numpy():
                    e = float(e or 0)
                    ema = (
                        e if ema is None
                        else (1 - _EMA_ALPHA) * ema + _EMA_ALPHA * e
                    )
                emas.append(ema)
            yield pd.DataFrame(
                {
                    "host": agg.index,
                    "n_pages": agg["n_pages"].to_numpy(np.int64),
                    "n_errors": agg["n_errors"].to_numpy(np.int64),
                    "total_bytes": agg["total_bytes"].to_numpy(np.int64),
                    "ema_elapsed_ms": emas,
                    "last_elapsed_ms": agg["last_elapsed_ms"].to_numpy(
                        np.int64
                    ),
                    "closed": False,
                }
            )

    return src.repartition("host").mapInPandas(batch_stage, SESSION_SCHEMA)
