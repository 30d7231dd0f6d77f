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

    # batch mirror of the same fold (state starts empty, no timeouts)
    def batch_fold(pdf):
        import pandas as pd

        host = pdf["host"].iloc[0]
        n_pages, n_errors, total_bytes, ema, last = fold(
            iter([pdf]), (0, 0, 0, None, None)
        )
        return pd.DataFrame(
            [[host, n_pages, n_errors, total_bytes, ema, last, False]],
            columns=[f.name for f in SESSION_SCHEMA.fields],
        )

    return src.groupBy("host").applyInPandas(batch_fold, SESSION_SCHEMA)
