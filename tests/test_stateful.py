"""applyInPandasWithState per-host session stats
(streaming/stateful.py): cross-batch accumulation, EMA determinism,
processing-time session closure, and the batch mirror."""

import os
import time

import pytest

from minicrawler_spark.streaming.stateful import host_session_stats

ROWS_SCHEMA = (
    "host string, outcome string, content_length long, "
    "elapsed_ms long, round int, seq long"
)


def _write_batch(spark, d, name, rows):
    # one flat parquet FILE per micro-batch (the file-stream source
    # does not descend into the directories Spark's writer creates)
    import pyarrow as pa
    import pyarrow.parquet as pq

    cols = ["host", "outcome", "content_length", "elapsed_ms",
            "round", "seq"]
    table = pa.table(
        {c: [r[i] for r in rows] for i, c in enumerate(cols)},
        schema=pa.schema(
            [
                ("host", pa.string()), ("outcome", pa.string()),
                ("content_length", pa.int64()), ("elapsed_ms", pa.int64()),
                ("round", pa.int32()), ("seq", pa.int64()),
            ]
        ),
    )
    tmp = os.path.join(d, ".tmp-" + name)
    pq.write_table(table, tmp)
    os.replace(tmp, os.path.join(d, name + ".parquet"))


def _start(spark, src_dir, out_dir, ck_dir, gap_s):
    stream = spark.readStream.schema(ROWS_SCHEMA).parquet(src_dir)
    stats = host_session_stats(stream, session_gap_s=gap_s)

    def sink(df, _epoch):
        if not df.isEmpty():
            df.write.mode("append").parquet(out_dir)

    return (
        stats.writeStream.outputMode("update")
        .option("checkpointLocation", ck_dir)
        .foreachBatch(sink)
        .trigger(processingTime="1 second")
        .start()
    )


def _wait_rows(spark, out_dir, pred, timeout=60, query=None):
    deadline = time.time() + timeout
    rows = []
    while time.time() < deadline:
        if query is not None and query.exception() is not None:
            raise AssertionError("query failed: %s" % query.exception())
        try:
            rows = spark.read.parquet(out_dir).collect()
            if pred(rows):
                return rows
        except Exception:
            pass
        time.sleep(0.5)
    raise AssertionError("condition not reached; last=%r" % (rows,))


def test_stateful_accumulates_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    os.makedirs(src)

    _write_batch(spark, src, "b1", [
        ("a.test", "done", 100, 10, 0, 1),
        ("a.test", "done", 300, 20, 0, 2),
        ("b.test", "error", 0, 5, 0, 3),
    ])
    q = _start(spark, src, out, ck, gap_s=300.0)  # no timeouts here
    try:
        rows = _wait_rows(
            spark, out, lambda rs: any(r["host"] == "a.test" for r in rs),
            query=q,
        )
        a1 = [r for r in rows if r["host"] == "a.test"][-1]
        assert a1["n_pages"] == 2
        assert a1["total_bytes"] == 400
        # EMA in (round, seq) order: 10 then 0.75*10 + 0.25*20 = 12.5
        assert a1["ema_elapsed_ms"] == pytest.approx(12.5)
        b1 = [r for r in rows if r["host"] == "b.test"][-1]
        assert b1["n_errors"] == 1

        # second batch: a.test continues (state carried), c.test new
        _write_batch(spark, src, "b2", [
            ("a.test", "timeout", 0, 40, 1, 4),
            ("c.test", "done", 50, 8, 1, 5),
        ])
        rows = _wait_rows(
            spark, out,
            lambda rs: any(
                r["host"] == "a.test" and r["n_pages"] == 3 for r in rs
            ),
            query=q,
        )
        a2 = [r for r in rows if r["host"] == "a.test" and
              r["n_pages"] == 3][0]
        assert a2["n_errors"] == 1
        assert a2["total_bytes"] == 400
        assert a2["ema_elapsed_ms"] == pytest.approx(
            0.75 * 12.5 + 0.25 * 40
        )
        assert not a2["closed"]
    finally:
        q.stop()


def test_stateful_state_survives_query_restart(spark, tmp_path):
    """VERDICT r2 #7: the per-host GroupState must survive a query
    restart through the state checkpoint — kill the continuous query
    mid-stream, restart from the same checkpoint, and the post-restart
    session stats must equal an uninterrupted run's (same totals,
    same EMA continuation; matching test_stateful_accumulates'
    expected values for the identical input)."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    os.makedirs(src)

    _write_batch(spark, src, "b1", [
        ("a.test", "done", 100, 10, 0, 1),
        ("a.test", "done", 300, 20, 0, 2),
        ("b.test", "error", 0, 5, 0, 3),
    ])
    q = _start(spark, src, out, ck, gap_s=300.0)
    try:
        _wait_rows(
            spark, out,
            lambda rs: any(
                r["host"] == "a.test" and r["n_pages"] == 2 for r in rs
            ),
            query=q,
        )
    finally:
        q.stop()  # kill mid-stream; b2 arrives while the query is down

    _write_batch(spark, src, "b2", [
        ("a.test", "timeout", 0, 40, 1, 4),
        ("c.test", "done", 50, 8, 1, 5),
    ])
    q2 = _start(spark, src, out, ck, gap_s=300.0)  # same checkpoint
    try:
        rows = _wait_rows(
            spark, out,
            lambda rs: any(
                r["host"] == "a.test" and r["n_pages"] == 3 for r in rs
            ),
            query=q2,
        )
    finally:
        q2.stop()
    a2 = [r for r in rows if r["host"] == "a.test" and r["n_pages"] == 3][0]
    # totals continue from the CHECKPOINTED state, not from zero
    assert a2["n_errors"] == 1
    assert a2["total_bytes"] == 400
    # EMA continues the pre-restart sequence: 0.75*12.5 + 0.25*40
    assert a2["ema_elapsed_ms"] == pytest.approx(19.375)
    c = [r for r in rows if r["host"] == "c.test"][-1]
    assert c["n_pages"] == 1 and c["total_bytes"] == 50


def test_stateful_session_closes_on_gap(spark, tmp_path):
    """A host quiet past session_gap_s gets its ProcessingTimeTimeout
    fired on a later trigger and emits one closed=true summary row
    carrying the accumulated state."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    os.makedirs(src)

    _write_batch(spark, src, "b1", [("b.test", "error", 0, 5, 0, 1)])
    q = _start(spark, src, out, ck, gap_s=2.0)
    try:
        _wait_rows(
            spark, out,
            lambda rs: any(r["host"] == "b.test" for r in rs),
            query=q,
        )
        time.sleep(4)  # let the session gap expire
        # a later batch (any data) lets the engine fire the timeout
        _write_batch(spark, src, "b2", [("c.test", "done", 10, 9, 1, 2)])
        rows = _wait_rows(
            spark, out,
            lambda rs: any(r["host"] == "b.test" and r["closed"]
                           for r in rs),
            query=q,
        )
        bclosed = [r for r in rows if r["host"] == "b.test" and
                   r["closed"]][0]
        assert bclosed["n_pages"] == 1 and bclosed["n_errors"] == 1
        # closure emitted exactly once, and the session really ended:
        assert sum(1 for r in rows
                   if r["host"] == "b.test" and r["closed"]) == 1
    finally:
        q.stop()


def test_stateful_batch_mirror(spark):
    """The same fold over a BATCH DataFrame (applyInPandas): feeds the
    oracle-style checks without a stream."""
    df = spark.createDataFrame(
        [
            ("a.test", "done", 100, 10, 0, 1),
            ("a.test", "error", 0, 30, 0, 2),
            ("b.test", "done", 7, 4, 0, 3),
        ],
        ROWS_SCHEMA,
    )
    got = {r["host"]: r for r in host_session_stats(df).collect()}
    assert got["a.test"]["n_pages"] == 2
    assert got["a.test"]["n_errors"] == 1
    assert got["a.test"]["total_bytes"] == 100
    assert got["a.test"]["ema_elapsed_ms"] == pytest.approx(15.0)
    assert got["b.test"]["last_elapsed_ms"] == 4
