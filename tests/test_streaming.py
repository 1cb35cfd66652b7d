"""Structured Streaming ingest: event stream → materialized state, and
watermarked windowed aggregation (batch/stream parity)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from driftdb_spark.events import EventLog
from driftdb_spark.streaming.ingest import (
    read_event_stream,
    start_state_materializer,
    windowed_event_counts,
)


@pytest.fixture
def log(spark, tmp_path):
    log = EventLog(spark, str(tmp_path / "tbl"), pk_col="id")
    log.insert(
        spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "id int, name string, value int"
        )
    )
    log.soft_delete(spark.createDataFrame([(2,)], "id int"))
    return log


def test_stream_materializes_state(spark, log, tmp_path):
    state_path = str(tmp_path / "state")
    q = start_state_materializer(
        spark,
        log._events_dir,
        state_path,
        checkpoint_dir=str(tmp_path / "ckpt"),
        available_now=True,
    )
    q.awaitTermination(120)
    state = spark.read.parquet(state_path)
    pks = {r.pk for r in state.collect()}
    assert pks == {"1", "3"}  # pk 2 soft-deleted

    # late-arriving micro-batch: new insert + delete of pk 3 → incremental merge
    log.upsert(spark.createDataFrame([(4, "d", 40)], "id int, name string, value int"))
    log.soft_delete(spark.createDataFrame([(3,)], "id int"))
    q2 = start_state_materializer(
        spark, log._events_dir, state_path, str(tmp_path / "ckpt"), available_now=True
    )
    q2.awaitTermination(120)
    pks = {r.pk for r in spark.read.parquet(state_path).collect()}
    assert pks == {"1", "4"}


def test_windowed_counts_stream_equals_batch(spark, log, tmp_path):
    """The same windowed aggregation over the stream (availableNow → memory
    sink) and over the batch read must agree — Structured Streaming's
    unified-semantics contract."""
    stream = windowed_event_counts(read_event_stream(spark, log._events_dir), "1 hour")
    q = (
        stream.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r.win_start, r.event_type): (r.n, r.sum_value)
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    batch = {
        (r.win_start, r.event_type): (r.n, r.sum_value)
        for r in windowed_event_counts(log.events(), "1 hour").collect()
    }
    assert streamed == batch and len(batch) > 0
