"""Structured Streaming ingest: event stream → materialized state, and
watermarked windowed aggregation (batch/stream parity)."""

from __future__ import annotations

import os

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

    # third micro-batch: PATCH must merge field-by-field into state
    # materialized batches ago (streaming fold shares EventLog semantics)
    log.patch(spark.createDataFrame([(4, 99)], "id int, value int"))
    q3 = start_state_materializer(
        spark, log._events_dir, state_path, str(tmp_path / "ckpt"), available_now=True
    )
    q3.awaitTermination(120)
    rows = {r.pk: r.row for r in spark.read.parquet(state_path).collect()}
    assert rows["4"]["value"] == "99"  # patched field
    assert rows["4"]["name"] == "d"  # untouched field survives the patch
    assert rows["1"]["name"] == "a"


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

def test_stateful_running_totals_across_microbatches(spark, log, tmp_path):
    """applyInPandasWithState: per-key state must accumulate across
    micro-batches (maxFilesPerTrigger=1 forces multiple batches per run)."""
    from driftdb_spark.streaming.ingest import stateful_running_totals

    # second write → second parquet file → second micro-batch
    log.upsert(
        spark.createDataFrame([(1, "a2", 15), (4, "d", 40)], "id int, name string, value int")
    )
    stream = (
        spark.readStream.schema(log.events().schema)
        .option("maxFilesPerTrigger", 1)
        # the log publishes each append as a batch-* subdirectory
        .option("recursiveFileLookup", "true")
        .parquet(log._events_dir)
    )
    totals = stateful_running_totals(stream)
    q = (
        totals.writeStream.format("memory")
        .queryName("running_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .start()
    )
    q.awaitTermination(180)
    # update-mode memory sink appends each batch's emissions; last row per pk
    # is the final state
    rows = spark.sql(
        "SELECT * FROM running_totals ORDER BY last_seq"
    ).collect()
    final = {r.pk: r for r in rows}
    # pk 1: insert(v=10) + upsert(v=15) → 2 events, total_value 25
    assert final["1"].total_events == 2 and final["1"].total_value == 25.0
    # pk 2: insert + soft_delete (delete has no value payload) → 2 events
    assert final["2"].total_events == 2 and final["2"].total_value == 20.0
    assert final["4"].total_events == 1 and final["4"].total_value == 40.0


def test_session_window_stream_equals_batch(spark, log, tmp_path):
    """Native session windows: streaming (availableNow, complete mode) and
    batch evaluation of the same session_window aggregation agree."""
    from driftdb_spark.streaming.ingest import session_window_stats

    stream = session_window_stats(read_event_stream(spark, log._events_dir))
    q = (
        stream.writeStream.format("memory")
        .queryName("sess_stats")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt4"))
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r.user_id, r.sess_start): (r.n_events, r.first_seq, r.last_seq)
        for r in spark.sql("SELECT * FROM sess_stats").collect()
    }
    batch = {
        (r.user_id, r.sess_start): (r.n_events, r.first_seq, r.last_seq)
        for r in session_window_stats(log.events()).collect()
    }
    assert streamed == batch and len(batch) > 0


def test_stream_dedup_within_watermark(spark, log, tmp_path):
    """dropDuplicatesWithinWatermark: identical payloads re-sent within the
    watermark window collapse to one row; distinct payloads all survive."""
    from driftdb_spark.streaming.ingest import dedup_stream

    # re-send pk 1's exact insert payload (same content, new sequence/ts)
    ev = log.events()
    dup = ev.filter((F.col("pk") == "1") & (F.col("event_type") == "INSERT")).select(
        (F.col("sequence") + 100).alias("sequence"),
        F.current_timestamp().alias("ts"),
        "event_type",
        "pk",
        "payload",
    )
    dup.write.mode("append").parquet(log._events_dir)

    stream = dedup_stream(read_event_stream(spark, log._events_dir))
    q = (
        stream.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt5"))
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM dedup_out").collect()
    # 4 original events (3 inserts + 1 delete) + 1 duplicate → 4 survivors
    assert len(out) == 4
    keys = [r.content_key for r in out]
    assert len(keys) == len(set(keys))
    # batch parity: the same transformation on the batch frame, deduped on
    # the SAME canonical content key (shared expression — entry-order
    # canonicalized, NULL payloads keyed per-event so distinct deletes
    # never collapse), yields the same survivor multiset
    from driftdb_spark.streaming.ingest import content_key_col

    batch_keys = {
        r.content_key
        for r in log.events()
        .withColumn("content_key", content_key_col())
        .dropDuplicates(["content_key"])
        .collect()
    }
    assert set(keys) == batch_keys


def test_interval_join_stream_equals_batch(spark, tmp_path):
    """Stream-stream attribution join (watermarked, range-bounded state)
    must emit exactly the batch interval-join result."""
    from driftdb_spark.catalog import load_tables
    from driftdb_spark.streaming.joins import interval_join

    e = load_tables(spark, "/root/testdata/sf0.001")["events"]
    src = str(tmp_path / "events_src")
    e.write.parquet(src)
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)

    joined = interval_join(
        stream.where(F.col("event_type") == "view"),
        stream.where(F.col("event_type") == "purchase"),
        within="30 minutes",
        watermark="1 hour",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("attrib_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.view_id, r.purchase_id)
        for r in spark.sql("SELECT * FROM attrib_stream").collect()
    }
    batch = interval_join(
        e.where(F.col("event_type") == "view"),
        e.where(F.col("event_type") == "purchase"),
        within="30 minutes",
    )
    want = {(r.view_id, r.purchase_id) for r in batch.collect()}
    assert got == want and len(want) > 0


def test_stream_static_enrichment_equals_batch(spark, tmp_path):
    """Stream-static broadcast join: live events enriched with a
    batch-computed per-user profile must emit exactly the batch join
    result, with no watermark and no streaming state."""
    from driftdb_spark.catalog import load_tables
    from driftdb_spark.streaming.joins import enrich_with_dim

    e = load_tables(spark, "/root/testdata/sf0.001")["events"]
    profile = e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("lifetime_events"),
        F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("ltv"),
    )
    src = str(tmp_path / "events_src")
    e.write.parquet(src)
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)

    q = (
        enrich_with_dim(
            stream.select("event_id", "user_id"), profile
        )
        .writeStream.format("memory")
        .queryName("enriched_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt_enrich"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.event_id, r.lifetime_events, r.ltv)
        for r in spark.sql("SELECT * FROM enriched_stream").collect()
    }
    want = {
        (r.event_id, r.lifetime_events, r.ltv)
        for r in enrich_with_dim(e.select("event_id", "user_id"), profile).collect()
    }
    assert got == want and len(want) > 0


def test_stateful_operator_recovers_from_checkpoint(spark, tmp_path):
    """Checkpoint recovery: a stateful query stopped and RESTARTED over the
    same checkpoint must resume its per-key state, not recount — the final
    totals over two runs (half the data each) must equal one batch pass
    over everything. This is the property that makes streaming state
    durable across executor loss / redeploys on a real cluster."""
    import pyspark.sql.functions as SF

    from driftdb_spark.catalog import load_tables
    from driftdb_spark.streaming.ingest import stateful_running_totals

    e = (
        load_tables(spark, "/root/testdata/sf0.001")["events"]
        .select(
            SF.col("event_id").alias("sequence"),
            SF.col("user_id").cast("string").alias("pk"),
            SF.create_map(SF.lit("value"), SF.col("value").cast("string")).alias(
                "payload"
            ),
        )
    )
    half1 = e.where(SF.col("sequence") % 2 == 0)
    half2 = e.where(SF.col("sequence") % 2 == 1)
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt_recover")
    half1.coalesce(1).write.mode("append").parquet(src)
    out = str(tmp_path / "emissions")

    def run_once():
        # memory sink can't recover from a checkpoint; foreachBatch (the
        # production sink shape) can — append every emission to parquet
        stream = spark.readStream.schema(e.schema).parquet(src)
        q = (
            stateful_running_totals(stream)
            .writeStream.foreachBatch(
                lambda df, _bid: df.write.mode("append").parquet(out)
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()  # processes half1, state checkpointed
    half2.coalesce(1).write.mode("append").parquet(src)
    run_once()  # NEW query instance, same checkpoint: must resume, not recount

    # totals are monotone per key, so the final state is the max emission
    latest = {
        r.pk: (r.total_events, r.last_seq)
        for r in spark.read.parquet(out)
        .groupBy("pk")
        .agg(
            SF.max("total_events").alias("total_events"),
            SF.max("last_seq").alias("last_seq"),
        )
        .collect()
    }
    want = {
        r.pk: (r.total_events, r.last_seq)
        for r in e.groupBy("pk").agg(
            SF.count(SF.lit(1)).alias("total_events"),
            SF.max("sequence").alias("last_seq"),
        ).collect()
    }
    # every key's final emission reflects BOTH halves
    mismatched = {k: (latest[k], want[k]) for k in want if latest.get(k) != want[k]}
    assert not mismatched and len(want) > 0, str(list(mismatched.items())[:3])


def test_foreach_batch_sink_is_idempotent(spark, tmp_path):
    """Re-delivering an already-committed batch id (what Structured
    Streaming does after a failure) must not duplicate or clobber rows;
    the streamed total must equal the source exactly once."""
    from driftdb_spark.catalog import load_tables
    from driftdb_spark.streaming.ingest import idempotent_parquet_sink

    e = load_tables(spark, "/root/testdata/sf0.001")["events"].select(
        "event_id", "user_id"
    )
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    e.write.parquet(src)

    sink = idempotent_parquet_sink(out)
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    n_src = e.count()
    assert spark.read.parquet(out).count() == n_src

    # simulate post-failure re-delivery of batch 0 with (bogus) new data:
    # the committed batch must win and nothing may change
    sink(e.limit(5), 0)
    assert spark.read.parquet(out).count() == n_src


# -- round-4: out-of-order delivery robustness (ADVICE r3: maxFilesPerTrigger
# + mtime-tie ordering can deliver a Patch before its base Insert)


def _ev(spark, rows):
    from driftdb_spark.events import EVENT_SCHEMA

    return spark.createDataFrame(rows, EVENT_SCHEMA)


def test_merge_parks_patch_delivered_before_insert(spark, tmp_path):
    """A Patch delivered a trigger BEFORE its Insert (file-source mtime tie)
    must not be dropped forever: it parks in the pending sidecar and folds
    in — at its original sequence — once the Insert arrives."""
    import datetime

    from driftdb_spark.streaming.ingest import _merge_batch_into_state

    t = datetime.datetime(2026, 1, 1)
    state_path = str(tmp_path / "state")
    merge = _merge_batch_into_state(state_path)

    # trigger 0: the patch (seq 2) arrives first
    merge(_ev(spark, [(2, t, "PATCH", "1", {"qty": "99"})]), 0)
    assert spark.read.parquet(state_path).count() == 0

    # trigger 1: the base insert (seq 1) arrives; parked patch folds in
    merge(_ev(spark, [(1, t, "INSERT", "1", {"id": "1", "name": "a", "qty": "1"})]), 1)
    row = spark.read.parquet(state_path).first()
    assert row["row"]["name"] == "a" and row["row"]["qty"] == "99"
    assert row["last_seq"] == 2
    # pending sidecar drained
    assert spark.read.parquet(state_path + ".pending").count() == 0


def test_merge_parks_delete_delivered_before_insert(spark, tmp_path):
    """A SoftDelete delivered before its Insert applies by SEQUENCE order
    once both are visible: delete seq > insert seq ⇒ the key stays dead,
    even though the delete was delivered first."""
    import datetime

    from driftdb_spark.streaming.ingest import _merge_batch_into_state

    t = datetime.datetime(2026, 1, 1)
    state_path = str(tmp_path / "state")
    merge = _merge_batch_into_state(state_path)

    merge(_ev(spark, [(3, t, "SOFT_DELETE", "2", None)]), 0)
    merge(
        _ev(
            spark,
            [
                (1, t, "INSERT", "1", {"id": "1", "name": "a"}),
                (2, t, "INSERT", "2", {"id": "2", "name": "b"}),
            ],
        ),
        1,
    )
    pks = {r.pk for r in spark.read.parquet(state_path).collect()}
    assert pks == {"1"}  # pk 2 deleted by the earlier-delivered, later-sequenced event


def test_interval_outer_join_stream_equals_batch(spark, tmp_path):
    """Stream-stream LEFT OUTER interval join: matched rows equal the batch
    result exactly; NULL (unconverted) rows appear exactly for the views
    the final watermark could prove unmatchable — i.e. views whose match
    window closed before (max event ts - watermark)."""
    from driftdb_spark.catalog import load_tables
    from driftdb_spark.streaming.joins import interval_join

    e = load_tables(spark, "/root/testdata/sf0.001")["events"]
    src = str(tmp_path / "events_src")
    e.write.parquet(src)
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)

    joined = interval_join(
        stream.where(F.col("event_type") == "view"),
        stream.where(F.col("event_type") == "purchase"),
        within="30 minutes",
        watermark="1 hour",
        how="left_outer",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("attrib_outer_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt_outer"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("SELECT * FROM attrib_outer_stream").collect()
    got_matched = {(r.view_id, r.purchase_id) for r in got if r.purchase_id is not None}
    got_null_views = {r.view_id for r in got if r.purchase_id is None}

    batch = interval_join(
        e.where(F.col("event_type") == "view"),
        e.where(F.col("event_type") == "purchase"),
        within="30 minutes",
        how="left_outer",
    ).collect()
    batch_matched = {
        (r.view_id, r.purchase_id) for r in batch if r.purchase_id is not None
    }
    batch_null_views = {r.view_id for r in batch if r.purchase_id is None}

    assert got_matched == batch_matched and len(batch_matched) > 0
    # a stream can only emit a NULL row once the watermark PROVES no match
    # can arrive; at availableNow end-of-stream that's views whose window
    # closed before max(ts) - watermark. Those must all have been emitted,
    # and nothing the batch says is converted may stream as unconverted.
    import datetime

    max_ts = e.agg(F.max("ts")).first()[0]
    horizon = max_ts - datetime.timedelta(hours=1)
    provable = {
        r.event_id
        for r in e.where(F.col("event_type") == "view")
        .withColumn("close", F.col("ts") + F.expr("INTERVAL 30 minutes"))
        .filter(F.col("close") < F.lit(horizon))
        .select("event_id")
        .collect()
    }
    assert got_null_views <= batch_null_views
    assert (batch_null_views & provable) <= got_null_views


def test_stateful_rolling_zscore_stream_equals_batch(spark, tmp_path):
    """Stream ≡ batch parity for the anomaly detector: the stateful
    streaming operator over two time-ordered micro-batches must flag the
    same events as the registered batch window operator."""
    from driftdb_spark.registry import QUERIES, query_map
    from driftdb_spark.streaming.ingest import stateful_rolling_zscore

    query_map()
    sf = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{sf}/events.parquet")
    cut = ev.approxQuantile("event_id", [0.5], 0.0)[0]
    src = str(tmp_path / "evstream")
    # two time-ordered files → two micro-batches (events are ts-ordered by
    # event_id in the testdata generator; split preserves per-key ts order)
    ev.filter(F.col("event_id") <= cut).coalesce(1).write.parquet(f"{src}/f1")
    ev.filter(F.col("event_id") > cut).coalesce(1).write.parquet(f"{src}/f2")

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    q = (
        stateful_rolling_zscore(stream)
        .writeStream.format("memory")
        .queryName("zscore_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_z"))
        .start()
    )
    q.awaitTermination(180)
    got = {
        r.event_id: r.zscore for r in spark.sql("SELECT * FROM zscore_stream").collect()
    }
    want = {
        r.event_id: r.zscore
        for r in QUERIES["events_rolling_zscore"].fn(spark, sf).collect()
    }
    assert set(got) == set(want)
    assert all(abs(got[k] - want[k]) < 1e-5 for k in want)
    assert len(want) > 0  # the parity is over a non-trivial anomaly set


def test_cdc_feed_stream_equals_batch(spark, tmp_path):
    """Stream ≡ batch parity for the change-data-feed: the streamed feed
    (two separate runs = state handed across micro-batch generations)
    must equal the batch derivation over the full log in one pass."""
    from driftdb_spark.events import EventLog
    from driftdb_spark.streaming.ingest import cdc_records, start_cdc_feed

    log = EventLog(spark, str(tmp_path / "t"), pk_col="id")
    log.upsert(
        spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20)], "id int, name string, value int"
        )
    )
    log.patch(spark.createDataFrame([(1, 11)], "id int, value int"))

    state_path = str(tmp_path / "state")
    feed_path = str(tmp_path / "feed")
    q = start_cdc_feed(
        spark, log._events_dir, state_path, feed_path, str(tmp_path / "ck")
    )
    q.awaitTermination(120)

    # second generation: delete, re-insert, patch — old images must come
    # from the state materialized by the FIRST run
    log.soft_delete(spark.createDataFrame([(2,)], "id int"))
    log.upsert(spark.createDataFrame([(3, "c", 30)], "id int, name string, value int"))
    log.patch(spark.createDataFrame([(3, 33)], "id int, value int"))
    q2 = start_cdc_feed(
        spark, log._events_dir, state_path, feed_path, str(tmp_path / "ck")
    )
    q2.awaitTermination(120)

    got = {
        (r.sequence, r.pk, r.change_type,
         None if r.old_row is None else r.old_row.get("value"),
         None if r.new_row is None else r.new_row.get("value"))
        for r in spark.read.parquet(feed_path).collect()
    }
    empty = spark.createDataFrame([], "pk string, row map<string,string>")
    want = {
        (r.sequence, r.pk, r.change_type,
         None if r.old_row is None else r.old_row.get("value"),
         None if r.new_row is None else r.new_row.get("value"))
        for r in cdc_records(log.events(), empty).collect()
    }
    assert got == want and len(want) == 6
    # spot-check semantics: the patch to pk 3 carries the full after-image
    by_seq = {r.sequence: r for r in spark.read.parquet(feed_path).collect()}
    upd3 = [r for r in by_seq.values() if r.pk == "3" and r.change_type == "update"]
    assert upd3[0].new_row["name"] == "c" and upd3[0].new_row["value"] == "33"
    assert upd3[0].old_row["value"] == "30"
    del3 = [r for r in by_seq.values() if r.pk == "2" and r.change_type == "delete"]
    assert del3[0].old_row["value"] == "20" and del3[0].new_row is None


def test_interval_full_outer_join_stream_equals_batch(spark, tmp_path):
    """Stream-stream FULL OUTER interval join: matched rows equal batch;
    NULL rows on EITHER side appear exactly when the opposite watermark
    could prove them unmatchable by end-of-stream."""
    import datetime

    from driftdb_spark.catalog import load_tables
    from driftdb_spark.streaming.joins import interval_join

    e = load_tables(spark, "/root/testdata/sf0.001")["events"]
    src = str(tmp_path / "events_src_fo")
    e.write.parquet(src)
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)

    joined = interval_join(
        stream.where(F.col("event_type") == "view"),
        stream.where(F.col("event_type") == "purchase"),
        within="30 minutes",
        watermark="1 hour",
        how="full_outer",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("attrib_fo_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt_fo"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("SELECT * FROM attrib_fo_stream").collect()
    got_matched = {
        (r.view_id, r.purchase_id)
        for r in got
        if r.view_id is not None and r.purchase_id is not None
    }
    got_orphan_purchases = {r.purchase_id for r in got if r.view_id is None}

    batch = interval_join(
        e.where(F.col("event_type") == "view"),
        e.where(F.col("event_type") == "purchase"),
        within="30 minutes",
        how="full_outer",
    ).collect()
    batch_matched = {
        (r.view_id, r.purchase_id)
        for r in batch
        if r.view_id is not None and r.purchase_id is not None
    }
    batch_orphans = {r.purchase_id for r in batch if r.view_id is None}

    assert got_matched == batch_matched and len(batch_matched) > 0
    # orphan purchases the stream emits must be real orphans, and every
    # orphan whose window provably closed must have been emitted
    max_ts = e.agg(F.max("ts")).first()[0]
    # a purchase at p is unmatchable once the view watermark passes p,
    # but Spark's right-side eviction runs on the DERIVED constraint
    # (p within [v, v+30min]) AND the watermark it applies lags one
    # micro-batch behind the data that produced it — rows near the
    # stream end may only emit when a later batch arrives. The provable
    # horizon is therefore conservative: watermark (1h) + join window
    # (30min) + a batch of slack.
    horizon = max_ts - datetime.timedelta(hours=3)
    provable = {
        r.event_id
        for r in e.where(F.col("event_type") == "purchase")
        .filter(F.col("ts") < F.lit(horizon))
        .select("event_id")
        .collect()
    }
    assert got_orphan_purchases <= batch_orphans
    assert (batch_orphans & provable) <= got_orphan_purchases


# -- round-13 review findings: contiguous-frontier merge, crash-safe swap,
# CDC replay/pending correctness, canonical dedup key


def _state_rows(spark, state_path):
    return {
        r.pk: (r.last_seq, dict(r.row))
        for r in spark.read.parquet(state_path).collect()
    }


def _batch_oracle(spark, events):
    from driftdb_spark.events import fold_events

    return {
        r.pk: (r.last_seq, dict(r.row))
        for r in fold_events(_ev(spark, events)).collect()
    }


def test_merge_folds_patch_below_materialized_highwater(spark, tmp_path):
    """Review-found parity break: a Patch delivered a trigger AFTER a
    later-sequenced event of the same pk folded against collapsed state
    and was silently LOST (its sequence fell below the pk's materialized
    last_seq, so the fold's tail filter dropped it). The
    contiguous-frontier rule parks the later event until the gap fills,
    so the fold only ever sees complete history — stream ≡ batch
    exactly."""
    import datetime

    from driftdb_spark.streaming.ingest import _merge_batch_into_state

    t = datetime.datetime(2026, 1, 1)
    state_path = str(tmp_path / "state")
    merge = _merge_batch_into_state(state_path)
    all_events = [
        (1, t, "INSERT", "1", {"id": "1", "f": "x", "g": "y"}),
        (2, t, "PATCH", "1", {"f": "a"}),
        (3, t, "PATCH", "1", {"g": "b"}),
    ]
    # delivery order: seq 3 lands a trigger before seq 2 (mtime tie)
    merge(_ev(spark, [all_events[0], all_events[2]]), 0)
    merge(_ev(spark, [all_events[1]]), 1)
    assert _state_rows(spark, state_path) == _batch_oracle(spark, all_events)
    row = _state_rows(spark, state_path)["1"]
    assert row[1]["f"] == "a" and row[1]["g"] == "b"  # seq 2 NOT lost
    # pending drained once the gap filled
    assert spark.read.parquet(state_path + ".pending").count() == 0


def test_merge_applies_delete_below_materialized_highwater(spark, tmp_path):
    """The SOFT_DELETE twin of the reordering break: delete seq 2
    delivered after patch seq 3 used to fold as del_seq < ins_seq and
    the key stayed live, while batch replay kills it (patch after delete
    is ignored). Frontier parking restores exact batch semantics."""
    import datetime

    from driftdb_spark.streaming.ingest import _merge_batch_into_state

    t = datetime.datetime(2026, 1, 1)
    state_path = str(tmp_path / "state")
    merge = _merge_batch_into_state(state_path)
    all_events = [
        (1, t, "INSERT", "1", {"id": "1", "f": "x"}),
        (2, t, "SOFT_DELETE", "1", None),
        (3, t, "PATCH", "1", {"f": "a"}),
    ]
    merge(_ev(spark, [all_events[0], all_events[2]]), 0)
    merge(_ev(spark, [all_events[1]]), 1)
    assert _state_rows(spark, state_path) == {}  # dead, exactly like batch
    assert _batch_oracle(spark, all_events) == {}


def test_merge_redelivery_is_idempotent(spark, tmp_path):
    """At-least-once replay: re-delivering an already-folded micro-batch
    (<= frontier duplicates) must leave state bit-identical."""
    import datetime

    from driftdb_spark.streaming.ingest import _merge_batch_into_state

    t = datetime.datetime(2026, 1, 1)
    state_path = str(tmp_path / "state")
    merge = _merge_batch_into_state(state_path)
    events = [
        (1, t, "INSERT", "1", {"id": "1", "f": "x"}),
        (2, t, "PATCH", "1", {"f": "a"}),
    ]
    merge(_ev(spark, events), 0)
    before = _state_rows(spark, state_path)
    merge(_ev(spark, events), 1)  # replay
    assert _state_rows(spark, state_path) == before


@pytest.mark.deepfuzz
def test_merge_swap_crash_lattice_every_rename_step(spark, tmp_path):
    """Review-found: the old rmtree-then-rename swap destroyed the state
    table on a crash between the two calls, with no recovery path. The
    rename-aside protocol + _heal_swaps must survive a crash at EVERY
    rename of the swap sequence: after each injected crash, the
    re-delivered micro-batch (streaming's at-least-once contract) heals
    and converges to the exact batch fold."""
    import datetime

    from driftdb_spark.streaming import ingest as ing

    t = datetime.datetime(2026, 1, 1)
    base = [(1, t, "INSERT", "1", {"id": "1", "f": "x"})]
    nxt = [
        (2, t, "PATCH", "1", {"f": "a"}),
        (3, t, "INSERT", "2", {"id": "2", "f": "y"}),
    ]
    oracle = _batch_oracle(spark, base + nxt)

    real_rename = os.rename
    for crash_at in range(4):  # state aside, state in, pend aside, pend in
        state_path = str(tmp_path / f"state{crash_at}")
        merge = ing._merge_batch_into_state(state_path)
        merge(_ev(spark, base), 0)

        calls = {"n": 0}

        def dying_rename(src, dst, *, _c=calls, _k=crash_at, **kw):
            # count only swap renames (paths inside this state family)
            if ".b1." in src or src.endswith((".pending", f"state{_k}")):
                if _c["n"] == _k:
                    raise OSError(5, "injected crash mid-swap")
                _c["n"] += 1
            return real_rename(src, dst, **kw)

        os.rename = dying_rename
        try:
            try:
                merge(_ev(spark, nxt), 1)
                crashed = False
            except OSError:
                crashed = True
        finally:
            os.rename = real_rename
        # redelivery of the same batch heals whatever the crash left
        merge(_ev(spark, nxt), 1)
        assert _state_rows(spark, state_path) == oracle, (
            f"crash at rename #{crash_at} (crashed={crashed}) diverged"
        )
        assert not os.path.exists(state_path + ".old")
        assert not os.path.exists(state_path + ".pending.old")


def test_cdc_feed_images_survive_replay_and_parked_events(spark, tmp_path):
    """Two review-found CDC defects, pinned together: (a) a replayed
    batch_id must NOT recompute its images against the already-advanced
    state (old_row == new_row corruption) — the committed partition is
    skipped; (b) a parked out-of-order event emits its change record the
    trigger it actually FOLDS (with the true prior image), not a noop
    the trigger it was delivered."""
    import datetime

    from driftdb_spark.streaming.ingest import _cdc_emitter, _merge_batch_into_state

    t = datetime.datetime(2026, 1, 1)
    state_path = str(tmp_path / "state")
    feed_path = str(tmp_path / "feed")
    merge = _merge_batch_into_state(
        state_path, on_eligible=_cdc_emitter(feed_path)
    )

    # trigger 0: the patch (seq 2) arrives BEFORE its insert -> parked,
    # and the feed's batch 0 partition holds no noop for it
    merge(_ev(spark, [(2, t, "PATCH", "1", {"f": "a"})]), 0)
    b0 = spark.read.parquet(os.path.join(feed_path, "batch_id=0"))
    assert b0.count() == 0

    # trigger 1: the insert arrives; BOTH events fold and BOTH records
    # emit with exact images
    merge(_ev(spark, [(1, t, "INSERT", "1", {"id": "1", "f": "x"})]), 1)
    b1 = {
        r.sequence: r
        for r in spark.read.parquet(os.path.join(feed_path, "batch_id=1")).collect()
    }
    assert b1[1].change_type == "insert" and b1[1].old_row is None
    assert b1[2].change_type == "update"
    assert dict(b1[2].old_row) == {"id": "1", "f": "x"}
    assert dict(b1[2].new_row) == {"id": "1", "f": "a"}

    # replay of batch 1 AFTER the state advanced: the committed images
    # must stand (recomputing would yield old_row == new_row garbage)
    merge(_ev(spark, [(1, t, "INSERT", "1", {"id": "1", "f": "x"})]), 1)
    b1_after = {
        r.sequence: r
        for r in spark.read.parquet(os.path.join(feed_path, "batch_id=1")).collect()
    }
    assert dict(b1_after[2].old_row) == {"id": "1", "f": "x"}
    assert dict(b1_after[2].new_row) == {"id": "1", "f": "a"}


def test_content_key_is_canonical_and_null_safe(spark):
    """Review-found: the dedup content key hashed unsorted map entries
    (equal payloads with different entry order got different keys) and
    hashed NULL payloads to NULL (every soft-delete collapsed into one
    dedup bucket). The canonical key sorts entries and keys NULL
    payloads per-event."""
    import datetime

    from driftdb_spark.streaming.ingest import content_key_col

    t = datetime.datetime(2026, 1, 1)
    df = _ev(
        spark,
        [
            (1, t, "INSERT", "1", {"a": "1", "b": "2"}),
            (2, t, "INSERT", "2", {"b": "2", "a": "1"}),  # same content, other order
            (3, t, "SOFT_DELETE", "1", None),
            (4, t, "SOFT_DELETE", "2", None),  # distinct delete, NULL payload
        ],
    ).withColumn("k", content_key_col())
    rows = {r.sequence: r.k for r in df.collect()}
    assert rows[1] == rows[2], "entry order must not change the key"
    assert rows[3] is not None and rows[4] is not None
    assert rows[3] != rows[4], "distinct deletes must not collapse"
