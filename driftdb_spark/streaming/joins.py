"""Stream-stream interval join: event-time attribution.

The reference's streaming surface is WebSocket event subscription only
(reference crates/driftdb-server/src/session.rs — push, no joins); joining
two live streams is a beyond-reference operator the pipeline mandate needs
(e.g. impression→conversion attribution while data arrives).

The one code path serves batch and streaming: ``interval_join`` takes two
DataFrames (either kind) and emits matches where the right event lands in
``[left.ts, left.ts + within]`` for the same user. On streams, the
watermarks plus the two-sided time-range condition are what BOUND the join
state: Spark can drop a buffered left row once the right watermark passes
``left.ts + within`` (and vice versa), so state is O(rate × window), not
O(stream). Without the range condition a stream-stream inner join buffers
forever — that's the difference between a demo and an operator that
survives a week of uptime.

Scale: state shards by the equi-key (user_id) across executors; the range
condition is evaluated post-shuffle. Skewed users would hot-spot one state
partition — the mitigation is the same salting used in agg_skew_salted,
trading one extra dedup for balanced state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from driftdb_spark.catalog import load_tables
from driftdb_spark.registry import register


def interval_join(
    left: DataFrame,
    right: DataFrame,
    within: str = "30 minutes",
    watermark: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join ``right`` events onto ``left`` events of the same user within
    ``[left.ts, left.ts + within]``. Pass ``watermark`` when both inputs
    are streaming (required for bounded state + append output).

    ``how="left_outer"`` emits unmatched left rows with NULL right columns
    — on a stream, only once the right watermark passes ``left.ts +
    within`` (the row is then provably unmatchable; this is how Spark can
    emit a negative result from an infinite input). Unconverted-view /
    abandonment analysis is exactly this shape."""
    if watermark is not None:
        left = left.withWatermark("ts", watermark)
        right = right.withWatermark("ts", watermark)
    v, p = left.alias("v"), right.alias("p")
    cond = (
        (F.col("v.user_id") == F.col("p.user_id"))
        & (F.col("p.ts") >= F.col("v.ts"))
        & (F.col("p.ts") <= F.col("v.ts") + F.expr(f"INTERVAL {within}"))
    )
    # user_id coalesces across sides so FULL OUTER right-only rows
    # (orphan conversions) keep their key; for inner/left it is v's value.
    return v.join(p, cond, how).select(
        F.col("v.event_id").alias("view_id"),
        F.col("p.event_id").alias("purchase_id"),
        F.coalesce(F.col("v.user_id"), F.col("p.user_id")).alias("user_id"),
        (F.unix_millis(F.col("p.ts")) - F.unix_millis(F.col("v.ts"))).alias("delay_ms"),
    )


@register(
    "join_event_attribution",
    oracle="""
    SELECT v.event_id AS view_id,
           p.event_id AS purchase_id,
           v.user_id AS user_id,
           epoch_ms(CAST(p.ts AS TIMESTAMP)) - epoch_ms(CAST(v.ts AS TIMESTAMP))
               AS delay_ms
    FROM events v
    JOIN events p
      ON v.user_id = p.user_id
     AND p.ts >= v.ts
     AND p.ts <= v.ts + INTERVAL 30 MINUTE
    WHERE v.event_type = 'view' AND p.event_type = 'purchase'
    """,
    tags=("join", "streaming"),
)
def join_event_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch form of the stream-stream attribution join: purchases within 30
    minutes after a view by the same user. Same ``interval_join`` code path
    the streaming parity test drives with watermarks."""
    e = load_tables(spark, sf_dir)["events"]
    views = e.where(F.col("event_type") == "view")
    purchases = e.where(F.col("event_type") == "purchase")
    return interval_join(views, purchases, within="30 minutes")


def enrich_with_dim(stream: DataFrame, dim: DataFrame, key: str = "user_id") -> DataFrame:
    """Stream-static enrichment join: attach a batch-computed dimension
    (user profile, document metadata, model features) to a live event
    stream. Stream-static joins need no watermark — the static side is
    re-resolved per micro-batch (so a refreshed dim table is picked up on
    the next batch) and holds NO streaming state. The dim is broadcast:
    each micro-batch is a map-side hash join, the stream never shuffles.
    At 100 TB-of-stream scale that's the only shape that keeps up; a dim
    too big to broadcast should be pre-bucketed on the key instead
    (sources/connectors.write_bucketed)."""
    return stream.join(F.broadcast(dim), key, "left")


@register(
    "join_attribution_unconverted",
    oracle="""
    SELECT v.event_id AS view_id,
           p.event_id AS purchase_id,
           v.user_id AS user_id,
           epoch_ms(CAST(p.ts AS TIMESTAMP)) - epoch_ms(CAST(v.ts AS TIMESTAMP))
               AS delay_ms
    FROM (SELECT * FROM events WHERE event_type = 'view') v
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON v.user_id = p.user_id
     AND p.ts >= v.ts
     AND p.ts <= v.ts + INTERVAL 30 MINUTE
    """,
    tags=("join", "streaming"),
)
def join_attribution_unconverted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER form of the attribution join: every view, with its
    in-window purchases OR a NULL row if none came — the
    abandonment-analysis shape. Batch here; the SAME ``interval_join`` code
    path runs stream-stream with watermarks, where Spark emits each NULL
    row once the right watermark proves no purchase can still arrive
    (stream≡batch parity pytest drives that)."""
    e = load_tables(spark, sf_dir)["events"]
    views = e.where(F.col("event_type") == "view")
    purchases = e.where(F.col("event_type") == "purchase")
    return interval_join(views, purchases, within="30 minutes", how="left_outer")


@register(
    "join_attribution_full_outer",
    oracle="""
    SELECT v.event_id AS view_id,
           p.event_id AS purchase_id,
           COALESCE(v.user_id, p.user_id) AS user_id,
           epoch_ms(CAST(p.ts AS TIMESTAMP)) - epoch_ms(CAST(v.ts AS TIMESTAMP))
               AS delay_ms
    FROM (SELECT * FROM events WHERE event_type = 'view') v
    FULL JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON v.user_id = p.user_id
     AND p.ts >= v.ts
     AND p.ts <= v.ts + INTERVAL 30 MINUTE
    """,
    tags=("join", "streaming"),
)
def join_attribution_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER attribution: unconverted views AND orphan conversions
    (purchases with no in-window view — the attribution-integrity signal
    left-outer silently drops) in one result. Completes the
    stream-capable join matrix: the same ``interval_join`` path runs
    stream-stream full-outer with watermarks on both sides, each NULL
    row emitted once the OPPOSITE side's watermark proves no match can
    arrive (stream≡batch parity pytest drives that)."""
    e = load_tables(spark, sf_dir)["events"]
    views = e.where(F.col("event_type") == "view")
    purchases = e.where(F.col("event_type") == "purchase")
    return interval_join(views, purchases, within="30 minutes", how="full_outer")
