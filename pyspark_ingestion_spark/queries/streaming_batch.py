"""Windowed/event-time queries (batch + real Structured Streaming).

Tumbling and sliding windows run as batch expressions; the
``streaming_*`` entries run genuine ``readStream`` pipelines to
completion (AvailableNow → memory sink) and still oracle-check against
plain SQL — streaming and batch must agree on static input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_ingestion_spark.queries import query
from pyspark_ingestion_spark.sources.readers import load_table
from pyspark_ingestion_spark.streaming.pipeline import (
    read_stream_table,
    run_stream_to_memory,
    sessionized,
    tumbling_counts,
)

_TUMBLING_ORACLE = """
    SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
           time_bucket(INTERVAL 1 HOUR, ts) + INTERVAL 1 HOUR AS window_end,
           event_type,
           count(*) AS n
    FROM events
    GROUP BY 1, 2, 3
    """


@query("window_tumbling", oracle=_TUMBLING_ORACLE)
def window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling window counts per event type (batch)."""
    e = load_table(spark, sf_dir, "events")
    return tumbling_counts(e, "1 hour")


_SLIDING_ORACLE = """
    WITH offsets AS (SELECT unnest([0, 30]) AS off_min)
    SELECT time_bucket(INTERVAL 30 MINUTE, ts) - to_minutes(off_min) AS window_start,
           time_bucket(INTERVAL 30 MINUTE, ts) - to_minutes(off_min) + INTERVAL 1 HOUR
               AS window_end,
           event_type,
           count(*) AS n
    FROM events CROSS JOIN offsets
    GROUP BY 1, 2, 3
    """


def sliding_counts(events, window_size="1 hour", slide="30 minutes"):
    """Sliding-window counts per event type — shared by the batch and
    streaming entries so the must-agree pair can never drift apart."""
    return (
        events.groupBy(F.window("ts", window_size, slide), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n",
        )
    )


@query("window_sliding", oracle=_SLIDING_ORACLE)
def window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 30 minutes — each event lands in 2 windows."""
    e = load_table(spark, sf_dir, "events")
    return sliding_counts(e)


_SESSION_ORACLE = """
    WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         <= INTERVAL 5 MINUTE THEN 0 ELSE 1 END AS new_session
        FROM events
    ),
    numbered AS (
        SELECT user_id, ts,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    )
    SELECT min(ts) AS session_start,
           max(ts) + INTERVAL 5 MINUTE AS session_end,
           user_id,
           count(*) AS n_events
    FROM numbered
    GROUP BY user_id, session_id
    """


@query("window_session", oracle=_SESSION_ORACLE)
def window_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session windows (5-min inactivity) per user.

    Spark native ``session_window``; oracle is the classic
    gaps-and-islands construction — window end = last event + gap.
    """
    e = load_table(spark, sf_dir, "events")
    return sessionized(e, "5 minutes")


@query("streaming_tumbling", oracle=_TUMBLING_ORACLE)
def streaming_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Structured Streaming: readStream → windowed agg → memory sink.

    AvailableNow processes the whole static source then stops; the
    result must equal the batch tumbling query — checked against the
    same SQL oracle.
    """
    stream = read_stream_table(spark, sf_dir, "events")
    agg = tumbling_counts(stream, "1 hour")
    return run_stream_to_memory(agg, output_mode="complete")



@query("streaming_sliding", oracle=_SLIDING_ORACLE)
def streaming_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Structured Streaming sliding windows (1 h window / 30 min
    slide): each event feeds two window states. Complete mode over
    AvailableNow must equal the batch sliding query — same SQL oracle
    as window_sliding. State per key is bounded by (windows per event ×
    open windows); in production append mode + a watermark bounds it."""
    stream = read_stream_table(spark, sf_dir, "events")
    return run_stream_to_memory(sliding_counts(stream), output_mode="complete")


@query("streaming_late_data_watermark", oracle=None)  # stateful policy → rows-only
def streaming_late_data_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked streaming agg (10-min lateness bound) in append mode.

    With AvailableNow over a static source the watermark finalizes all
    but the trailing window(s); emitted rows are a subset of the batch
    result decided by Spark's watermark advancement — a policy, not a
    SQL-expressible value, hence rows-only.
    """
    stream = read_stream_table(spark, sf_dir, "events")
    agg = tumbling_counts(stream.withWatermark("ts", "10 minutes"), "1 hour")
    return run_stream_to_memory(agg, output_mode="append")


@query(
    "streaming_session",
    oracle=_SESSION_ORACLE,
)
def streaming_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL streaming session windows: readStream → session_window agg →
    memory sink; must equal the batch gaps-and-islands oracle."""
    stream = read_stream_table(spark, sf_dir, "events")
    return run_stream_to_memory(sessionized(stream, "5 minutes"), output_mode="complete")


@query(
    "streaming_dedup_watermark",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def streaming_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup: ``dropDuplicatesWithinWatermark`` on the key.

    Only the key columns are emitted (which duplicate of a key survives
    depends on arrival order — the key set is the deterministic part, and
    equals batch DISTINCT).
    """
    stream = read_stream_table(spark, sf_dir, "events")
    deduped = (
        stream.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    return run_stream_to_memory(deduped, output_mode="append")


@query(
    "streaming_stateful_user_totals",
    oracle="""
    SELECT user_id, count(*) AS n_events, ROUND(SUM(value), 2) AS total_value
    FROM events
    GROUP BY user_id
    """,
)
def streaming_stateful_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator: applyInPandasWithState running totals.

    State-store-backed per-user accumulators (see streaming/stateful.py);
    one AvailableNow pass over the static source makes the running totals
    equal the batch aggregate, giving the stateful path an exact oracle.
    """
    from pyspark_ingestion_spark.streaming.stateful import running_user_totals

    stream = read_stream_table(spark, sf_dir, "events")
    return run_stream_to_memory(running_user_totals(stream), output_mode="update")


@query(
    "streaming_static_join",
    oracle="""
    WITH dim AS (SELECT user_id, min(event_type) AS first_type
                 FROM events GROUP BY user_id)
    SELECT e.event_id, e.user_id, d.first_type
    FROM events e JOIN dim d ON e.user_id = d.user_id
    WHERE e.event_type = 'purchase'
    """,
)
def streaming_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: streaming events enriched against a static
    dimension (computed batch-side). The static side is re-read per
    micro-batch by Spark; no state store involved — the streaming
    analog of a broadcast dim join, exact against the batch oracle.
    """
    static_dim = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.min("event_type").alias("first_type"))
    )
    stream = read_stream_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    joined = stream.join(static_dim, "user_id").select(
        "event_id", "user_id", "first_type"
    )
    return run_stream_to_memory(joined, output_mode="append")


@query(
    "streaming_stream_stream_join",
    oracle="""
    SELECT a.event_id AS purchase_id, b.event_id AS click_id,
           a.user_id, a.ts AS purchase_ts, b.ts AS click_ts
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND a.event_type = 'purchase' AND b.event_type = 'click'
     AND b.ts >= a.ts - INTERVAL 1 HOUR AND b.ts <= a.ts
    """,
)
def streaming_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join: purchases matched to same-user clicks in
    the preceding hour.

    Both sides carry event-time watermarks so the state store can evict
    rows outside the join window — the bounded-state construction that
    lets this run forever on unbounded streams. On the static source one
    AvailableNow pass yields exactly the batch interval-join result.
    """
    purchases = (
        read_stream_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "2 hours")
    )
    clicks = (
        read_stream_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("click_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "2 hours")
    )
    joined = purchases.join(
        clicks,
        (F.col("user_id") == F.col("click_user"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("click_ts") <= F.col("purchase_ts")),
    ).select("purchase_id", "click_id", "user_id", "purchase_ts", "click_ts")
    return run_stream_to_memory(joined, output_mode="append")
