"""Batch sessionization: split each user's event stream into sessions
separated by > 30 minutes of inactivity.

Classic two-window composition (lag → gap flag → cumulative sum), ONE
shuffle on user_id shared by both windows — Spark plans a single
Exchange and two Window operators over the same sort order. This is the
batch twin of streaming ``session_window`` (streaming/ module).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pcap_to_parquet_spark.registry import query
from pcap_to_parquet_spark.sources import load_table

GAP_SECONDS = 30 * 60

SESSIONIZE_ORACLE = f"""
WITH flagged AS (
    SELECT user_id, ts, event_id, value,
           CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w) <= {GAP_SECONDS} * 1000000
                THEN 0 ELSE 1 END AS new_session
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
    SELECT user_id, ts, value,
           CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS session_id
    FROM flagged
)
SELECT user_id, session_id, COUNT(*) AS n_events,
       ROUND(SUM(value), 4) AS session_value,
       epoch_us(MIN(ts)) AS session_start, epoch_us(MAX(ts)) AS session_end
FROM sessions
GROUP BY user_id, session_id
"""


@query("q_sessionize", SESSIONIZE_ORACLE)
def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_ok = (
        F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)) <= GAP_SECONDS * 1_000_000
    )
    flagged = e.withColumn("new_session", F.when(gap_ok, 0).otherwise(1))
    with_session = flagged.withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    # session bounds as epoch-micros BIGINT on both sides: raw timestamp
    # outputs land as datetime64[ns] from Spark but [us] from DuckDB, and
    # the driver's value hash is representation-sensitive (r1 lesson).
    return with_session.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("session_value"),
        F.unix_micros(F.min("ts")).alias("session_start"),
        F.unix_micros(F.max("ts")).alias("session_end"),
    )


# ---------------------------------------------------------------------------
# native session_window aggregation (the built-in twin of the manual
# gaps-and-islands sessionization above)

SESSION_WINDOW_ORACLE = f"""
WITH flagged AS (
    SELECT user_id, ts, event_id, value,
           CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w) < {GAP_SECONDS} * 1000000
                THEN 0 ELSE 1 END AS new_session
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
    SELECT user_id, ts, value,
           CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS session_id
    FROM flagged
)
SELECT user_id,
       epoch_us(MIN(ts)) AS session_start,
       epoch_us(MAX(ts)) + {GAP_SECONDS} * 1000000 AS session_end,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 4) AS session_value
FROM sessions
GROUP BY user_id, session_id
"""


@query("q_session_window", SESSION_WINDOW_ORACLE)
def session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via the BUILT-IN ``session_window`` aggregate —
    one groupBy, no window functions: Spark's native session operator
    merges events closer than the gap into one window whose end is
    last_event + gap. Cross-validates q_sessionize (hand-rolled
    islands): same sessions, differing only in the documented boundary
    convention (native merges on ``diff < gap``, strict; and reports
    end = last_ts + gap, not last_ts — the oracle encodes exactly
    that).

    Plan note: ONE exchange on user_id and a sort — the same cost as
    the manual twin's shared window, but the session merge runs inside
    the aggregation operator (updating session state in place) instead
    of as two window passes + a re-aggregation; prefer it wherever the
    engine offers it."""
    from pcap_to_parquet_spark.sources import load_table

    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", f"{GAP_SECONDS} seconds"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("session_value"),
        )
        .select(
            "user_id",
            F.unix_micros("session_window.start").alias("session_start"),
            F.unix_micros("session_window.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )
