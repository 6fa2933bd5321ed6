"""Temporal join operators: as-of join, range join, CEP funnel detection.

Spark lacks a native as-of join; the scalable pattern here is the
union-and-window sweep: tag both sides, sort within (key) by time, and
carry the latest right-side row forward with last_value(ignorenulls). One
shuffle on the key, no per-key collect, no skew beyond the key itself.

Range joins against a small bands dimension broadcast (never shuffle the
fact side for a dim lookup). The CEP funnel (event A followed by event B
within a horizon, per key) composes the as-of sweep with a horizon filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup_per_ts(df: DataFrame, key: str, ts: str, id_col: str) -> DataFrame:
    """One row per (key, ts): keep max id — makes as-of ties deterministic
    across engines."""
    w = Window.partitionBy(key, ts).orderBy(F.desc(id_col))
    return df.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1).drop("__rn")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
) -> DataFrame:
    """For each left row, the latest right row of the same key with
    right_ts <= left_ts (backward as-of). Left rows with no prior right row
    are kept with NULLs (left as-of semantics).

    Implementation: union both sides with a side tag; within (key) ordered
    by (ts, side) the last non-null right value at each left row is the
    as-of match. side ordering puts right rows first at equal ts, so
    ties (right_ts == left_ts) match — same as ASOF JOIN's >= rule.
    """
    lt = left.withColumn("__t", F.col(left_ts)).withColumn("__side", F.lit(1))
    rt = right.withColumn("__t", F.col(right_ts)).withColumn("__side", F.lit(0))
    l_cols = [c for c in left.columns]
    carried = [f"__r_{c}" for c in right_cols]
    lt2 = lt.select(
        key, "__t", "__side",
        *[F.col(c).alias(c) for c in l_cols if c != key],
        *[F.lit(None).cast(right.schema[c].dataType).alias(rc) for c, rc in zip(right_cols, carried)],
    )
    rt2 = rt.select(
        key, "__t", "__side",
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in l_cols if c != key],
        *[F.col(c).alias(rc) for c, rc in zip(right_cols, carried)],
    )
    u = lt2.unionByName(rt2)
    w = Window.partitionBy(key).orderBy("__t", "__side").rowsBetween(
        Window.unboundedPreceding, 0
    )
    for rc in carried:
        u = u.withColumn(rc, F.last(rc, ignorenulls=True).over(w))
    out = u.where(F.col("__side") == 1).drop("__t", "__side")
    for c, rc in zip(right_cols, carried):
        out = out.withColumnRenamed(rc, f"r_{c}")
    return out


def value_band_counts(events: DataFrame, band_width: float = 25.0, n_bands: int = 8) -> DataFrame:
    """Range join: events matched into value bands [lo, hi) from a small
    broadcast dimension; count + exact sum per band."""
    spark = events.sparkSession
    bands = spark.createDataFrame(
        [(i, float(i) * band_width, float(i + 1) * band_width) for i in range(n_bands)],
        "band_id int, lo double, hi double",
    )
    return (
        events.join(
            F.broadcast(bands),
            (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")),
        )
        .groupBy("band_id", "lo", "hi")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("sum_value"),
        )
        .orderBy("band_id")
    )


def funnel_counts(
    events: DataFrame,
    first_type: str = "click",
    then_type: str = "purchase",
    horizon_minutes: int = 10,
) -> DataFrame:
    """CEP funnel: per user, how many `then_type` events were preceded by a
    `first_type` event within the horizon (the as-of sweep + horizon
    filter — state-free, one shuffle on user_id)."""
    clicks = dedup_per_ts(
        events.where(F.col("event_type") == first_type), "user_id", "ts", "event_id"
    ).select("user_id", F.col("ts").alias("c_ts"), F.col("event_id").alias("c_id"))
    purchases = events.where(F.col("event_type") == then_type).select(
        "user_id", "ts", "event_id"
    )
    j = asof_join(purchases, clicks, "user_id", "ts", "c_ts", ["c_ts", "c_id"])
    hit = j.where(
        F.col("r_c_ts").isNotNull()
        & (F.col("r_c_ts") >= F.col("ts") - F.expr(f"INTERVAL {horizon_minutes} MINUTES"))
    )
    return (
        hit.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_funnels"))
        .orderBy("user_id")
    )
