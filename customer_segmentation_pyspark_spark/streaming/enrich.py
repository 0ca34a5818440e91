"""Stream-static enrichment: join a live stream against batch-computed
reference frames (dimension tables, seasonal profiles, model statistics).

This is the remaining join surface next to stream-stream (joins.py):
the static side is planned ONCE per micro-batch from a batch DataFrame
— Spark re-resolves it each trigger, so a refreshed snapshot (e.g. a
nightly-rebuilt profile written to parquet) is picked up without
restarting the query. Stateless (no watermark, no state store): each
event is scored against the broadcast static side and appended.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def seasonal_anomaly_flags(
    events: DataFrame,
    seasonal: DataFrame,
    stats: DataFrame,
    z_threshold: float = 3.0,
) -> DataFrame:
    """Flag per-event seasonal anomalies on a (streaming or batch)
    events frame using batch-computed reference frames:

      seasonal: (event_type, hh, mu_h)  — hour-of-day profile
      stats:    (event_type, mu_r, sd_r) — residual moments

    Works identically on a streaming ``events`` (stream-static inner
    joins, both static sides broadcast — stateless append) and on a
    batch frame (the twin the test compares against). One row per input
    event: (event_id, event_type, z, is_anomaly).
    """
    base = events.select(
        "event_id",
        "event_type",
        F.hour("ts").alias("hh"),
        F.col("value"),
    )
    resid = base.join(
        F.broadcast(seasonal), ["event_type", "hh"]
    ).select(
        "event_id",
        "event_type",
        (F.col("value") - F.col("mu_h")).alias("r"),
    )
    return resid.join(F.broadcast(stats), "event_type").select(
        "event_id",
        "event_type",
        F.round((F.col("r") - F.col("mu_r")) / F.col("sd_r"), 6).alias("z"),
        (
            F.abs((F.col("r") - F.col("mu_r")) / F.col("sd_r"))
            > F.lit(z_threshold)
        ).alias("is_anomaly"),
    )


def seasonal_reference(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Batch-compute the two reference frames for
    ``seasonal_anomaly_flags`` from a historical events frame."""
    base = events.select(
        "event_type", F.hour("ts").alias("hh"), F.col("value")
    )
    seasonal = base.groupBy("event_type", "hh").agg(
        F.avg("value").alias("mu_h")
    )
    resid = base.join(F.broadcast(seasonal), ["event_type", "hh"]).select(
        "event_type", (F.col("value") - F.col("mu_h")).alias("r")
    )
    stats = resid.groupBy("event_type").agg(
        F.avg("r").alias("mu_r"), F.stddev_pop("r").alias("sd_r")
    )
    return seasonal, stats
