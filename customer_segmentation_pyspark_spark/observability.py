"""Pipeline observability without extra actions.

``df.observe()`` attaches named aggregate metrics that are computed
DURING the job that materializes the DataFrame — no second pass, no extra
scan. At 100 TB an extra ``count()`` per pipeline stage is another full
read; observed metrics are free. Use for row-count accounting between
stages (e.g. how many docs each dedup stage dropped).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def with_row_metric(
    df: DataFrame, name: str
) -> tuple[DataFrame, Observation]:
    """Attach a row-count + null-free-count observation named ``name``.
    Read ``observation.get`` AFTER an action has run on the returned df.
    """
    obs = Observation(name)
    return df.observe(obs, F.count(F.lit(1)).alias("n_rows")), obs


def funnel_counts(stages: dict[str, DataFrame]) -> dict[str, int]:
    """Materialize several stage DataFrames once each and report their row
    counts from observations (one job per stage, no double scans)."""
    out: dict[str, int] = {}
    for name, df in stages.items():
        observed, obs = with_row_metric(df, name)
        observed.write.mode("overwrite").format("noop").save()
        out[name] = obs.get["n_rows"]
    return out
