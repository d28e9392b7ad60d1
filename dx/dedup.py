"""Per-key max-LSN dedup (X2) — the core CDC collapse.

ABSENT in the reference (DataX has no relational operators, SURVEY.md
§2.7); mandated by BASELINE.json:6: per (repo, path) keep only the
highest-LSN event in a batch, collapsing I/U/D sequences.

Two strategies, both exposed (tests assert equality):

- ``window`` — the spec-literal form: ``row_number() OVER
  (PARTITION BY repo, path ORDER BY lsn DESC) = 1``. One full shuffle
  of the batch; a single hot key serializes into one task.
- ``maxby`` (engine default) — ``groupBy(key).agg(max_by(struct(*),
  lsn))``. Same semantics (LSNs are unique), but hash aggregation gets
  a *partial/map-side combine*: each input partition pre-collapses to
  one row per key before the shuffle. At 10^10 events this is the
  difference between shuffling the whole batch and shuffling ~|keys|
  rows, and a hot key is reduced on every mapper instead of landing on
  one reducer — per-key skew is defused structurally, before salting
  (skew.py) is even needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

KEY = ["repo", "path"]


def dedup_max_lsn(df: DataFrame, key: list[str] = KEY, lsn_col: str = "lsn",
                  strategy: str = "maxby") -> DataFrame:
    """Keep only the max-LSN event per key; preserves input schema."""
    if strategy == "window":
        w = Window.partitionBy(*key).orderBy(F.col(lsn_col).desc())
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    if strategy == "maxby":
        payload = [c for c in df.columns if c not in key]
        agg = df.groupBy(*key).agg(
            F.max_by(F.struct(*payload), F.col(lsn_col)).alias("__top")
        )
        return agg.select(*key, *[F.col(f"__top.{c}").alias(c) for c in payload])
    raise ValueError(f"unknown dedup strategy: {strategy}")
