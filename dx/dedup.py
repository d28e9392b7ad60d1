"""Per-key max-LSN dedup (X2) — the core CDC collapse.

ABSENT in the reference (DataX has no relational operators, SURVEY.md
§2.7); mandated by BASELINE.json:6: per (repo, path) keep only the
highest-LSN event in a batch, collapsing I/U/D sequences.

Two strategies, both exposed (tests assert equality):

- ``window`` — the spec-literal form: ``row_number() OVER
  (PARTITION BY repo, path ORDER BY lsn DESC) = 1``. One full shuffle
  of the batch; a single hot key serializes into one task.
- ``maxby`` — ``groupBy(key).agg(max_by(struct(*), lsn))``. Same
  semantics (LSNs are unique), but hash aggregation gets a
  *partial/map-side combine*: each input partition pre-collapses to
  one row per key before the shuffle, and a hot key is reduced on
  every mapper instead of landing on one reducer — per-key skew is
  defused structurally, before salting (skew.py) is even needed.
  Still shuffles one full-payload row per (mapper, key).
- ``join`` (engine default) — two-phase: aggregate only
  ``(key, max(lsn))`` (a narrow shuffle of key+lsn, ~1% of payload
  bytes for code content), then left-semi join the batch against the
  winning (key, lsn) pairs. With the winner set broadcast (a CDC
  batch's key set ≪ the table), the payload is NEVER shuffled at
  dedup — its only shuffle is the final bucket-write repartition. At
  10^10 events this halves total content bytes moved per batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

KEY = ["repo", "path"]


def latest_keys(df: DataFrame, key: list[str] = KEY, lsn_col: str = "lsn") -> DataFrame:
    """``(key..., max(lsn) AS lsn_col)`` winners — the narrow dedup core.

    Map-side combined; the shuffle carries only key + lsn columns.
    """
    return df.groupBy(*key).agg(F.max(lsn_col).alias(lsn_col))


def dedup_max_lsn(df: DataFrame, key: list[str] = KEY, lsn_col: str = "lsn",
                  strategy: str = "join", winners: DataFrame | None = None,
                  broadcast_winners: bool = True) -> DataFrame:
    """Keep only the max-LSN event per key; preserves input schema.

    ``winners`` lets the caller pass a precomputed/persisted
    :func:`latest_keys` frame (the engine reuses it for dirty-bucket
    planning and the MERGE anti-join).
    """
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
    if strategy == "join":
        w = winners if winners is not None else latest_keys(df, key, lsn_col)
        if broadcast_winners:
            w = F.broadcast(w)
        semi = df.join(w, on=[*key, lsn_col], how="left_semi")
        # A redelivered event ROW (same key AND same lsn appearing twice
        # in one batch — e.g. an at-least-once shipper landing a chunk
        # twice) would survive the semi-join in both copies; window/
        # maxby/bucket-window all collapse it. dropDuplicates keeps the
        # strategies equivalent under duplicated input rows. Cost: one
        # extra shuffle of the already-collapsed batch (≤ |keys| rows,
        # and this path only runs below broadcast_key_limit) — bounded,
        # and correctness is not input-invariant-conditional.
        return semi.dropDuplicates([*key, lsn_col])
    raise ValueError(f"unknown dedup strategy: {strategy}")


def dedup_bucket_window(df: DataFrame, bucket_col: str = "__bucket",
                        num_partitions: int | None = None,
                        key: list[str] = KEY, lsn_col: str = "lsn",
                        subtask_col: str | None = None) -> DataFrame:
    """Single-shuffle large-batch dedup, fused with bucket routing.

    For batches too big to broadcast a winner set: repartition by the
    storage bucket (each key lives in exactly one bucket), sort the
    partition by (key, lsn desc), and keep the first row of each key
    run via ``lag`` — a window PARTITIONED BY THE BUCKET, so Spark
    reuses the repartition exchange instead of shuffling again by key.
    Compared to the maxby aggregation this needs no reduce-side hash
    of payload rows, has no per-key skew point (the partition key is
    the uniform bucket hash), leaves the data partitioned exactly as
    the bucket write wants it (the write's repartition collapses into
    this one — ONE payload shuffle end-to-end), and emits rows sorted
    by key, which compresses better in parquet and pre-sorts future
    merge reads. ``df`` must already carry ``bucket_col``.

    ``subtask_col`` (a key-deterministic sub-bucket id, see
    LakeTable.with_subtask) joins the partitioning so one bucket
    spreads over many tasks: with tasks == buckets, the slowest single
    bucket gates the whole stage (measured straggler term in the 8→32
    scaling pair); sub-splitting gives the scheduler 4×cores tasks to
    balance. Keys stay whole within a cell, so the first-of-run filter
    is unaffected.
    """
    parts = [F.col(bucket_col)] + ([F.col(subtask_col)] if subtask_col else [])
    data = (
        df.repartition(num_partitions, *parts) if num_partitions
        else df.repartition(*parts)
    )
    w = Window.partitionBy(*parts).orderBy(
        *[F.col(k) for k in key], F.col(lsn_col).desc()
    )
    prev = [F.lag(k).over(w).alias(f"__prev_{i}") for i, k in enumerate(key)]
    data = data.select("*", *prev)
    first_of_run = F.lit(False)
    for i, k in enumerate(key):
        c = F.col(f"__prev_{i}")
        first_of_run = first_of_run | c.isNull() | (c != F.col(k))
    return data.filter(first_of_run).drop(*[f"__prev_{i}" for i in range(len(key))])


def fold_partial(df: DataFrame, key: list[str] = KEY, lsn_col: str = "lsn",
                 value_cols: list[str] | None = None) -> DataFrame:
    """Partial-update fold (X10): collapse a batch to one row per key
    where each value column independently keeps its LATEST NON-NULL
    value — the CDC shape of column-level change events (MySQL binlog
    minimal row image, Paimon partial-update merge engine). Max-LSN
    dedup (X2) is the degenerate case where every event carries every
    column.

    Delete semantics are strict resets: events at or before a key's
    highest-LSN ``op='D'`` never contribute a value (the delete wiped
    the row; later events rebuild it from scratch). The emitted row
    carries:

    - ``lsn``   — max LSN over ALL of the key's events (batch-split
      invariant: folding one batch equals folding two sub-batches
      merged in LSN order),
    - ``op``    — the highest-LSN event's op ('D' → the key is a
      delete; callers drop it),
    - ``__reset`` — true when a mid-batch delete occurred, so the
      MERGE must NOT coalesce older stored values into this row.

    Physical shape: the delete watermark is a NARROW aggregate over
    only the D rows (a CDC batch's deletes are a small fraction),
    broadcast-joined back; the fold itself is one map-side-combinable
    groupBy — payload shuffles once, the same budget as ``maxby``.
    """
    reserved = {*key, lsn_col, "op"}
    if value_cols is None:
        # Inferred default excludes engine/system helper columns
        # (underscore-prefixed: __bucket, __subtask, _lsn, …) and the
        # replay frame's bookkeeping fields — folding those as payload
        # would silently corrupt them. A payload column that really
        # starts with "_" must be passed via value_cols explicitly.
        helper = {"batch_seq", "source_partition", "event_ts"}
        value_cols = [
            c for c in df.columns
            if c not in reserved and c not in helper and not c.startswith("_")
        ]
        excluded = [
            c for c in df.columns
            if c not in reserved and (c in helper or c.startswith("_"))
        ]
        if excluded:
            # ADVICE r4 #2: a caller whose PAYLOAD column is really
            # named batch_seq/source_partition/event_ts (or starts
            # with "_") would silently lose it from the fold under
            # inference — surface the exclusion so they pass
            # value_cols explicitly.
            import warnings

            warnings.warn(
                "fold_partial inferred value_cols excludes "
                f"{excluded} (engine/system helper names); pass "
                "value_cols explicitly if any of these are payload",
                stacklevel=2,
            )
    d_last = (
        df.filter(F.col("op") == "D")
        .groupBy(*key)
        .agg(F.max(lsn_col).alias("__d_lsn"))
    )
    ev = df.join(F.broadcast(d_last), on=list(key), how="left")
    live = (
        (F.col("op") != "D")
        & (F.col(lsn_col) > F.coalesce(F.col("__d_lsn"), F.lit(-1)))
    )
    aggs = [
        F.max(lsn_col).alias(lsn_col),
        F.max_by("op", F.col(lsn_col)).alias("op"),
        F.max("__d_lsn").isNotNull().alias("__reset"),
    ]
    for c in value_cols:
        aggs.append(
            F.max_by(
                F.col(c),
                F.when(live & F.col(c).isNotNull(), F.col(lsn_col)),
            ).alias(c)
        )
    return ev.groupBy(*key).agg(*aggs)
