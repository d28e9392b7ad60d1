"""Micro-batch replay loop (X1, X8) — the engine's main lifecycle.

Replaces DataX's JobContainer lifecycle + task-group thread machinery
(†core/job/JobContainer.java, †core/taskgroup/TaskGroupContainer.java,
SURVEY.md §2.1 C2–C7, §3.1): the whole Reader→Channel→Writer pipeline
is one declarative DataFrame lineage per micro-batch; parallelism is
Spark's scheduler; flow control (†Channel.statPush throttling, C7) is
a bounded LSN range Δ per batch.

Per batch (SURVEY.md §3.4):
  1. W = table watermark (from the committed snapshot chain)     [X5]
  2. events = changelog.filter(W < lsn ≤ W+Δ)                    [X1]
     — Catalyst pushes the range predicate to the parquet scan
  3. split at DDL boundaries; ALTER TABLE per DDL event          [X4]
  4. per sub-range: max-LSN dedup [X2] — policy by batch size:
     small (≤ broadcast_key_limit events): broadcast semi-join on
     the narrow (key, max lsn) winner set — payload shuffles ONCE
     (the bucket write); large: bucket-window dedup fused with the
     write partitioning — still exactly one payload shuffle
  5. normalize content + sha256, materialize evolved columns     [X7]
  6. skew [X6]: structural on the default paths (bucket-hash
     write spreads hot repos; maxby partial-combines hot keys);
     explicit salted repartition on the spec-literal window path
  7. MERGE into the lake table [X3] — mor (default): append
     per-bucket delta files + tombstones, auto-compact at depth
     ≥ compact_threshold; cow: rewrite dirty buckets only
  8. snapshot commit = atomic pointer swap; manifest is derived  [X5]
  9. emit lineage + events/sec metrics (JSON line per batch)     [X8]

Crash-resume: every step before 8 is side-effect-free on committed
state; re-running a batch whose lsn_hi ≤ watermark is a no-op
(manifest.already_applied), so replay from any checkpoint converges.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dx import manifest as mf
from dx import skew
from dx.dedup import dedup_bucket_window, dedup_max_lsn, latest_keys
from dx.lake import KEY, LakeTable
from dx.transforms import (
    content_sha_bin,
    normalize_content,
    normalize_content_udf,
    sha256_bin_pandas,
)


def seed_lake(spark: SparkSession, table: LakeTable, seed_df) -> str:
    """Load the F1 seed state: normalize content, stamp sha + lsn=0."""
    import pandas as pd

    if isinstance(seed_df, pd.DataFrame):
        seed_df = spark.createDataFrame(seed_df)
    data = seed_df.select(
        "repo", "path", "commit", "lang",
        normalize_content(F.col("content")).alias("content"),
    ).withColumn(
        "_content_sha", F.unhex(F.sha2(F.col("content"), 256))
    ).withColumn("_lsn", F.lit(0).cast("long"))
    return table.seed(data)


def changelog_from_pandas(spark: SparkSession, pdf) -> DataFrame:
    """Typed Spark frame from a generator pandas changelog (tests/bench)."""
    from dx.generator import CHANGELOG_DDL

    records = pdf.to_dict("records")
    for r in records:
        ts = r.get("event_ts")
        if ts is not None and getattr(ts, "tzinfo", None) is not None:
            r["event_ts"] = ts.tz_convert("UTC").tz_localize(None).to_pydatetime()
    return spark.createDataFrame(records, schema=CHANGELOG_DDL)


@dataclass
class BatchMetrics:
    batch_id: str
    lsn_lo: int
    lsn_hi: int
    events: int
    applied_rows: int
    snapshot_id: str | None
    ddl_applied: int
    seconds: float
    events_per_sec: float
    skipped: bool = False
    lineage: list[dict] = field(default_factory=list)


class ReplayEngine:
    def __init__(
        self,
        spark: SparkSession,
        table: LakeTable,
        changelog: DataFrame,
        delta: int = 10_000,
        dedup_strategy: str = "join",
        salt_threshold: float = 0.10,
        n_salts: int = 16,
        use_pandas_udfs: bool = False,
        broadcast_keys: bool = True,
        metrics_path: str | None = None,
        merge_mode: str = "mor",
        compact_threshold: int = 8,
        broadcast_key_limit: int = 2_000_000,
    ):
        self.spark = spark
        self.table = table
        self.changelog = changelog
        self.delta = delta
        self.dedup_strategy = dedup_strategy
        self.salt_threshold = salt_threshold
        self.n_salts = n_salts
        self.use_pandas_udfs = use_pandas_udfs
        self.broadcast_keys = broadcast_keys
        self.metrics_path = metrics_path
        self.merge_mode = merge_mode
        self.compact_threshold = compact_threshold
        self.broadcast_key_limit = broadcast_key_limit
        self._max_lsn: int | None = None
        self._ddls: list | None = None

    # ----------------------------------------------------------------- utils
    def max_lsn(self) -> int:
        if self._max_lsn is None:
            self._max_lsn = (
                self.changelog.agg(F.max("lsn").alias("m")).collect()[0]["m"] or 0
            )
        return self._max_lsn

    def ddl_events(self) -> list:
        """All DDL events of the changelog, ONCE per engine (the
        changelog frame is immutable): one narrow scan for the whole
        replay instead of one per micro-batch — at Δ-sized batches over
        10^10 events the per-batch DDL scan was a serial job on every
        batch's critical path."""
        if self._ddls is None:
            self._ddls = sorted(
                self.changelog.filter(F.col("op") == "DDL")
                .select("lsn", "ddl_action", "ddl_column", "ddl_type")
                .collect(),
                key=lambda r: r["lsn"],
            )
        return self._ddls

    def _emit(self, m: BatchMetrics) -> None:
        line = json.dumps(m.__dict__)
        if self.metrics_path:
            os.makedirs(os.path.dirname(self.metrics_path) or ".", exist_ok=True)
            with open(self.metrics_path, "a") as f:
                f.write(line + "\n")

    # ------------------------------------------------------------ transforms
    def _transform_sel(self) -> list:
        """Column list: vectorized payload transforms + evolved-column
        materialization (the normalize + sha256 invariant, X7)."""
        if self.use_pandas_udfs:
            norm = normalize_content_udf(F.col("content"))
            sha = sha256_bin_pandas(norm)
        else:
            norm = normalize_content(F.col("content"))
            sha = content_sha_bin(F.col("content"))
        cols = self.table.columns()
        base = {"repo", "path", "commit", "lang"}
        sel = []
        for c in cols:
            if c.name == "content":
                sel.append(norm.alias("content"))
            elif c.name in base:
                sel.append(F.col(c.name))
            else:
                # evolved column: value travels in the extra map. try_cast =
                # DataX dirty-record coercion semantics (†SURVEY.md §2.3 P12):
                # malformed input → null, never a failed job.
                sel.append(F.col("extra").getItem(c.name).try_cast(c.type).alias(c.name))
        sel += [
            sha.alias("_content_sha"),
            F.col("lsn").alias("_lsn"),
            F.col("op"),
        ]
        return sel

    def _prepare_changes_bucketed(self, events: DataFrame) -> DataFrame:
        """Large-batch path: bucket-window dedup (dedup.py) — ONE
        payload shuffle, fused with the write's bucket routing (the
        write's repartition reuses this exchange), no winner broadcast,
        no reduce-side payload hash. The shuffle is keyed by
        (bucket, subtask) at WRITE_TASK_MULT×cores partitions so one
        hot/slow bucket can't straggle a cores-wide stage."""
        shuffle_n = self.table.write_partitions(True)
        data = self.table.with_subtask(
            events.withColumn("__bucket", self.table.bucket_expr())
        )
        deduped = dedup_bucket_window(
            data, num_partitions=shuffle_n, subtask_col="__subtask"
        )
        return deduped.select(
            *self._transform_sel(), F.col("__bucket"), F.col("__subtask")
        )

    def _prepare_changes(self, events: DataFrame, winners: DataFrame | None = None,
                         strategy: str | None = None) -> DataFrame:
        """Dedup + vectorized payload transforms + evolved-column
        materialization → the exact frame lake.merge expects.

        With the default ``join`` strategy, ``winners`` is the cached
        (repo, path, lsn) winner set: the payload is filtered by a
        broadcast semi-join and flows to the bucket write with exactly
        one shuffle total (the write repartition)."""
        strategy = strategy or self.dedup_strategy
        deduped = dedup_max_lsn(
            events, strategy=strategy, winners=winners,
            broadcast_winners=self.broadcast_keys,
        )
        changes = deduped.select(*self._transform_sel())
        if strategy != "window":
            # X6 is structural on these paths: "join" never shuffles
            # the payload by key at all (broadcast semi-join), "maxby"
            # partial-combines a hot key on every mapper before its
            # shuffle, and the only payload-wide shuffle left — the
            # bucket write — is keyed by pmod(hash(repo, path)), which
            # spreads a hot repo's paths uniformly. An explicit salt
            # column would just add a second payload shuffle. The
            # spec-literal "window" strategy below is the one shuffle
            # that serializes a hot key, so it gets the salt.
            return changes
        hot = skew.hot_repos(deduped, self.salt_threshold)
        if hot:
            salted = skew.with_salt(changes, hot, self.n_salts)
            changes = salted.repartition(
                int(self.spark.conf.get("spark.sql.shuffle.partitions")),
                F.col("repo"), F.col("__salt"),
            ).drop("__salt")
        return changes

    # ------------------------------------------------------------ run loop
    def run_batch(self, lo: int, hi: int, crash_after_commit: bool = False) -> list[BatchMetrics]:
        """Apply events with lsn ∈ (lo, hi], splitting at DDL boundaries."""
        out: list[BatchMetrics] = []
        window = self.changelog.filter((F.col("lsn") > lo) & (F.col("lsn") <= hi))
        ddls = [d for d in self.ddl_events() if lo < d["lsn"] <= hi]
        bounds = [lo] + [d["lsn"] for d in ddls] + [hi]
        segments: list[tuple[int, int]] = []
        for i in range(len(bounds) - 1):
            a = bounds[i]
            b = bounds[i + 1] - 1 if i + 1 <= len(ddls) else bounds[i + 1]
            segments.append((a, b))
        # segments[i] covers (a, b]; ddls[i] sits between segment i and i+1
        for i, (a, b) in enumerate(segments):
            if b > a:
                out.append(self._apply_segment(a, b, window, crash_after_commit))
            if i < len(ddls):
                out.append(self._apply_ddl(ddls[i]))
        return out

    def _apply_ddl(self, d) -> BatchMetrics:
        t0 = time.monotonic()
        batch_id = f"ddl{d['lsn']}"
        if mf.already_applied(self.table, batch_id, d["lsn"]):
            m = BatchMetrics(batch_id, d["lsn"], d["lsn"], 1, 0, None, 0, 0.0, 0.0, skipped=True)
        else:
            sid = self.table.alter(
                d["ddl_action"], d["ddl_column"], d["ddl_type"] or "string",
                batch_id=batch_id, at_lsn=d["lsn"],
            )
            dt = time.monotonic() - t0
            m = BatchMetrics(batch_id, d["lsn"], d["lsn"], 1, 0, sid, 1, dt, 0.0)
        self._emit(m)
        return m

    def _collect_lineage(self, events: DataFrame) -> list[dict]:
        return [
            {
                "source_partition": int(r["source_partition"]),
                "lsn_lo": int(r["lsn_lo"]),
                "lsn_hi": int(r["lsn_hi"]),
                "row_count": int(r["row_count"]),
            }
            for r in events.groupBy("source_partition")
            .agg(
                F.min("lsn").alias("lsn_lo"),
                F.max("lsn").alias("lsn_hi"),
                F.count("*").alias("row_count"),
            )
            .collect()
        ]

    def _apply_segment(self, lo: int, hi: int, window: DataFrame,
                       crash_after_commit: bool = False) -> BatchMetrics:
        t0 = time.monotonic()
        batch_id = f"b{lo + 1}-{hi}"
        if mf.already_applied(self.table, batch_id, hi):
            m = BatchMetrics(batch_id, lo + 1, hi, 0, 0, None, 0, 0.0, 0.0, skipped=True)
            self._emit(m)
            return m
        # NO persist of the payload frame: caching would materialize
        # every column, while the planning aggregations are narrow
        # (2-3 small columns) — parquet column pruning + the lsn range
        # pushdown make re-scans far cheaper than full-row caching
        # (measured 5-10× on multi-GB batches).
        events = window.filter(
            (F.col("lsn") > lo) & (F.col("lsn") <= hi) & (F.col("op") != "DDL")
        )
        # Empty-segment fast path: a narrow isEmpty probe (lsn column
        # only — pruning + the pushed LSN range make it footer-cheap)
        # routes empty/sparse windows to a METADATA-ONLY watermark
        # advance instead of a full merge pipeline (Spark write job +
        # empty data/<sid> dir + data-shaped snapshot per empty
        # segment). Non-empty segments pay one take(1) job, ~ms.
        if events.select("lsn").isEmpty():
            sid = self.table.checkpoint_watermark(batch_id, hi)
            dt = time.monotonic() - t0
            m = BatchMetrics(batch_id, lo + 1, hi, 0, 0, sid, 0, dt, 0.0)
            self._emit(m)
            return m
        # The lineage aggregation runs CONCURRENTLY with the merge
        # write (its own thread submits the Spark job; FIFO interleaves
        # the small agg with the big write) instead of serially ahead
        # of it — the rows are only needed at snapshot-commit time, so
        # merge() takes a callable it resolves after the write. Path
        # choice can't wait for the exact count, so it uses the LSN
        # range width — an upper bound that equals n_events on dense
        # changelogs (gaps only make a small batch take the bucketed
        # path, never the reverse at meaningful scale).
        from concurrent.futures import ThreadPoolExecutor

        pool = ThreadPoolExecutor(max_workers=1)
        lineage_fut = pool.submit(self._collect_lineage, events)
        size_bound = hi - lo
        winners = None
        try:
            if self.dedup_strategy == "join" and size_bound > self.broadcast_key_limit:
                # huge batch: building a broadcast hash of the winner
                # set would serialize the driver — take the
                # single-shuffle bucket-window path instead.
                changes = self._prepare_changes_bucketed(events)
                sid = self.table.merge(
                    changes,
                    batch_id=batch_id,
                    watermark_hi=hi,
                    lineage=lineage_fut.result,
                    broadcast_keys=False,
                    crash_after_commit=crash_after_commit,
                    mode=self.merge_mode,
                )
            elif self.dedup_strategy == "join":
                # the narrow winner set (key + lsn) drives dedup, dirty-
                # bucket planning, the anti-join, and the change count —
                # the payload frame is evaluated once, in the write.
                winners = latest_keys(events).persist()
                n_keys = winners.count()
                changes = self._prepare_changes(events, winners)
                sid = self.table.merge(
                    changes,
                    batch_id=batch_id,
                    watermark_hi=hi,
                    lineage=lineage_fut.result,
                    broadcast_keys=self.broadcast_keys,
                    crash_after_commit=crash_after_commit,
                    keys=winners,
                    change_rows=n_keys,
                    mode=self.merge_mode,
                )
            else:
                changes = self._prepare_changes(events)
                sid = self.table.merge(
                    changes,
                    batch_id=batch_id,
                    watermark_hi=hi,
                    lineage=lineage_fut.result,
                    broadcast_keys=self.broadcast_keys,
                    crash_after_commit=crash_after_commit,
                    mode=self.merge_mode,
                )
        finally:
            if winners is not None:
                winners.unpersist()
            pool.shutdown(wait=False)
        lineage_rows = lineage_fut.result()
        n_events = sum(r["row_count"] for r in lineage_rows)
        dt = time.monotonic() - t0
        applied = self.table.meta(refresh=False).get("merge_stats", {}).get("change_rows", 0)
        m = BatchMetrics(
            batch_id, lo + 1, hi, int(n_events), int(applied), sid, 0, dt,
            round(n_events / dt, 2) if dt > 0 else 0.0, lineage=lineage_rows,
        )
        self._emit(m)
        return m

    def run(self, max_batches: int | None = None,
            crash_after_batch: int | None = None) -> list[BatchMetrics]:
        """Replay from the table's current watermark to the changelog head.

        ``crash_after_batch=k`` injects a crash after the k-th batch's
        commit point (T3b); a fresh engine over the same table resumes
        and converges.
        """
        out: list[BatchMetrics] = []
        head = self.max_lsn()
        n = 0
        while True:
            w = self.table.watermark()
            if w >= head:
                break
            if max_batches is not None and n >= max_batches:
                break
            hi = min(w + self.delta, head)
            crash = crash_after_batch is not None and n == crash_after_batch
            out.extend(self.run_batch(w, hi, crash_after_commit=crash))
            if self.merge_mode == "mor" and self.compact_threshold:
                deep = [
                    b for b, d in self.table.delta_depth().items()
                    if d >= self.compact_threshold
                ]
                if deep:
                    self.table.compact(deep)
            n += 1
        return out
