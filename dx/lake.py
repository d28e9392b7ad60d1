"""LakeTable — Iceberg-equivalent table layer on parquet (X3/X4).

Sandbox has no iceberg-spark-runtime jars (SURVEY.md §0.2), so this
module implements the Iceberg semantics the north_rule needs —
snapshot isolation, atomic commit, MERGE upsert, ALTER TABLE schema
evolution with field-ids — behind the same interface
``iceberg_backend.py`` exposes for real clusters. Design mirrors
public Iceberg concepts (spec at iceberg.apache.org/spec/):

- A table = immutable parquet data files + a chain of snapshot JSON
  metadata; the *commit point* is an atomic pointer swap
  (``os.replace``), the file-system analogue of Iceberg's optimistic
  metadata swap.
- Data is hash-bucketed by ``pmod(hash(repo, path), n_buckets)``
  (Spark's Murmur3 ``F.hash`` — deterministic across sessions, so
  bucket routing is stable between snapshots). A MERGE rewrites ONLY
  the buckets containing changed keys (copy-on-write at bucket/file
  granularity) and carries every clean bucket's files forward by
  reference — at 100 TB a batch touching 0.1% of keys reads+writes
  ~0.1-1% of the table, never all of it.
- Schema evolution uses Iceberg-style **field ids**: a column's
  physical parquet name is ``{name}__fid{id}`` (base columns keep
  plain names, fids 1-5). ``drop`` then re-``add`` of the same name
  allocates a new fid, so old files' physical columns can never
  resurrect dropped data (SURVEY.md §7.4 #2).

Scale notes (10^10 rows / 1000 executors):
- Snapshot metadata holds one entry per bucket (choose ``n_buckets``
  so a bucket ≈ 0.5-1 GB; metadata stays KB-MB). Real Iceberg splits
  this into manifest files/lists — same information, two levels.
- The MERGE anti-join broadcasts the changed-key set when small
  (typical CDC batch ≪ table); otherwise it's a shuffled join with
  AQE skew handling. Either way only dirty-bucket rows participate.
- Two merge modes, mirroring Iceberg v1/v2:
  * ``cow`` (copy-on-write): dirty buckets are rewritten (anti-join
    survivors ∪ upserts). Zero read amplification; write-amplified
    when changes spread across many buckets.
  * ``mor`` (merge-on-read): a batch appends only its own deduped
    change rows (incl. ``_op='D'`` tombstones) as per-bucket *delta
    files*; readers reconcile base ∪ deltas by max ``_lsn`` per key
    and drop tombstones — Iceberg v2 equality-delete semantics with
    the delete expressed as a newer row version. ``compact()`` folds
    deltas back into the base (== the cow rewrite). For a CDC stream
    building or hammering a table, mor makes batch cost O(batch),
    not O(touched buckets' size).

DataX analogue: writers W1/W2 (†plugin-rdbms-util/.../CommonRdbmsWriter.java,
SURVEY.md §2.4) — ``writeMode: replace/update`` last-writer-wins by
primary key is exactly what ``merge()`` generalizes.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import asdict, dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BASE_COLUMNS = [
    ("repo", "string"),
    ("path", "string"),
    ("commit", "string"),
    ("lang", "string"),
    ("content", "string"),
]
KEY = ["repo", "path"]
SYSTEM_COLUMNS = [("_content_sha", "string"), ("_lsn", "long")]


@dataclass
class ColumnSpec:
    name: str
    type: str
    fid: int

    @property
    def stored_name(self) -> str:
        # base + system columns keep plain physical names; evolved columns
        # carry their field id so drop/re-add never aliases old data.
        if self.fid <= len(BASE_COLUMNS) or self.name.startswith("_"):
            return self.name
        return f"{self.name}__fid{self.fid}"


class CommitConflict(RuntimeError):
    """Pointer moved between plan and commit (optimistic concurrency)."""


class LakeTable:
    def __init__(self, spark: SparkSession, root: str, n_buckets: int = 32):
        self.spark = spark
        self.root = root
        self.n_buckets = n_buckets
        self._meta_cache: dict | None = None

    # ------------------------------------------------------------------ paths
    @property
    def _pointer_path(self) -> str:
        return os.path.join(self.root, "_pointer.json")

    def _snap_path(self, snapshot_id: str) -> str:
        return os.path.join(self.root, "snapshots", f"{snapshot_id}.json")

    # ------------------------------------------------------------- lifecycle
    @classmethod
    def create(cls, spark: SparkSession, root: str, n_buckets: int = 32) -> "LakeTable":
        t = cls(spark, root, n_buckets)
        os.makedirs(os.path.join(root, "snapshots"), exist_ok=True)
        os.makedirs(os.path.join(root, "data"), exist_ok=True)
        cols = [ColumnSpec(n, ty, i + 1) for i, (n, ty) in enumerate(BASE_COLUMNS)]
        snap = {
            "snapshot_id": "s0",
            "parent_id": None,
            "batch_id": None,
            "schema_version": 0,
            "columns": [asdict(c) for c in cols],
            "next_fid": len(cols) + 1,
            "n_buckets": n_buckets,
            "watermark": 0,
            "files": {},
            "deltas": {},
            "lineage": [],
            "row_count": 0,
            "applied_at": time.time(),
        }
        t._write_snapshot(snap, expected_parent=None)
        return t

    @classmethod
    def load(cls, spark: SparkSession, root: str) -> "LakeTable":
        t = cls(spark, root)
        meta = t.meta()
        t.n_buckets = meta["n_buckets"]
        return t

    # ------------------------------------------------------------- metadata
    def meta(self, refresh: bool = True) -> dict:
        if refresh or self._meta_cache is None:
            with open(self._pointer_path) as f:
                sid = json.load(f)["snapshot_id"]
            with open(self._snap_path(sid)) as f:
                self._meta_cache = json.load(f)
        return self._meta_cache

    def columns(self) -> list[ColumnSpec]:
        return [ColumnSpec(**c) for c in self.meta(refresh=False)["columns"]]

    def watermark(self) -> int:
        return int(self.meta()["watermark"])

    def snapshot_chain(self) -> list[dict]:
        """Walk parent links from the current snapshot to the root."""
        out, meta = [], self.meta()
        while meta is not None:
            out.append(meta)
            pid = meta.get("parent_id")
            meta = None
            if pid is not None:
                with open(self._snap_path(pid)) as f:
                    meta = json.load(f)
        return out

    def lineage(self) -> list[dict]:
        """All committed lineage rows (source LSN range → snapshot id)."""
        rows = []
        for snap in self.snapshot_chain():
            for entry in snap.get("lineage", []):
                rows.append({**entry, "snapshot_id": snap["snapshot_id"],
                             "batch_id": snap.get("batch_id")})
        return rows

    def applied_batch_ids(self) -> set[str]:
        return {s["batch_id"] for s in self.snapshot_chain() if s.get("batch_id")}

    def _write_snapshot(self, snap: dict, expected_parent: str | None) -> None:
        """Write snapshot json then atomically swap the pointer.

        Optimistic commit à la Iceberg: if the pointer no longer names
        ``expected_parent``, a concurrent writer won — raise, caller
        replans. The ``os.replace`` of the pointer is the single
        atomic commit point; a crash before it leaves only orphan
        data/metadata files (ignored by readers, GC-able).
        """
        if expected_parent is not None or os.path.exists(self._pointer_path):
            with open(self._pointer_path) as f:
                current = json.load(f)["snapshot_id"]
            if current != expected_parent:
                raise CommitConflict(f"pointer at {current}, expected {expected_parent}")
        path = self._snap_path(snap["snapshot_id"])
        with open(path + ".tmp", "w") as f:
            json.dump(snap, f)
        os.replace(path + ".tmp", path)
        tmp = self._pointer_path + f".tmp.{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump({"snapshot_id": snap["snapshot_id"]}, f)
        os.replace(tmp, self._pointer_path)  # ← commit point
        self._meta_cache = snap

    # ----------------------------------------------------------------- read
    def bucket_expr(self, repo=None, path=None):
        repo = repo if repo is not None else F.col("repo")
        path = path if path is not None else F.col("path")
        return F.pmod(F.hash(repo, path), F.lit(self.n_buckets))

    def _read_files(self, files: list[str], columns: list[ColumnSpec],
                    include_op: bool = False) -> DataFrame:
        """Read physical files, project to the given logical schema.

        mergeSchema unions per-file physical schemas (files written
        under older schema versions lack newer fid columns → null);
        columns present in no file are synthesized as typed nulls.
        Dropped columns' physical names are simply not selected.
        ``include_op`` additionally surfaces the ``_op`` marker (delta
        files carry it physically; base files read as 'U').
        """
        sys_extra = [("_op", "string")] if include_op else []
        if not files:
            ddl = ", ".join(
                [f"`{c.name}` {c.type}" for c in columns]
                + [f"`{n}` {t}" for n, t in SYSTEM_COLUMNS + sys_extra]
            )
            return self.spark.createDataFrame([], ddl)
        df = self.spark.read.option("mergeSchema", "true").parquet(*files)
        sel = []
        for c in columns:
            if c.stored_name in df.columns:
                sel.append(F.col(c.stored_name).cast(c.type).alias(c.name))
            else:
                sel.append(F.lit(None).cast(c.type).alias(c.name))
        for n, t in SYSTEM_COLUMNS:
            sel.append(
                (F.col(n) if n in df.columns else F.lit(None)).cast(t).alias(n)
            )
        if include_op:
            sel.append(
                (F.coalesce(F.col("_op"), F.lit("U")) if "_op" in df.columns
                 else F.lit("U")).cast("string").alias("_op")
            )
        return df.select(*sel)

    def _bucket_state(self, buckets: list[str], cols: list[ColumnSpec],
                      meta: dict | None = None) -> DataFrame:
        """Reconciled state of the given buckets (base ∪ deltas:
        max-``_lsn`` row per key wins, tombstones drop) — the read side
        of Iceberg-v2-style merge-on-read. ``meta`` selects a snapshot
        (default: current)."""
        meta = meta if meta is not None else self.meta(refresh=False)
        base_files = [f for b in buckets for f in meta["files"].get(b, [])]
        delta_files = [f for b in buckets for f in meta.get("deltas", {}).get(b, [])]
        if not delta_files:
            return self._read_files(base_files, cols)
        from pyspark.sql import Window

        base = self._read_files(base_files, cols, include_op=True)
        delt = self._read_files(delta_files, cols, include_op=True)
        w = Window.partitionBy(*KEY).orderBy(F.col("_lsn").desc())
        return (
            base.unionByName(delt)
            .withColumn("__rn", F.row_number().over(w))
            .filter((F.col("__rn") == 1) & (F.col("_op") != "D"))
            .drop("__rn", "_op")
        )

    def read(self, include_system: bool = False,
             snapshot_id: str | None = None) -> DataFrame:
        """Table state — current, or as of ``snapshot_id`` (time
        travel: snapshots are immutable, so any committed id stays
        readable until GC'd, exactly Iceberg's `VERSION AS OF`)."""
        if snapshot_id is None:
            meta = self.meta()
            cols = self.columns()
        else:
            with open(self._snap_path(snapshot_id)) as f:
                meta = json.load(f)
            cols = [ColumnSpec(**c) for c in meta["columns"]]
        buckets = sorted(
            set(meta["files"]) | set(meta.get("deltas", {})), key=int
        )
        df = self._bucket_state(buckets, cols, meta=meta)
        if not include_system:
            df = df.drop(*[n for n, _ in SYSTEM_COLUMNS])
        return df

    # ------------------------------------------------------------------ DDL
    def alter(self, action: str, column: str, col_type: str = "string",
              batch_id: str | None = None, at_lsn: int | None = None) -> str:
        """Iceberg `ALTER TABLE ADD/DROP COLUMN` equivalent (X4).

        Metadata-only: no data files are touched. New columns get a
        fresh field id; existing rows read as null until rewritten.
        """
        meta = dict(self.meta())
        cols = self.columns()
        if action == "add_column":
            if any(c.name == column for c in cols):
                raise ValueError(f"column exists: {column}")
            cols.append(ColumnSpec(column, col_type, meta["next_fid"]))
            meta["next_fid"] += 1
        elif action == "drop_column":
            if all(c.name != column for c in cols):
                raise ValueError(f"no such column: {column}")
            cols = [c for c in cols if c.name != column]
        else:
            raise ValueError(f"unknown DDL action: {action}")
        parent = meta["snapshot_id"]
        snap = {
            **meta,
            "snapshot_id": f"s{uuid.uuid4().hex[:12]}",
            "parent_id": parent,
            "batch_id": batch_id,
            "schema_version": meta["schema_version"] + 1,
            "columns": [asdict(c) for c in cols],
            "lineage": [],
            "watermark": max(meta["watermark"], at_lsn or 0),
            "applied_at": time.time(),
        }
        self._write_snapshot(snap, expected_parent=parent)
        return snap["snapshot_id"]

    def checkpoint_watermark(self, batch_id: str, hi: int) -> str:
        """Metadata-only snapshot advancing the watermark (empty batch)."""
        meta = dict(self.meta())
        parent = meta["snapshot_id"]
        snap = {
            **meta,
            "snapshot_id": f"s{uuid.uuid4().hex[:12]}",
            "parent_id": parent,
            "batch_id": batch_id,
            "lineage": [],
            "watermark": max(int(meta["watermark"]), int(hi)),
            "applied_at": time.time(),
        }
        self._write_snapshot(snap, expected_parent=parent)
        return snap["snapshot_id"]

    # ---------------------------------------------------------------- write
    def _write_buckets(self, df: DataFrame, snapshot_id: str,
                       num_write_partitions: int | None = None) -> dict[str, list[str]]:
        """Write df (with __bucket col) partitioned by bucket; return files map."""
        out_dir = os.path.join(self.root, "data", snapshot_id)
        shuffle_n = num_write_partitions or min(
            self.n_buckets, int(self.spark.conf.get("spark.sql.shuffle.partitions"))
        )
        (
            df.repartition(shuffle_n, "__bucket")
            .write.partitionBy("__bucket")
            .mode("overwrite")
            .parquet(out_dir)
        )
        files: dict[str, list[str]] = {}
        for entry in os.listdir(out_dir):
            if not entry.startswith("__bucket="):
                continue
            b = entry.split("=", 1)[1]
            d = os.path.join(out_dir, entry)
            files[b] = sorted(
                os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")
            )
        return files

    def _stored_select(self, df: DataFrame, columns: list[ColumnSpec],
                       include_op: bool = False) -> DataFrame:
        sel = [F.col(c.name).cast(c.type).alias(c.stored_name) for c in columns]
        sel += [F.col(n).cast(t).alias(n) for n, t in SYSTEM_COLUMNS]
        if include_op:
            sel.append(F.col("_op").cast("string").alias("_op"))
        return df.select(*sel, F.col("__bucket"))

    def seed(self, df: DataFrame, batch_id: str = "seed") -> str:
        """Initial full load (all buckets written once)."""
        meta = self.meta()
        cols = self.columns()
        parent = meta["snapshot_id"]
        sid = f"s{uuid.uuid4().hex[:12]}"
        data = df.withColumn("__bucket", self.bucket_expr())
        files = self._write_buckets(self._stored_select(data, cols), sid)
        row_count = int(
            self.spark.read.parquet(*[f for fl in files.values() for f in fl]).count()
        ) if files else 0
        snap = {
            **meta,
            "snapshot_id": sid,
            "parent_id": parent,
            "batch_id": batch_id,
            "files": files,
            "lineage": [],
            "row_count": row_count,
            "applied_at": time.time(),
        }
        self._write_snapshot(snap, expected_parent=parent)
        return sid

    def merge(
        self,
        changes: DataFrame,
        batch_id: str,
        watermark_hi: int,
        lineage: list[dict] | None = None,
        broadcast_keys: bool = True,
        crash_after_commit: bool = False,
        keys: DataFrame | None = None,
        change_rows: int | None = None,
        mode: str = "cow",
    ) -> str:
        """MERGE INTO equivalent: last-writer-wins upsert + delete (X3).

        ``changes`` must be per-key deduped (X2 guarantees ≤1 row per
        (repo, path)) with columns: logical schema columns + ``op`` +
        ``_content_sha`` + ``_lsn``. Semantics match Iceberg MERGE:
        matched ∧ op∈{I,U} → UPDATE; not-matched ∧ op∈{I,U} → INSERT;
        matched ∧ op=D → DELETE; not-matched ∧ D → no-op.

        Physical plan: dirty buckets = distinct bucket ids of changes
        (collect of ≤ n_buckets ints); only those buckets' files are
        read; untouched rows survive via an anti-join on the changed
        keys (broadcast when the batch is small); clean buckets carry
        forward by file reference — zero IO.

        ``crash_after_commit`` is a test hook (T3b): raises right
        after the atomic pointer swap to simulate dying before any
        post-commit bookkeeping; recovery must converge.

        ``keys`` (optional): the deduped change-key set as a *small*
        DataFrame with columns KEY. When given, dirty-bucket planning,
        the anti-join, and the change count all run against it — the
        full ``changes`` frame (which carries payload content) is then
        evaluated exactly ONCE, in the bucket write; no persist, no
        second pass over content bytes. This is the 100 TB path: the
        key set of a CDC batch is MBs while its payload is GBs-TBs.
        """
        if mode == "mor":
            return self._merge_mor(
                changes, batch_id, watermark_hi, lineage=lineage,
                crash_after_commit=crash_after_commit, keys=keys,
                change_rows=change_rows,
            )
        meta = self.meta()
        cols = self.columns()
        parent = meta["snapshot_id"]

        own_persist = keys is None
        if "__bucket" not in changes.columns:
            changes = changes.withColumn("__bucket", self.bucket_expr())
        if own_persist:
            changes = changes.persist()
            key_set = changes.select(*KEY)
            bucket_src = changes
        else:
            key_set = keys.select(*KEY)
            bucket_src = key_set.withColumn("__bucket", self.bucket_expr())
        try:
            dirty = sorted(
                r[0] for r in bucket_src.select("__bucket").distinct().collect()
            )
            dirty_s = [str(b) for b in dirty]
            old = self._bucket_state(dirty_s, cols).withColumn(
                "__bucket", self.bucket_expr()
            )

            if broadcast_keys:
                key_set = F.broadcast(key_set)
            survivors = old.join(key_set, on=KEY, how="left_anti")
            upserts = changes.filter(F.col("op") != "D").select(
                *[F.col(c.name) for c in cols],
                *[F.col(n) for n, _ in SYSTEM_COLUMNS],
                F.col("__bucket"),
            )
            unioned = survivors.select(
                *[F.col(c.name) for c in cols],
                *[F.col(n) for n, _ in SYSTEM_COLUMNS],
                F.col("__bucket"),
            ).unionByName(upserts)

            sid = f"s{uuid.uuid4().hex[:12]}"
            new_files = self._write_buckets(
                self._stored_select(unioned, cols), sid,
                num_write_partitions=max(1, min(len(dirty), self.n_buckets)),
            )
            files = {b: fl for b, fl in meta["files"].items() if b not in dirty_s}
            for b in dirty_s:
                files[b] = new_files.get(b, [])  # bucket may be emptied by deletes
            deltas = {
                b: fl for b, fl in meta.get("deltas", {}).items() if b not in dirty_s
            }  # dirty buckets' deltas are folded into the rewrite

            if change_rows is None:
                change_rows = (changes if own_persist else keys).count()
            snap = {
                **meta,
                "snapshot_id": sid,
                "parent_id": parent,
                "batch_id": batch_id,
                "files": files,
                "deltas": deltas,
                "lineage": lineage or [],
                "watermark": max(int(meta["watermark"]), int(watermark_hi)),
                "row_count": None,  # exact count maintained lazily; see read().count()
                "applied_at": time.time(),
                "merge_stats": {
                    "dirty_buckets": len(dirty),
                    "total_buckets": self.n_buckets,
                    "change_rows": int(change_rows),
                    "mode": "cow",
                },
            }
            self._write_snapshot(snap, expected_parent=parent)
            if crash_after_commit:
                raise RuntimeError("injected crash after commit point (T3b)")
            return sid
        finally:
            if own_persist:
                changes.unpersist()

    def _merge_mor(
        self,
        changes: DataFrame,
        batch_id: str,
        watermark_hi: int,
        lineage: list[dict] | None = None,
        crash_after_commit: bool = False,
        keys: DataFrame | None = None,
        change_rows: int | None = None,
    ) -> str:
        """Merge-on-read apply: append the batch's deduped change rows
        (D rows become ``_op='D'`` tombstones) as per-bucket delta
        files. No existing file is read — batch cost is O(batch).
        Readers reconcile via :meth:`_bucket_state`; :meth:`compact`
        folds deltas into the base."""
        meta = self.meta()
        cols = self.columns()
        parent = meta["snapshot_id"]
        sid = f"s{uuid.uuid4().hex[:12]}"

        # a caller may pre-bucket (engine's bucket-window dedup);
        # re-adding would mint a fresh attribute and defeat the
        # exchange reuse that makes that path one-shuffle.
        data = (
            changes if "__bucket" in changes.columns
            else changes.withColumn("__bucket", self.bucket_expr())
        )
        stored = self._stored_select(
            data.withColumn("_op", F.col("op")), cols, include_op=True
        )
        new_files = self._write_buckets(stored, sid)
        deltas = {b: list(fl) for b, fl in meta.get("deltas", {}).items()}
        for b, fl in new_files.items():
            deltas.setdefault(b, []).extend(fl)

        if change_rows is None:
            # parquet footer row-counts only — no data scan
            written = [f for fl in new_files.values() for f in fl]
            change_rows = (
                int(self.spark.read.parquet(*written).count()) if written else 0
            )
        snap = {
            **meta,
            "snapshot_id": sid,
            "parent_id": parent,
            "batch_id": batch_id,
            "deltas": deltas,
            "lineage": lineage or [],
            "watermark": max(int(meta["watermark"]), int(watermark_hi)),
            "row_count": None,
            "applied_at": time.time(),
            "merge_stats": {
                "dirty_buckets": len(new_files),
                "total_buckets": self.n_buckets,
                "change_rows": int(change_rows),
                "mode": "mor",
            },
        }
        self._write_snapshot(snap, expected_parent=parent)
        if crash_after_commit:
            raise RuntimeError("injected crash after commit point (T3b)")
        return sid

    def delta_depth(self) -> dict[str, int]:
        """Outstanding delta-file count per bucket (compaction signal)."""
        return {b: len(fl) for b, fl in self.meta().get("deltas", {}).items() if fl}

    def compact(self, buckets: list[str] | None = None,
                batch_id: str | None = None) -> str | None:
        """Fold outstanding deltas into the base for the given buckets
        (default: every bucket with deltas). Equivalent to Iceberg's
        rewrite_data_files maintenance action; safe to run any time —
        pure state rewrite, watermark and lineage untouched."""
        meta = self.meta()
        cols = self.columns()
        parent = meta["snapshot_id"]
        all_delta = [b for b, fl in meta.get("deltas", {}).items() if fl]
        target = [b for b in (buckets if buckets is not None else all_delta)
                  if meta.get("deltas", {}).get(b)]
        if not target:
            return None
        sid = f"s{uuid.uuid4().hex[:12]}"
        state = self._bucket_state(target, cols).withColumn(
            "__bucket", self.bucket_expr()
        )
        new_files = self._write_buckets(
            self._stored_select(state, cols), sid,
            num_write_partitions=max(1, min(len(target), self.n_buckets)),
        )
        files = dict(meta["files"])
        deltas = {b: fl for b, fl in meta.get("deltas", {}).items() if b not in target}
        for b in target:
            files[b] = new_files.get(b, [])
        snap = {
            **meta,
            "snapshot_id": sid,
            "parent_id": parent,
            "batch_id": batch_id or f"compact-{sid}",
            "files": files,
            "deltas": deltas,
            "lineage": [],
            "applied_at": time.time(),
            "merge_stats": {
                "compacted_buckets": len(target),
                "total_buckets": self.n_buckets,
                "mode": "compact",
            },
        }
        self._write_snapshot(snap, expected_parent=parent)
        return sid
