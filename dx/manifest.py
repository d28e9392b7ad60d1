"""Commit manifest / watermark table — exactly-once machinery (X5).

DataX analogue: the `otsstreamreader` per-shard checkpoint/lease table
(†SURVEY.md §2.2 S5, §3.3) — which is only at-least-once (crash ⇒
re-delivery, no dedup). This module closes that gap:

The manifest is **derived state**: every committed snapshot embeds its
batch_id, applied LSN watermark, and per-source-partition lineage rows
(lake.py). The authoritative record is therefore the snapshot chain
itself — committed atomically with the data by the pointer swap. A
crash *anywhere* (including "after snapshot commit, before manifest
bookkeeping", T3b) cannot desynchronize data from manifest, because
there is nothing to desynchronize: re-reading the chain reconstructs
the manifest exactly.

Idempotence guard: the engine applies batches in LSN order, so
``batch.lsn_hi <= table.watermark()`` ⇔ already applied ⇒ no-op; the
exact batch_id set is also available (``applied_batch_ids``) for
out-of-order defensiveness. Replay from ANY checkpoint converges
(BASELINE.json:6) because apply is a last-writer-wins MERGE of
max-LSN-deduped rows — re-applying a prefix is absorbed.

FIXTURES.md F3 fixes the exported manifest schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dx.lake import LakeTable

MANIFEST_DDL = (
    "batch_id string, source_partition int, lsn_lo long, lsn_hi long, "
    "schema_version int, snapshot_id string, row_count long, applied_at timestamp"
)


def manifest_df(spark: SparkSession, table: LakeTable) -> DataFrame:
    """Materialize the commit manifest from the snapshot chain (F3 schema)."""
    rows = []
    for snap in table.snapshot_chain():
        for e in snap.get("lineage", []):
            rows.append(
                (
                    snap.get("batch_id"),
                    int(e["source_partition"]),
                    int(e["lsn_lo"]),
                    int(e["lsn_hi"]),
                    int(snap["schema_version"]),
                    snap["snapshot_id"],
                    int(e["row_count"]),
                    __import__("datetime").datetime.fromtimestamp(snap["applied_at"]),
                )
            )
    return spark.createDataFrame(rows, MANIFEST_DDL)


def export_manifest(spark: SparkSession, table: LakeTable, path: str) -> None:
    """Write the manifest cache as parquet (a *view* of the chain —
    safe to lose; never read for correctness decisions)."""
    manifest_df(spark, table).write.mode("overwrite").parquet(path)


def per_partition_watermarks(spark: SparkSession, table: LakeTable) -> DataFrame:
    """Per source-partition high watermark (max applied lsn_hi)."""
    df = manifest_df(spark, table)
    return df.groupBy("source_partition").max("lsn_hi").withColumnRenamed(
        "max(lsn_hi)", "watermark"
    )


def already_applied(table: LakeTable, batch_id: str, lsn_hi: int) -> bool:
    """Idempotent-apply guard: LSN-order watermark check, plus exact
    batch-id membership for defense in depth."""
    if lsn_hi <= table.watermark():
        return True
    return batch_id in table.applied_batch_ids()
