"""Real-Iceberg adapter: the production backend behind LakeTable's
interface (SURVEY.md §7.2).

This sandbox has no ``iceberg-spark-runtime`` jars and no network to
fetch them (SURVEY.md §0.2), so this module CANNOT run here — it is
the documented, reviewable mapping from the engine's lake operations
to real Iceberg SQL, to be used on a cluster where the session is
created with:

    spark-submit --py-files dx.zip \\
      --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver> \\
      --conf spark.sql.extensions=org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions \\
      --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog \\
      --conf spark.sql.catalog.lake.type=hadoop \\
      --conf spark.sql.catalog.lake.warehouse=<s3/hdfs path> \\
      dx/main.py ...

Semantics parity with dx/lake.py (each method notes its sandbox
equivalent):

- table layout = Iceberg's own metadata/manifest tree; LakeTable's
  per-bucket files map + pointer swap is the file-system model of the
  same commit protocol (optimistic snapshot swap).
- ``write.distribution-mode=hash`` + ``bucket(N, repo)`` partitioning
  reproduces the pmod(hash(repo,path), N) bucket routing.
- merge-on-read delete files (``write.merge.mode=merge-on-read``)
  correspond to LakeTable's ``mor`` delta files + tombstones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

FQN = "lake.db.source_code"


class IcebergTable:
    """Drop-in for dx.lake.LakeTable on a real Iceberg catalog.

    Only the surface the engine uses: create/read/alter/merge/
    checkpoint. Lineage rows ride in snapshot summary properties
    (Iceberg snapshots accept custom summary metadata), exactly like
    LakeTable embeds them in its snapshot JSON.
    """

    def __init__(self, spark: SparkSession, fqn: str = FQN, n_buckets: int = 256):
        self.spark = spark
        self.fqn = fqn
        self.n_buckets = n_buckets

    # -------------------------------------------------------- lifecycle
    def create(self) -> None:
        """LakeTable.create + seed schema. Hash-bucketed by key so
        MERGE touches only matching files (== dirty-bucket planning)."""
        self.spark.sql(
            f"""
            CREATE TABLE IF NOT EXISTS {self.fqn} (
              repo STRING, path STRING, commit STRING, lang STRING,
              content STRING, _content_sha STRING, _lsn BIGINT
            )
            USING iceberg
            PARTITIONED BY (bucket({self.n_buckets}, repo))
            TBLPROPERTIES (
              'format-version' = '2',
              'write.merge.mode' = 'merge-on-read',
              'write.update.mode' = 'merge-on-read',
              'write.delete.mode' = 'merge-on-read',
              'write.distribution-mode' = 'hash'
            )
            """
        )

    def read(self) -> DataFrame:
        return self.spark.table(self.fqn)

    # -------------------------------------------------------------- DDL
    def alter(self, action: str, column: str, col_type: str = "string") -> None:
        """LakeTable.alter: Iceberg ALTER TABLE is metadata-only and
        field-id-based — drop/re-add of a name cannot resurrect old
        data, same guarantee LakeTable implements via __fid names."""
        if action == "add_column":
            self.spark.sql(f"ALTER TABLE {self.fqn} ADD COLUMN {column} {col_type}")
        elif action == "drop_column":
            self.spark.sql(f"ALTER TABLE {self.fqn} DROP COLUMN {column}")
        else:
            raise ValueError(f"unknown DDL action: {action}")

    # ------------------------------------------------------------ write
    def merge(self, changes: DataFrame, batch_id: str) -> None:
        """LakeTable.merge (X3): the literal MERGE INTO the sandbox
        rewrites as anti-join ∪ upserts / delta files.

        ``changes`` must be max-LSN deduped (X2) with an ``op`` column.
        Commit-level idempotence: the batch_id is stamped into the
        snapshot summary; re-apply guards check it (see applied()).
        """
        changes.createOrReplaceTempView("dx_changes")
        self.spark.sql(f"SET spark.wap.id = {batch_id!r}")  # snapshot stamping
        self.spark.sql(
            f"""
            MERGE INTO {self.fqn} t
            USING dx_changes c
            ON t.repo = c.repo AND t.path = c.path
            WHEN MATCHED AND c.op = 'D' THEN DELETE
            WHEN MATCHED THEN UPDATE SET
              t.commit = c.commit, t.lang = c.lang, t.content = c.content,
              t._content_sha = c._content_sha, t._lsn = c.lsn
            WHEN NOT MATCHED AND c.op != 'D' THEN INSERT
              (repo, path, commit, lang, content, _content_sha, _lsn)
              VALUES (c.repo, c.path, c.commit, c.lang, c.content,
                      c._content_sha, c.lsn)
            """
        )

    def compact(self) -> None:
        """LakeTable.compact: fold merge-on-read deletes into data."""
        self.spark.sql(
            f"CALL lake.system.rewrite_data_files(table => '{self.fqn}', "
            f"options => map('delete-file-threshold', '8'))"
        )

    # -------------------------------------------------------- manifest
    def applied(self, batch_id: str) -> bool:
        """manifest.already_applied: scan snapshot summaries for the
        batch id (wap.id) — the snapshot chain IS the manifest."""
        rows = self.spark.sql(
            f"SELECT summary FROM {self.fqn}.snapshots"
        ).collect()
        return any(r["summary"].get("wap.id") == batch_id for r in rows)

    def snapshots(self) -> DataFrame:
        """Lineage surface: Iceberg metadata tables replace LakeTable's
        snapshot JSON chain."""
        return self.spark.sql(f"SELECT * FROM {self.fqn}.snapshots")
