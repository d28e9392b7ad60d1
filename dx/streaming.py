"""Structured Streaming front-end for the replay engine.

The batch CLI replays a bounded LSN range per loop iteration; this
module is the same engine driven by ``readStream`` + ``foreachBatch``
— the deployment shape for a live binlog tail (files landing in a
changelog directory, e.g. from a Debezium/Kafka-to-parquet shipper).

Semantics: exactly-once is carried by the ENGINE's manifest/watermark
protocol, not by the streaming checkpoint — foreachBatch is
at-least-once, and a redelivered micro-batch re-enters
``ReplayEngine.run_batch`` whose ``already_applied`` guard absorbs it
(lsn_hi ≤ watermark ⇒ no-op). The Spark checkpoint only bounds
re-reads; correctness never depends on it.

Delivery contract: ROW order within and across landed files is
arbitrary (T4 semantics — the max-LSN dedup + LSN-windowed apply
absorb it), but a file may only land once every file containing a
LOWER LSN has landed ("prefix-complete" landing — the standard
guarantee of per-partition-ordered binlog shippers). Without it, a
gap below an applied watermark would be skipped forever; detecting
gaps would require a source-side contiguity ledger, which belongs to
the shipper, not the applier.

At scale this is the standing-cluster mode: maxFilesPerTrigger bounds
per-trigger input (flow control, C7 analogue), and the engine's
per-batch metrics/lineage emit unchanged.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from dx.engine import ReplayEngine
from dx.generator import CHANGELOG_DDL
from dx.lake import LakeTable


def stream_replay(
    spark: SparkSession,
    table: LakeTable,
    changelog_dir: str,
    checkpoint_dir: str,
    delta: int = 100_000,
    max_files_per_trigger: int = 64,
    **engine_kwargs,
):
    """Start a streaming query applying changelog files as they land.

    Returns the StreamingQuery; call ``.processAllAvailable()`` /
    ``.stop()`` (tests) or ``.awaitTermination()`` (production).
    """

    def apply_batch(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # the engine treats the micro-batch frame as its changelog and
        # replays (watermark, max lsn] out of it — events at or below
        # the table watermark (redelivery) are skipped by the guard,
        # events above it are applied in bounded delta steps.
        engine = ReplayEngine(
            spark, table, batch_df, delta=delta, **engine_kwargs
        )
        engine.run()

    stream = (
        spark.readStream.schema(CHANGELOG_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("recursiveFileLookup", "true")  # shippers land per-chunk dirs
        .parquet(changelog_dir)
    )
    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime="0 seconds")
        .start()
    )


def watermark_lag(spark: SparkSession, table: LakeTable, changelog_dir: str):
    """Monitoring helper: head LSN in the landed changelog vs the
    table's applied watermark (replication lag in LSNs)."""
    head = (
        spark.read.schema(CHANGELOG_DDL)
        .option("recursiveFileLookup", "true")
        .parquet(changelog_dir)
        .agg(F.max("lsn").alias("head"))
        .collect()[0]["head"]
        or 0
    )
    return {"head_lsn": int(head), "applied_watermark": int(table.watermark()),
            "lag": int(head) - int(table.watermark())}
