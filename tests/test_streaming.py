"""Structured Streaming front-end (dx/streaming.py): files landing in
a changelog dir are applied exactly-once; late-arriving (lower-LSN)
files are absorbed by the engine's watermark guard."""

from __future__ import annotations

import os
import time

from dx.engine import changelog_from_pandas, seed_lake
from dx.generator import gen_changelog, gen_seed_table
from dx.lake import LakeTable
from dx.streaming import stream_replay, watermark_lag
from tests.oracle import replay, spark_state_to_pandas, state_hash


def _write_slice(spark, chg, lo, hi, path):
    pdf = chg[(chg.lsn > lo) & (chg.lsn <= hi)]
    changelog_from_pandas(spark, pdf).coalesce(1).write.mode("overwrite").parquet(path)


def test_stream_replay_converges(spark, tmp_path):
    seed_df = gen_seed_table(n_repos=4, paths_per_repo=25, seed=17)
    chg = gen_changelog(seed_df, n_events=2_400, seed=17)

    table = LakeTable.create(spark, str(tmp_path / "lake"), n_buckets=8)
    seed_lake(spark, table, seed_df)

    log_dir = str(tmp_path / "stream_in")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(log_dir)

    # shuffle rows WITHIN the stream (T4 semantics); file landing is
    # prefix-complete per the module's delivery contract
    chg_shuffled = chg.sample(frac=1.0, random_state=3)

    q = stream_replay(spark, table, log_dir, ckpt, delta=600)
    try:
        _write_slice(spark, chg_shuffled, 0, 800, os.path.join(log_dir, "f1"))
        q.processAllAvailable()
        assert table.watermark() == 800

        _write_slice(spark, chg_shuffled, 800, 1600, os.path.join(log_dir, "f2"))
        q.processAllAvailable()
        # redelivery: land an overlapping file covering (0, 1600] again —
        # the engine's watermark guard must absorb every duplicate
        _write_slice(spark, chg_shuffled, 0, 1600, os.path.join(log_dir, "f2_dup"))
        _write_slice(spark, chg_shuffled, 1600, 2400, os.path.join(log_dir, "f3"))
        q.processAllAvailable()
        assert table.watermark() == 2400

        lag = watermark_lag(spark, table, log_dir)
        assert lag["lag"] == 0
    finally:
        q.stop()
        for _ in range(50):
            if not q.isActive:
                break
            time.sleep(0.1)

    expected = replay(seed_df, chg)
    actual = spark_state_to_pandas(table.read(include_system=True))
    assert state_hash(actual) == state_hash(expected)


def test_checkpoint_rollback_epoch_redelivery(spark, tmp_path):
    """VERDICT r4 #6: foreachBatch is at-least-once — after a
    checkpoint ROLLBACK (deleted checkpoint dir, epoch counter
    restarts at 0) Structured Streaming redelivers every landed file.
    Exactly-once must come from the ENGINE's watermark/manifest
    guard, not the checkpoint: the redelivered epochs must produce
    zero new commits and an identical state sha, and the restarted
    stream must still apply genuinely-new data afterwards."""
    import json

    seed_df = gen_seed_table(n_repos=4, paths_per_repo=25, seed=23)
    chg = gen_changelog(seed_df, n_events=1_800, seed=23)

    table = LakeTable.create(spark, str(tmp_path / "lake"), n_buckets=8)
    seed_lake(spark, table, seed_df)

    log_dir = str(tmp_path / "stream_in")
    os.makedirs(log_dir)
    metrics = str(tmp_path / "metrics.jsonl")

    q = stream_replay(spark, table, log_dir, str(tmp_path / "ckpt1"),
                      delta=600, metrics_path=metrics)
    try:
        _write_slice(spark, chg, 0, 600, os.path.join(log_dir, "f1"))
        _write_slice(spark, chg, 600, 1200, os.path.join(log_dir, "f2"))
        q.processAllAvailable()
    finally:
        q.stop()
        for _ in range(50):
            if not q.isActive:
                break
            time.sleep(0.1)

    assert table.watermark() == 1200
    sid_before = table.meta()["snapshot_id"]
    sha_before = state_hash(spark_state_to_pandas(table.read(include_system=True)))
    n_metrics_before = sum(1 for _ in open(metrics))

    # checkpoint rollback: a FRESH checkpoint dir makes the restarted
    # query re-read f1+f2 from scratch as its own epoch 0 — the
    # redelivery shape of a lost/deleted checkpoint.
    q2 = stream_replay(spark, table, log_dir, str(tmp_path / "ckpt2"),
                       delta=600, metrics_path=metrics)
    try:
        q2.processAllAvailable()
        # redelivered epochs: absorbed with ZERO new commits
        assert table.meta(refresh=True)["snapshot_id"] == sid_before
        assert table.watermark() == 1200
        sha_after = state_hash(
            spark_state_to_pandas(table.read(include_system=True)))
        assert sha_after == sha_before
        applied_during_redelivery = [
            json.loads(line)
            for line in list(open(metrics))[n_metrics_before:]
            if not json.loads(line).get("skipped")
        ]
        assert applied_during_redelivery == []

        # the restarted stream is still live: new data past the
        # watermark applies normally
        _write_slice(spark, chg, 1200, 1800, os.path.join(log_dir, "f3"))
        q2.processAllAvailable()
        assert table.watermark() == 1800
    finally:
        q2.stop()
        for _ in range(50):
            if not q2.isActive:
                break
            time.sleep(0.1)

    expected = replay(seed_df, chg)
    actual = spark_state_to_pandas(table.read(include_system=True))
    assert state_hash(actual) == state_hash(expected)
