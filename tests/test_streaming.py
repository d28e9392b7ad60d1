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
