"""T3 exactly-once: idempotent re-apply (T3a) + crash-resume (T3b).

BASELINE.json:6: replay from any checkpoint converges to the same
final table state; applying an already-manifested batch is a no-op.
"""

from __future__ import annotations

import pytest

from dx.engine import ReplayEngine, changelog_from_pandas, seed_lake
from dx.generator import gen_changelog, gen_seed_table
from dx.lake import LakeTable
from tests.oracle import replay, spark_state_to_pandas, state_hash


@pytest.fixture(scope="module")
def world(spark):
    seed_df = gen_seed_table(n_repos=3, paths_per_repo=30, seed=11)
    changelog = gen_changelog(seed_df, n_events=1_500, seed=11, batch_size=300)
    expected = replay(seed_df, changelog)
    return seed_df, changelog, expected


def _fresh_table(spark, tmp_path, seed_df, name):
    table = LakeTable.create(spark, str(tmp_path / name), n_buckets=16)
    seed_lake(spark, table, seed_df)
    return table


def test_t3a_reapply_is_noop(spark, tmp_path, world):
    seed_df, changelog, expected = world
    table = _fresh_table(spark, tmp_path, seed_df, "t3a")
    log_df = changelog_from_pandas(spark, changelog)
    ReplayEngine(spark, table, log_df, delta=300).run()
    h1 = state_hash(spark_state_to_pandas(table.read(include_system=True)))
    sid1 = table.meta()["snapshot_id"]

    # a second engine over the same table re-applies the whole changelog
    metrics = ReplayEngine(spark, table, log_df, delta=300).run()
    assert all(m.skipped for m in metrics) or metrics == []
    assert table.meta()["snapshot_id"] == sid1
    h2 = state_hash(spark_state_to_pandas(table.read(include_system=True)))
    assert h1 == h2 == state_hash(expected)


def test_t3a_explicit_batch_replay(spark, tmp_path, world):
    """Directly re-apply an already-committed LSN range — no-op."""
    seed_df, changelog, expected = world
    table = _fresh_table(spark, tmp_path, seed_df, "t3a2")
    log_df = changelog_from_pandas(spark, changelog)
    eng = ReplayEngine(spark, table, log_df, delta=300)
    eng.run()
    ms = eng.run_batch(0, 300)  # first range again, out of order
    assert all(m.skipped for m in ms)
    assert state_hash(spark_state_to_pandas(table.read(include_system=True))) == state_hash(expected)


def test_t3b_crash_resume_converges(spark, tmp_path, world):
    """Kill right after the atomic commit point of batch 1 (before any
    post-commit bookkeeping), then resume with a fresh engine."""
    seed_df, changelog, expected = world
    table = _fresh_table(spark, tmp_path, seed_df, "t3b")
    log_df = changelog_from_pandas(spark, changelog)
    eng = ReplayEngine(spark, table, log_df, delta=300)
    with pytest.raises(RuntimeError, match="injected crash"):
        eng.run(crash_after_batch=1)
    w_mid = table.watermark()
    assert 0 < w_mid < 1_500  # partially applied

    # fresh process/engine resumes from the committed watermark
    table2 = LakeTable.load(spark, table.root)
    ReplayEngine(spark, table2, log_df, delta=300).run()
    assert table2.watermark() == 1_500
    assert state_hash(spark_state_to_pandas(table2.read(include_system=True))) == state_hash(expected)


def test_t3b_crash_before_commit_point(spark, tmp_path, world):
    """Orphan snapshot files (written but never pointed at) are ignored:
    simulate by failing the pointer swap via a conflicting writer."""
    seed_df, changelog, expected = world
    table = _fresh_table(spark, tmp_path, seed_df, "t3c")
    log_df = changelog_from_pandas(spark, changelog)
    eng = ReplayEngine(spark, table, log_df, delta=300)
    eng.run(max_batches=2)
    w = table.watermark()

    # a writer holding a stale parent view must fail its pointer swap,
    # leaving committed state untouched — optimistic concurrency
    import dx.lake as lake_mod

    bogus = {**table.meta(), "snapshot_id": "s_orphan", "parent_id": "s_bogus_parent"}
    with pytest.raises(lake_mod.CommitConflict):
        table._write_snapshot(bogus, expected_parent="s_bogus_parent")
    table._meta_cache = None
    assert table.watermark() == w  # untouched

    ReplayEngine(spark, LakeTable.load(spark, table.root), log_df, delta=300).run()
    t = LakeTable.load(spark, table.root)
    assert state_hash(spark_state_to_pandas(t.read(include_system=True))) == state_hash(expected)
