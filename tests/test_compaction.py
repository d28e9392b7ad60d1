"""Merge-on-read delta accumulation + compaction (lake.py mor path):
state is invariant under compact(), auto-compaction bounds delta depth,
and the watermark/idempotence guarantees survive a compacted chain."""

from __future__ import annotations

from dx.engine import ReplayEngine, changelog_from_pandas, seed_lake
from dx.generator import gen_changelog, gen_seed_table
from dx.lake import LakeTable
from tests.oracle import replay, spark_state_to_pandas, state_hash


def _setup(spark, tmp_path, name, **engine_kw):
    seed_df = gen_seed_table(n_repos=4, paths_per_repo=20, seed=31)
    chg = gen_changelog(seed_df, n_events=2_000, seed=31)
    table = LakeTable.create(spark, str(tmp_path / name), n_buckets=8)
    seed_lake(spark, table, seed_df)
    engine = ReplayEngine(
        spark, table, changelog_from_pandas(spark, chg), delta=250, **engine_kw
    )
    return seed_df, chg, table, engine


def test_manual_compact_preserves_state(spark, tmp_path):
    seed_df, chg, table, engine = _setup(
        spark, tmp_path, "c1", compact_threshold=0  # never auto-compact
    )
    engine.run()
    assert sum(table.delta_depth().values()) > 0   # deltas outstanding
    before = state_hash(spark_state_to_pandas(table.read(include_system=True)))
    wm = table.watermark()

    sid = table.compact()
    assert sid is not None
    assert table.delta_depth() == {}               # all folded into base
    after = state_hash(spark_state_to_pandas(table.read(include_system=True)))
    assert after == before                          # pure state rewrite
    assert table.watermark() == wm                  # watermark untouched
    assert state_hash(replay(seed_df, chg)) == after

    assert table.compact() is None                  # nothing left to fold


def test_auto_compaction_bounds_delta_depth(spark, tmp_path):
    seed_df, chg, table, engine = _setup(
        spark, tmp_path, "c2", compact_threshold=3
    )
    engine.run()
    # 8 batches of deltas would accumulate depth 8 without compaction
    assert max(table.delta_depth().values(), default=0) < 3
    actual = spark_state_to_pandas(table.read(include_system=True))
    assert state_hash(actual) == state_hash(replay(seed_df, chg))


def test_time_travel_reads_historical_snapshot(spark, tmp_path):
    seed_df, chg, table, engine = _setup(spark, tmp_path, "tt", compact_threshold=0)
    metrics = engine.run()
    mid = metrics[2]                       # third applied batch
    expected = replay(seed_df, chg[chg.lsn <= mid.lsn_hi])
    asof = spark_state_to_pandas(
        table.read(include_system=True, snapshot_id=mid.snapshot_id)
    )
    assert state_hash(asof) == state_hash(expected)
    # current head unaffected by historical read
    head = spark_state_to_pandas(table.read(include_system=True))
    assert state_hash(head) == state_hash(replay(seed_df, chg))


def test_cow_and_mor_converge_identically(spark, tmp_path):
    seed_df = gen_seed_table(n_repos=4, paths_per_repo=20, seed=33)
    chg = gen_changelog(seed_df, n_events=1_500, seed=33)
    states = {}
    for mode in ("cow", "mor"):
        table = LakeTable.create(spark, str(tmp_path / f"m_{mode}"), n_buckets=8)
        seed_lake(spark, table, seed_df)
        ReplayEngine(
            spark, table, changelog_from_pandas(spark, chg), delta=300,
            merge_mode=mode,
        ).run()
        states[mode] = state_hash(
            spark_state_to_pandas(table.read(include_system=True))
        )
    assert states["cow"] == states["mor"]
    assert states["cow"] == state_hash(replay(seed_df, chg))


def test_replay_resumes_over_compacted_chain(spark, tmp_path):
    seed_df, chg, table, engine = _setup(spark, tmp_path, "c3", compact_threshold=0)
    engine.run(max_batches=4)
    table.compact()
    # fresh engine resumes from the compacted table's watermark
    engine2 = ReplayEngine(
        spark, table, changelog_from_pandas(spark, chg), delta=250,
        compact_threshold=0,
    )
    metrics = engine2.run()
    assert all(not m.skipped for m in metrics)
    actual = spark_state_to_pandas(table.read(include_system=True))
    assert state_hash(actual) == state_hash(replay(seed_df, chg))
