"""T5 schema evolution: mid-stream column add/drop (BASELINE.json:6).

Covers SURVEY.md §7.4 #2 — DDL/data interleaving and the
drop-then-re-add trap: a re-added column of the same name gets a new
field id, so values written under the old field id must NOT
resurrect.
"""

from __future__ import annotations

import pytest

from dx.engine import ReplayEngine, changelog_from_pandas, seed_lake
from dx.generator import DDLSpec, gen_changelog, gen_seed_table
from dx.lake import LakeTable
from tests.oracle import replay, spark_state_to_pandas, state_hash


def _run(spark, tmp_path, name, ddl_specs, n_events=1_500, seed=17, delta=300):
    seed_df = gen_seed_table(n_repos=3, paths_per_repo=25, seed=seed)
    changelog = gen_changelog(
        seed_df, n_events=n_events, seed=seed, batch_size=300, ddl_specs=ddl_specs
    )
    table = LakeTable.create(spark, str(tmp_path / name), n_buckets=16)
    seed_lake(spark, table, seed_df)
    ReplayEngine(spark, table, changelog_from_pandas(spark, changelog), delta=delta).run()
    expected = replay(seed_df, changelog)
    actual = spark_state_to_pandas(table.read(include_system=True))
    return table, actual, expected


def test_add_column_mid_stream(spark, tmp_path):
    table, actual, expected = _run(
        spark, tmp_path, "t5_add", [DDLSpec(0.4, "add_column", "lang2", "string")]
    )
    assert "lang2" in actual.columns
    # rows untouched since the DDL read as null; touched rows carry values
    assert actual["lang2"].notna().any()
    assert actual["lang2"].isna().any()
    assert state_hash(actual) == state_hash(expected)


def test_add_then_drop(spark, tmp_path):
    table, actual, expected = _run(
        spark, tmp_path, "t5_drop",
        [DDLSpec(0.4, "add_column", "lang2", "string"),
         DDLSpec(0.7, "drop_column", "lang2")],
    )
    assert "lang2" not in actual.columns
    assert table.meta()["schema_version"] == 2
    assert state_hash(actual) == state_hash(expected)


def test_drop_then_readd_no_resurrection(spark, tmp_path):
    """The re-added lang2 (new field id) must be null for every row not
    rewritten after the second add — old fid values stay buried."""
    table, actual, expected = _run(
        spark, tmp_path, "t5_readd",
        [DDLSpec(0.30, "add_column", "lang2", "string"),
         DDLSpec(0.55, "drop_column", "lang2"),
         DDLSpec(0.75, "add_column", "lang2", "string")],
    )
    assert state_hash(actual) == state_hash(expected)
    # oracle encodes the value as f"lang2_val_{lsn}" — any resurrected old
    # value would carry an lsn from before the re-add DDL
    readd_lsn = int(0.75 * 1_500)
    vals = actual["lang2"].dropna()
    assert (vals.str.extract(r"_val_(\d+)")[0].astype(int) > readd_lsn).all()


def test_typed_column_long(spark, tmp_path):
    table, actual, expected = _run(
        spark, tmp_path, "t5_long", [DDLSpec(0.4, "add_column", "size_bytes", "long")]
    )
    assert str(actual["size_bytes"].dtype) in ("float64", "Int64", "int64", "object")
    got = actual["size_bytes"].dropna().astype("int64")
    exp = expected["size_bytes"].dropna().astype("int64")
    assert sorted(got) == sorted(exp)
    assert state_hash(actual) == state_hash(expected)


def test_ddl_and_data_in_same_micro_batch(spark, tmp_path):
    """Δ larger than the whole stream: one engine batch contains data
    before the DDL, the DDL, and data after — boundary split must
    apply them under the right schema versions."""
    table, actual, expected = _run(
        spark, tmp_path, "t5_onebatch",
        [DDLSpec(0.5, "add_column", "lang2", "string")],
        n_events=600, delta=10_000,
    )
    assert state_hash(actual) == state_hash(expected)
