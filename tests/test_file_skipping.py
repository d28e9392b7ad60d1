"""Key-level file skipping (VERDICT r4 #4, lake.py file_stats):
committed snapshots carry per-file (repo, path) min/max bounds —
point reads and the partial-merge hit scan open only files whose
ranges can contain the requested keys, like Iceberg manifest
column-bound pruning within a partition."""

from __future__ import annotations

from pyspark.sql import functions as F

from dx.lake import LakeTable


def _changes(spark, rows):
    """rows: list of (repo, path, content, lsn, op)."""
    df = spark.createDataFrame(
        [(r, p, f"c{lsn}", "py", c, op, lsn) for r, p, c, lsn, op in rows],
        "repo string, path string, commit string, lang string, "
        "content string, op string, _lsn long",
    )
    return df.withColumn(
        "_content_sha",
        F.when(F.col("op") != "D", F.unhex(F.sha2(F.col("content"), 256))),
    )


def _batch(prefix: str, n: int, lsn0: int, op: str = "U"):
    return [
        (f"repo-{prefix}", f"{prefix}/{i:04d}", f"v{lsn0 + i}", lsn0 + i, op)
        for i in range(n)
    ]


def _build(spark, tmp_path, name="lake"):
    """Three MoR batches with DISJOINT key ranges → every bucket holds
    delta files from all three, each covering only its own range."""
    table = LakeTable.create(spark, str(tmp_path / name), n_buckets=2)
    for i, prefix in enumerate(["aaa", "bbb", "ccc"]):
        table.merge(
            _changes(spark, _batch(prefix, 30, lsn0=100 * (i + 1))),
            batch_id=f"b{i + 1}", watermark_hi=100 * (i + 1) + 99, mode="mor",
        )
    return table


def test_snapshot_records_file_bounds(spark, tmp_path):
    table = _build(spark, tmp_path)
    meta = table.meta()
    live = {f for fl in meta.get("deltas", {}).values() for f in fl}
    live |= {f for fl in meta["files"].values() for f in fl}
    stats = meta["file_stats"]
    assert set(stats) == live                       # every live file bounded
    for rmin, rmax, pmin, pmax in stats.values():
        assert rmin <= rmax and pmin <= pmax


def test_point_read_skips_disjoint_files(spark, tmp_path):
    table = _build(spark, tmp_path)
    pf = table.point_files("repo-aaa", "aaa/0005")
    # the key's bucket holds deltas from all three batches; only the
    # aaa-range files may survive the skip
    assert len(pf["deltas"]) >= 3
    assert len(pf["deltas_pruned"]) < len(pf["deltas"])
    assert pf["deltas_pruned"]                      # never pruned to nothing
    row = table.read_point("repo-aaa", "aaa/0005").collect()
    assert len(row) == 1 and row[0]["content"] == "v105"
    # pruned read ≡ unpruned full read for the same key
    full = (
        table.read()
        .filter((F.col("repo") == "repo-aaa") & (F.col("path") == "aaa/0005"))
        .collect()
    )
    assert [r.asDict() for r in row] == [r.asDict() for r in full]


def test_point_read_reconciles_across_surviving_files(spark, tmp_path):
    table = _build(spark, tmp_path)
    # update one aaa key in a LATER delta, delete another: both new
    # files cover only those keys, so pruning keeps (old aaa file +
    # the one-key file) and the max-LSN reconcile must still win
    table.merge(
        _changes(spark, [("repo-aaa", "aaa/0005", "v999", 999, "U")]),
        batch_id="b4", watermark_hi=999, mode="mor",
    )
    table.merge(
        _changes(spark, [("repo-aaa", "aaa/0007", "", 1000, "D")]),
        batch_id="b5", watermark_hi=1000, mode="mor",
    )
    updated = table.read_point("repo-aaa", "aaa/0005").collect()
    assert len(updated) == 1 and updated[0]["content"] == "v999"
    assert table.read_point("repo-aaa", "aaa/0007").collect() == []
    assert table.read_point("repo-zzz", "nope").collect() == []


def test_compaction_rebuilds_bounds(spark, tmp_path):
    table = _build(spark, tmp_path)
    table.compact()
    meta = table.meta()
    live = {f for fl in meta["files"].values() for f in fl}
    assert set(meta["file_stats"]) == live          # no stale delta entries
    row = table.read_point("repo-bbb", "bbb/0003").collect()
    assert len(row) == 1 and row[0]["content"] == "v203"


def test_time_travel_point_read_uses_old_bounds(spark, tmp_path):
    table = _build(spark, tmp_path)
    sid = table.meta()["snapshot_id"]
    table.merge(
        _changes(spark, [("repo-aaa", "aaa/0005", "v999", 999, "U")]),
        batch_id="b4", watermark_hi=999, mode="mor",
    )
    old = table.read_point("repo-aaa", "aaa/0005", snapshot_id=sid).collect()
    assert len(old) == 1 and old[0]["content"] == "v105"
