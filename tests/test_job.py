"""DataX job.json runner (dx/job.py): reader → transformer chain →
writer as one Spark plan, with errorLimit and channel settings."""

from __future__ import annotations

import os

import pytest

from dx.job import run_job


def _csv(tmp_path):
    p = os.path.join(str(tmp_path), "in.csv")
    with open(p, "w") as f:
        f.write("id,name,price\n1,alphabet,10.5\n2,beta,bad\n3,gamma,30.25\n")
    return p


def test_job_file_to_parquet_with_transformers(spark, tmp_path):
    out = os.path.join(str(tmp_path), "out")
    config = {
        "job": {
            "setting": {"speed": {"channel": 2}},
            "content": [{
                "reader": {"name": "filereader", "parameter": {
                    "path": _csv(tmp_path), "fileType": "csv", "skipHeader": True,
                    "column": [
                        {"name": "id", "type": "long"},
                        {"name": "name", "type": "string"},
                        {"name": "price", "type": "double"},
                        {"type": "string", "value": "dx"},
                    ],
                }},
                "transformer": [
                    {"name": "dx_substr", "parameter": {"columnIndex": 1, "paras": ["0", "4"]}},
                    {"name": "dx_filter", "parameter": {"columnIndex": 0, "paras": [">", "2"]}},
                ],
                "writer": {"name": "filewriter", "parameter": {
                    "path": out, "fileType": "parquet", "writeMode": "truncate",
                }},
            }],
        }
    }
    stats = run_job(spark, config)
    assert stats["contents"][0]["records_written"] == 2  # id=3 dropped by filter
    rows = {r["id"]: r for r in spark.read.parquet(out).collect()}
    assert set(rows) == {1, 2}
    assert rows[1]["name"] == "alph"          # dx_substr applied in place
    assert rows[2]["price"] is None           # try_cast dirty → NULL
    assert rows[1]["const"] == "dx"           # P4 constant column


def test_job_error_limit_enforced(spark, tmp_path):
    config = {
        "job": {
            "setting": {"errorLimit": {"record": 0}},
            "content": [{
                "reader": {"name": "filereader", "parameter": {
                    "path": _csv(tmp_path), "fileType": "csv", "skipHeader": True,
                    "column": [
                        {"name": "id", "type": "long"},
                        {"name": "price", "type": "double", "required": True},
                    ],
                }},
                "writer": {"name": "consolewriter", "parameter": {}},
            }],
        }
    }
    with pytest.raises(RuntimeError, match="errorLimit exceeded"):
        run_job(spark, config)


def test_job_streamreader_synthetic(spark, tmp_path):
    out = os.path.join(str(tmp_path), "synth")
    config = {
        "job": {"content": [{
            "reader": {"name": "streamreader", "parameter": {
                "sliceRecordCount": 50,
                "column": [
                    {"type": "long"},
                    {"type": "string", "value": "hello"},
                    {"type": "long", "random": "10,19"},
                ],
            }},
            "writer": {"name": "filewriter", "parameter": {
                "path": out, "fileType": "parquet", "writeMode": "truncate",
            }},
        }]}
    }
    stats = run_job(spark, config)
    assert stats["contents"][0]["records_written"] == 50
    df = spark.read.parquet(out)
    rows = df.collect()
    assert all(r["c1"] == "hello" for r in rows)
    assert all(10 <= r["c2"] <= 19 for r in rows)
    # deterministic: same config → same data
    run_job(spark, config)
    assert sorted(r["c2"] for r in spark.read.parquet(out).collect()) == sorted(
        r["c2"] for r in rows
    )


def test_job_groovy_rejected_with_guidance(spark, tmp_path):
    config = {
        "job": {"content": [{
            "reader": {"name": "streamreader", "parameter": {"sliceRecordCount": 1}},
            "transformer": [{"name": "dx_groovy", "parameter": {}}],
            "writer": {"name": "consolewriter", "parameter": {}},
        }]}
    }
    with pytest.raises(ValueError, match="pandas UDF"):
        run_job(spark, config)

def test_job_presql_postsql_hooks(spark, tmp_path):
    """W4: preSql runs before the write (truncate-before-load idiom),
    postSql after (analyze-after idiom) — here against the catalog."""
    out = str(tmp_path / "w4_out")
    spark.sql("DROP VIEW IF EXISTS dx_w4_pre")
    spark.sql("DROP VIEW IF EXISTS dx_w4_post")
    config = {
        "job": {"content": [{
            "reader": {"name": "streamreader", "parameter": {
                "sliceRecordCount": 5,
                "column": [{"type": "long"}],
            }},
            "writer": {"name": "filewriter", "parameter": {
                "path": out, "writeMode": "truncate",
                "preSql": ["CREATE OR REPLACE TEMP VIEW dx_w4_pre AS SELECT 1 AS ok"],
                "postSql": ["CREATE OR REPLACE TEMP VIEW dx_w4_post AS SELECT 2 AS ok"],
            }},
        }]}
    }
    run_job(spark, config)
    assert spark.table("dx_w4_pre").collect()[0]["ok"] == 1
    assert spark.table("dx_w4_post").collect()[0]["ok"] == 2
    assert spark.read.parquet(out).count() == 5


def test_job_rdbmsreader_querysql_catalog(spark, tmp_path):
    """P3: a rdbmsreader job with querySql executes the SQL text
    verbatim (catalog mode — no jdbcUrl), end-to-end into a writer."""
    out = str(tmp_path / "p3_out")
    spark.range(100).selectExpr("id", "id * 2 AS dbl").createOrReplaceTempView(
        "dx_p3_src"
    )
    config = {
        "job": {"content": [{
            "reader": {"name": "rdbmsreader", "parameter": {
                "connection": [{
                    "querySql": ["SELECT id, dbl FROM dx_p3_src WHERE id < 10"],
                }],
            }},
            "writer": {"name": "filewriter", "parameter": {"path": out}},
        }]}
    }
    stats = run_job(spark, config)
    assert stats["contents"][0]["records_written"] == 10
    assert spark.read.parquet(out).agg({"dbl": "max"}).collect()[0][0] == 18


def test_job_rdbmsreader_table_where_catalog(spark, tmp_path):
    """S1 table+column+where job shape in catalog mode."""
    out = str(tmp_path / "s1_out")
    spark.range(50).selectExpr("id", "id % 5 AS g").createOrReplaceTempView(
        "dx_s1_src"
    )
    config = {
        "job": {"content": [{
            "reader": {"name": "mysqlreader", "parameter": {
                "connection": [{"table": ["dx_s1_src"]}],
                "column": ["id", "g"],
                "where": "g = 0",
            }},
            "writer": {"name": "filewriter", "parameter": {"path": out}},
        }]}
    }
    stats = run_job(spark, config)
    assert stats["contents"][0]["records_written"] == 10


def test_jdbc_writer_options_mapping():
    """W1: CommonRdbmsWriter writeMode → Spark JDBC write plan."""
    from dx.sources import jdbc_writer_options

    ins = jdbc_writer_options("jdbc:mysql://h/db", "t", ["a", "b"], "insert", 512)
    assert ins["mode"] == "append" and ins["upsert_sql"] is None
    assert ins["options"]["batchsize"] == "512"
    assert ins["options"]["dbtable"] == "t"

    tr = jdbc_writer_options("jdbc:mysql://h/db", "t", ["a"], "truncate")
    assert tr["mode"] == "overwrite" and tr["options"]["truncate"] == "true"

    rep = jdbc_writer_options("jdbc:mysql://h/db", "t", ["a", "b"], "replace")
    assert rep["upsert_sql"] == "REPLACE INTO t (a, b) VALUES (?, ?)"

    upd = jdbc_writer_options("jdbc:mysql://h/db", "t", ["a", "b"], "update")
    assert "ON DUPLICATE KEY UPDATE a = VALUES(a), b = VALUES(b)" in upd["upsert_sql"]

    with pytest.raises(ValueError, match="writeMode"):
        jdbc_writer_options("u", "t", [], "bogus")


def test_job_required_constant_column_not_dirty(spark, tmp_path):
    """ADVICE r1: a required constant/value column must not break the
    dirty split (it can never fail a cast) and an aliased column's
    required check must use the alias."""
    src = str(tmp_path / "req_src")
    spark.createDataFrame(
        [("1",), ("x",), ("3",)], "v string"
    ).coalesce(1).write.mode("overwrite").csv(src)
    out = str(tmp_path / "req_out")
    config = {
        "job": {
            "setting": {"errorLimit": {"record": 5}},
            "content": [{
                "reader": {"name": "filereader", "parameter": {
                    "path": src, "fileType": "csv",
                    "column": [
                        {"index": 0, "type": "long", "alias": "num",
                         "required": True},
                        {"type": "string", "value": "tag", "required": True},
                    ],
                }},
                "writer": {"name": "filewriter", "parameter": {"path": out}},
            }],
        }
    }
    stats = run_job(spark, config)
    assert stats["contents"][0]["dirty_records"] == 1   # 'x' fails the cast
    assert stats["contents"][0]["records_written"] == 2


def test_job_registry_transform_pandas(spark, tmp_path):
    """P9 replacement exercised: a registry transform (built-in column
    fn AND an Arrow pandas UDF) applied via job.json, with dx_groovy's
    rejection pointing at it."""
    src = str(tmp_path / "reg_src")
    spark.createDataFrame(
        [("a\r\nb",), ("plain",)], "t string"
    ).coalesce(1).write.mode("overwrite").parquet(src)
    out = str(tmp_path / "reg_out")
    config = {
        "job": {"content": [{
            "reader": {"name": "filereader", "parameter": {
                "path": src, "fileType": "parquet",
            }},
            "transformer": [
                {"name": "dx_registry", "parameter": {"fn": "normalize_content"}},
                {"name": "dx_registry", "parameter": {"fn": "sha256_pandas"}},
            ],
            "writer": {"name": "filewriter", "parameter": {"path": out}},
        }]}
    }
    run_job(spark, config)
    import hashlib

    got = {r["t"] for r in spark.read.parquet(out).collect()}
    assert hashlib.sha256(b"a\nb").hexdigest() in got       # CRLF normalized first
    assert hashlib.sha256(b"plain").hexdigest() in got

    with pytest.raises(ValueError, match="dx_registry"):
        run_job(spark, {"job": {"content": [{
            "reader": {"name": "streamreader", "parameter": {"sliceRecordCount": 1}},
            "transformer": [{"name": "dx_groovy", "parameter": {}}],
            "writer": {"name": "consolewriter", "parameter": {}},
        }]}})


def test_job_single_pass_counts_via_observation(spark, tmp_path, monkeypatch):
    """VERDICT r2 #3: a file-writer job content costs ONE source scan —
    record + dirty counts ride the write action as an Observation.
    Proven by forbidding DataFrame.count() outright for the job run."""
    import pyspark.sql.dataframe as psd

    out = os.path.join(str(tmp_path), "onepass_out")
    config = {
        "job": {
            "setting": {"errorLimit": {"record": 5}},
            "content": [{
                "reader": {"name": "filereader", "parameter": {
                    "path": _csv(tmp_path), "fileType": "csv", "skipHeader": True,
                    "column": [
                        {"name": "id", "type": "long"},
                        {"name": "price", "type": "double", "required": True},
                    ],
                }},
                "writer": {"name": "filewriter", "parameter": {
                    "path": out, "writeMode": "truncate",
                }},
            }],
        }
    }

    def no_count(self, *a, **k):  # pragma: no cover - failure path
        raise AssertionError("run_job must not run a separate count() pass")

    monkeypatch.setattr(psd.DataFrame, "count", no_count)
    stats = run_job(spark, config)
    monkeypatch.undo()
    assert stats["contents"][0] == {"records_written": 2, "dirty_records": 1}
    assert spark.read.parquet(out).count() == 2  # dirty row quarantined


def test_job_error_limit_percentage(spark, tmp_path):
    """E1 errorLimit.percentage (VERDICT r2 #4): the csv is 1/3 dirty —
    the job fails at percentage=0.05 and passes at 0.5."""
    def cfg(pct):
        return {
            "job": {
                "setting": {"errorLimit": {"percentage": pct}},
                "content": [{
                    "reader": {"name": "filereader", "parameter": {
                        "path": _csv(tmp_path), "fileType": "csv",
                        "skipHeader": True,
                        "column": [
                            {"name": "id", "type": "long"},
                            {"name": "price", "type": "double",
                             "required": True},
                        ],
                    }},
                    "writer": {"name": "filewriter", "parameter": {
                        "path": os.path.join(str(tmp_path), f"pct_{pct}"),
                        "writeMode": "truncate",
                    }},
                }],
            }
        }

    with pytest.raises(RuntimeError, match="dirty ratio"):
        run_job(spark, cfg(0.05))
    stats = run_job(spark, cfg(0.5))
    assert stats["contents"][0]["dirty_records"] == 1
