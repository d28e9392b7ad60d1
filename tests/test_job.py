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