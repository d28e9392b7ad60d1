"""DataX-shaped job runner: run a `job.json` as one DataFrame pipeline.

C1/C2 parity (†core/Engine.java + JobContainer lifecycle, SURVEY.md
§2.1): a DataX user's job file — reader → [transformers] → writer with
speed/errorLimit settings — executes as a single declarative Spark
plan. The Reader→Channel→Writer thread machinery has no counterpart
(BASELINE.json:6: that replacement is the point); `speed.channel`
maps to output parallelism, `errorLimit` to the dirty-record check.

Supported plugin names (the capability classes of SURVEY.md §2.2/2.4;
connector breadth beyond these is out of scope §7.5):

- readers: ``filereader`` (csv/text/parquet/orc/json via dx.sources),
  ``streamreader`` (S3 synthetic source: sliceRecordCount rows from
  column specs, constants or deterministic pseudo-random ranges)
- transformers: ``dx_substr``/``dx_pad``/``dx_replace``/``dx_digest``
  (column-in-place), ``dx_filter`` (row drop). ``dx_groovy`` is
  rejected with guidance (pandas UDFs replace script transforms,
  BASELINE.json:15).
- writers: ``filewriter`` (writeMode append / truncate / nonConflict),
  ``consolewriter`` (debug, W5). The CDC lake sink is the engine
  itself (dx.engine / dx.main replay), not a job.json plugin.
"""

from __future__ import annotations

import json
import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dx import transforms as TR
from dx.sources import ColumnSpec, FileReaderConfig, dirty_split, read_file

FILTER_OPS = {
    ">": lambda c, v: c > v,
    "<": lambda c, v: c < v,
    "=": lambda c, v: c == v,
    "!=": lambda c, v: c != v,
    ">=": lambda c, v: c >= v,
    "<=": lambda c, v: c <= v,
    "like": lambda c, v: c.like(v),
    "not like": lambda c, v: ~c.like(v),
}


def _read(spark: SparkSession, reader: dict) -> DataFrame:
    name = reader["name"]
    p = reader.get("parameter", {})
    if name in ("filereader", "txtfilereader", "hdfsreader"):
        cols = [
            ColumnSpec(
                type=c.get("type", "string"),
                index=c.get("index"),
                name=c.get("name"),
                value=c.get("value"),
                format=c.get("format"),
            )
            for c in p.get("column", [])
        ]
        cfg = FileReaderConfig(
            path=p["path"],
            file_type=p.get("fileType", "csv"),
            field_delimiter=p.get("fieldDelimiter", ","),
            encoding=p.get("encoding", "utf-8"),
            skip_header=bool(p.get("skipHeader", False)),
            null_format=p.get("nullFormat"),
            columns=cols,
            where=p.get("where"),
        )
        return read_file(spark, cfg)
    if name == "streamreader":
        n = int(p.get("sliceRecordCount", 100))
        df = spark.range(n)
        sel = []
        for i, c in enumerate(p.get("column", [])):
            t = c.get("type", "string")
            if "value" in c:
                sel.append(F.lit(c["value"]).try_cast(t).alias(f"c{i}"))
            elif "random" in c:  # "min,max" — deterministic pseudo-random
                lo, hi = (int(x) for x in str(c["random"]).split(","))
                sel.append(
                    (F.pmod(F.hash(F.col("id") + i), F.lit(hi - lo + 1)) + lo)
                    .try_cast(t).alias(f"c{i}")
                )
            else:
                sel.append(F.col("id").try_cast(t).alias(f"c{i}"))
        return df.select(*sel) if sel else df
    raise ValueError(f"unsupported reader: {name}")


def _transform(df: DataFrame, spec: dict) -> DataFrame:
    name = spec["name"]
    p = spec.get("parameter", {})
    idx = int(p.get("columnIndex", 0))
    paras = [str(x) for x in p.get("paras", [])]
    col_name = df.columns[idx]
    c = F.col(col_name)
    if name == "dx_groovy":
        raise ValueError(
            "dx_groovy is not supported: script transforms are replaced by "
            "vectorized pandas UDFs (write one and register it in "
            "dx/transforms.py TRANSFORMS)"
        )
    if name == "dx_filter":
        op, val = paras[0], paras[1]
        pred = FILTER_OPS[op](c.cast("string") if op.endswith("like") else c, val)
        return df.filter(~pred)  # DataX semantics: matching records are DROPPED
    if name == "dx_substr":
        out = TR.dx_substr(c, int(paras[0]), int(paras[1]))
    elif name == "dx_pad":
        out = TR.dx_pad(c, paras[0], int(paras[1]), paras[2])
    elif name == "dx_replace":
        out = TR.dx_replace(c, int(paras[0]), int(paras[1]), paras[2])
    elif name == "dx_digest":
        out = TR.dx_digest(c, paras[0] if paras else "md5")
    else:
        raise ValueError(f"unknown transformer: {name}")
    return df.withColumn(col_name, out)


def _write(df: DataFrame, writer: dict) -> None:
    name = writer["name"]
    p = writer.get("parameter", {})
    if name in ("filewriter", "txtfilewriter", "hdfswriter"):
        mode = {
            "append": "append",
            "truncate": "overwrite",
            "nonConflict": "error",
        }[p.get("writeMode", "append")]
        ft = p.get("fileType", "parquet")
        w = df.write.mode(mode)
        if ft == "csv":
            w = w.options(sep=p.get("fieldDelimiter", ","), header="true")
        getattr(w, ft)(p["path"])
        return
    if name in ("consolewriter", "streamwriter"):
        df.show(int(p.get("limit", 20)), truncate=False)
        return
    raise ValueError(f"unsupported writer: {name}")


def run_job(spark: SparkSession, config: dict) -> dict:
    """Execute a job config; returns DataX-style run stats."""
    job = config["job"]
    setting = job.get("setting", {})
    channels = int(setting.get("speed", {}).get("channel", 0))
    err_limit = setting.get("errorLimit", {})
    stats = {"contents": []}
    for content in job["content"]:
        df = _read(spark, content["reader"])
        for t in content.get("transformer", []):
            df = _transform(df, t)
        # C9/E1 dirty-record accounting over required (cast) columns
        required = [
            c.get("name") or f"c{c.get('index')}"
            for c in content["reader"].get("parameter", {}).get("column", [])
            if c.get("required")
        ]
        n_dirty = 0
        if required:
            df, dirty = dirty_split(df, required)
            n_dirty = dirty.count()
            limit = err_limit.get("record")
            if limit is not None and n_dirty > int(limit):
                raise RuntimeError(
                    f"errorLimit exceeded: {n_dirty} dirty records > {limit}"
                )
        if channels:
            df = df.repartition(channels)  # R3: channel count → parallelism
        n = df.count()
        _write(df, content["writer"])
        stats["contents"].append({"records_written": n, "dirty_records": n_dirty})
    return stats


def main(argv: list[str] | None = None) -> int:
    import argparse

    from dx.session import get_spark

    ap = argparse.ArgumentParser(prog="dx-job")
    ap.add_argument("--job", required=True, help="path to job.json")
    args = ap.parse_args(argv)
    with open(args.job) as f:
        config = json.load(f)
    spark = get_spark("dx-job")
    stats = run_job(spark, config)
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    sys.exit(main())
