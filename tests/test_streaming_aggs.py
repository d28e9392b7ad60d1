"""Streaming windowed aggregation + stateful sessionization
(dx/streaming.py): watermark-closed tumbling windows, late-data drop,
applyInPandasWithState session windows."""

from __future__ import annotations

import os

import pandas as pd

from dx.streaming import sessionize, windowed_event_counts

EVENTS_DDL = "event_id long, ts timestamp, user_id long, event_type string, value double"


def _write(spark, rows, path):
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    spark.createDataFrame(pdf, EVENTS_DDL).coalesce(1).write.mode("overwrite").parquet(path)


def _run_available(spark, src_dir, ckpt, out_dir, builder):
    stream = spark.readStream.schema(EVENTS_DDL).option(
        "recursiveFileLookup", "true"
    ).parquet(src_dir)
    q = (
        builder(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.read.parquet(out_dir)


def test_windowed_counts_and_late_drop(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ck")
    sink = str(tmp_path / "out")
    os.makedirs(src)
    _write(spark, [
        (1, "2024-01-01 10:00:10", 1, "click", 1.0),
        (2, "2024-01-01 10:00:40", 2, "click", 2.0),
        (3, "2024-01-01 10:01:20", 1, "view", 3.0),
        (4, "2024-01-01 10:05:00", 3, "click", 4.0),   # advances watermark to 10:03
    ], os.path.join(src, "b1"))
    out = _run_available(
        spark, src, ckpt, sink, lambda s: windowed_event_counts(s)
    )
    rows = {(str(r["window_start"]), r["event_type"]): r for r in out.collect()}
    # windows before 10:03 are closed and emitted; the 10:05 window is open
    assert rows[("2024-01-01 10:00:00", "click")]["n_events"] == 2
    assert rows[("2024-01-01 10:00:00", "click")]["sum_value_cents"] == 300
    assert rows[("2024-01-01 10:01:00", "view")]["n_events"] == 1
    assert not any(k[0].startswith("2024-01-01 10:05") for k in rows)

    # a late row inside an already-closed window must be DROPPED
    _write(spark, [
        (5, "2024-01-01 10:00:50", 9, "click", 99.0),  # < watermark 10:03
        (6, "2024-01-01 10:09:00", 3, "click", 5.0),   # pushes watermark to 10:07
    ], os.path.join(src, "b2"))
    out = _run_available(
        spark, src, ckpt, sink, lambda s: windowed_event_counts(s)
    )
    all_rows = [
        (str(r["window_start"]), r["event_type"], r["n_events"]) for r in out.collect()
    ]
    # the 10:00 click window exists exactly ONCE with n=2 — the late
    # row neither re-emitted it nor changed its count
    assert all_rows.count(("2024-01-01 10:00:00", "click", 2)) == 1
    assert not any(w == "2024-01-01 10:00:00" and t == "click" and n != 2
                   for w, t, n in all_rows)
    # the newly closed 10:05 window emitted in run 2
    assert ("2024-01-01 10:05:00", "click", 1) in all_rows


def test_sessionize_gap_split(spark, tmp_path):
    src = str(tmp_path / "s_src")
    ckpt = str(tmp_path / "s_ck")
    os.makedirs(src)
    _write(spark, [
        (1, "2024-01-01 10:00:00", 1, "click", 0.0),
        (2, "2024-01-01 10:00:10", 1, "click", 0.0),
        (3, "2024-01-01 10:01:30", 1, "click", 0.0),   # > 30s gap → new session
        (4, "2024-01-01 10:00:05", 2, "view", 0.0),
        (5, "2024-01-01 10:30:00", 99, "click", 0.0),  # watermark pusher
    ], os.path.join(src, "b1"))
    out = _run_available(
        spark, src, ckpt, str(tmp_path / "s_out"),
        lambda s: sessionize(s, gap_seconds=30),
    )
    rows = [r.asDict() for r in out.collect()]
    u1 = sorted(
        [r for r in rows if r["user_id"] == 1], key=lambda r: r["session_start"]
    )
    # the first user-1 session (10:00:00-10:00:10, 2 events) closed by the gap
    assert u1 and u1[0]["n_events"] == 2
    assert str(u1[0]["session_end"]) == "2024-01-01 10:00:10"
    assert all(r["closed"] for r in rows)
