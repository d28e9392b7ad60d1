"""bench.py — per-round benchmark the driver runs (BENCH_r{N}.json).

Prints exactly ONE JSON line on stdout:
    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": <sf>, ...extras}
Everything else goes to stderr.

Two parts:
1. Headline: the CDC MERGE-upsert replay (the north_rule metric) on a
   deterministic changelog synthesized distributedly at a size scaled
   to the sf dir (gen_changelog_spark — the same code path that scales
   to 10^10 events on a real cluster). Reported as `cdc_replay` secs +
   `events_per_sec`.
2. Operator suite: every queries() entry from __spark_entry__ executed
   at $SPARK_GRAFT_SF_DIR with a noop sink (full computation, no
   driver materialization).

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS  (default all cores),
     DX_BENCH_SKIP_QUERIES / DX_BENCH_SKIP_REPLAY=1 to run one part.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

# replay size ~ sf: sf0.1 → ~3.2M events; sf0.01 → ~320k (quick local runs)
_SF = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else 0.1
N_KEYS = max(8_000, int(800_000 * _SF / 0.1))
MEAN_VERSIONS = 4


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def bench_replay(spark) -> dict:
    from pyspark.sql import functions as F

    from dx.engine import ReplayEngine
    from dx.generator import gen_changelog_spark
    from dx.lake import LakeTable

    wd = os.path.join(REPO, ".tmp", "bench")
    shutil.rmtree(wd, ignore_errors=True)
    log_path = os.path.join(wd, "changelog.parquet")

    t0 = time.monotonic()
    # LSN-clustered layout: range-partition + sort by lsn so each
    # micro-batch's (lo, hi] filter prunes to ~1/batches of the files
    # via parquet row-group stats — at 10^10 events a batch must never
    # scan the whole changelog.
    gen_changelog_spark(
        spark, n_keys=N_KEYS, mean_versions=MEAN_VERSIONS, seed=42,
        n_repos=50, partitions=CPUS,
    ).repartitionByRange(CPUS, "lsn").sortWithinPartitions("lsn").write.parquet(log_path)
    changelog = spark.read.parquet(log_path)
    n_events = changelog.count()
    gen_s = time.monotonic() - t0
    log(f"[bench] changelog: {n_events} events in {gen_s:.1f}s")

    head = changelog.agg(F.max("lsn")).collect()[0][0]
    # Two full replay reps (fresh table each), min reported: identical
    # code+input measured 21-87s across host windows on this shared VM
    # (BENCH/RUNS.md replay A/B), so a single cold sample conflates
    # engine speed with hypervisor co-tenancy. Rep times are disclosed.
    reps: list[float] = []
    metrics = []
    table = None
    # clamp: DX_BENCH_REPLAY_REPS=0 would leave reps empty and
    # min(reps) below would raise; one rep is the floor.
    for rep in range(max(1, int(os.environ.get("DX_BENCH_REPLAY_REPS", 2)))):
        lake_dir = os.path.join(wd, f"lake{rep}")
        shutil.rmtree(lake_dir, ignore_errors=True)
        table = LakeTable.create(spark, lake_dir, n_buckets=CPUS)
        engine = ReplayEngine(
            spark, table, changelog, delta=max(1, (head + 3) // 4),
            metrics_path=os.path.join(wd, "metrics.jsonl"),
        )
        t0 = time.monotonic()
        metrics = engine.run()
        reps.append(time.monotonic() - t0)
        log(f"[bench] replay rep {rep}: {reps[-1]:.1f}s")
    replay_s = min(reps)
    eps = n_events / replay_s if replay_s > 0 else 0.0
    log(f"[bench] replay: {n_events} events, {len(metrics)} batches, "
        f"{replay_s:.1f}s → {eps:,.0f} events/s")
    return {
        "replay_sec": round(replay_s, 2),
        "replay_reps_sec": [round(r, 2) for r in reps],
        "replay_events": int(n_events),
        "events_per_sec": round(eps, 1),
        "replay_batches": len(metrics),
        "final_rows": int(table.read().count()),
    }


def bench_queries(spark) -> dict[str, float]:
    import __spark_entry__ as entry

    out: dict[str, float] = {}
    for name, fn in entry.queries().items():
        t0 = time.monotonic()
        try:
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            out[name] = round(time.monotonic() - t0, 3)
        except Exception as e:  # report but never kill the bench line
            log(f"[bench] {name} FAILED: {e}")
            out[name] = -1.0
        log(f"[bench] {name}: {out[name]}s")
    return out


def main() -> int:
    from dx.session import get_spark

    spark = get_spark(
        "dx-bench", master=f"local[{CPUS}]", shuffle_partitions=CPUS,
        extra_conf={"spark.driver.memory": os.environ.get("DX_DRIVER_MEM", "32g")},
    )
    t_all = time.monotonic()
    queries: dict[str, float] = {}
    extras: dict = {}
    if not os.environ.get("DX_BENCH_SKIP_REPLAY"):
        extras = bench_replay(spark)
        queries["cdc_replay"] = extras["replay_sec"]
    if not os.environ.get("DX_BENCH_SKIP_QUERIES"):
        queries.update(bench_queries(spark))
    total = round(time.monotonic() - t_all, 2)
    line = {
        "metric": "cdc_merge_replay_and_operator_suite",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": _SF,
        "cpus": CPUS,
        **extras,
    }
    print(json.dumps(line), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
