"""Storage A/B at the wide 8:32 threads pair — split "disk" from "bus".

The standing attribution for the 8→32 shortfall (BENCH/PROFILE.md,
RUNS.md) is "the single shared memory bus + disk": private-heap
executors, shuffle symmetry, GC, and codec were all controlled away,
and a raw 32-process sha256 probe scales ~1.0. That leaves two
physical suspects conflated — shared DRAM bandwidth and the one
shared disk (shuffle files + the lake parquet write + os.sync
between reps all hit it). This tool separates them by relocating
each byte stream onto tmpfs (RAM-backed, no disk I/O, still paying
full memory-bus cost):

- ``shm_shuffle``: spark.local.dir on /dev/shm — shuffle/spill bytes
  never touch disk.
- ``shm_all``: shuffle AND the lake write target on /dev/shm — no
  job byte touches disk (source changelog stays on disk but is
  page-cached after the warmup rep).

If the 8→32 efficiency band (~0.55-0.65) does not move with ALL disk
I/O removed, the residual is DRAM bandwidth alone — a per-node
resource every real cluster multiplies with node count. If it does
move, fast local storage (NVMe/ramdisk spark.local.dir — a standard
cluster knob) is part of the recipe. Attribution-only for the lake
leg: a tmpfs table is not durable.

Protocol identical to tools/ab_codec.py: per round, per config, one
CPU-pinned local[8] level then one local[32] level (3 reps, rep 0
warmup, min-of-measured), interleaved within one host window, fixed
32 shuffle partitions → identical physical plan everywhere. Codec is
the shipped width-aware default at BOTH levels in EVERY config
(DX_WIDE_CODEC=auto), so storage is the only lever.

Usage:
    python tools/ab_storage.py [--rounds 3] [--keep-log]
                               [--configs base,shm_shuffle,shm_all]
Env: DX_SCALE_KEYS (default 8_000_000 → ~32M events).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault("DX_SCALE_KEYS", "8000000")
import bench_scaling as bs  # noqa: E402

SHM = "/dev/shm/dx_ab_storage"

CONFIGS: dict[str, dict[str, str]] = {
    "base": {},
    "shm_shuffle": {
        "DX_EXTRA_CONF": f"spark.local.dir={SHM}/localdir",
    },
    "shm_all": {
        "DX_EXTRA_CONF": f"spark.local.dir={SHM}/localdir",
        "DX_LAKE_WD": f"{SHM}/lake",
    },
}
LO, HI = 8, 32


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def run_level(cpus: int, env_extra: dict[str, str]) -> dict:
    out = subprocess.run(
        ["taskset", "-c", f"0-{cpus - 1}", sys.executable,
         os.path.join(REPO, "tools", "bench_scaling.py"), "--worker", str(cpus)],
        capture_output=True, text=True, cwd=REPO, check=True,
        env={**os.environ, "DX_SCALE_REPS": "3", "DX_WIDE_CODEC": "auto",
             **env_extra},
    )
    shutil.rmtree(SHM, ignore_errors=True)  # never let tmpfs bleed across runs
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--keep-log", action="store_true")
    ap.add_argument("--configs", default=",".join(CONFIGS))
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH", "AB_STORAGE.json"))
    args = ap.parse_args()
    names = [c for c in args.configs.split(",") if c]
    unknown = [c for c in names if c not in CONFIGS]
    if unknown:
        ap.error(f"unknown configs: {unknown}")

    bs.N_KEYS = int(os.environ["DX_SCALE_KEYS"])
    if not (args.keep_log and os.path.exists(bs.LOG)):
        log(f"[ab_storage] generating changelog: {bs.N_KEYS} keys")
        # subprocess so the generator JVM exits before measurement
        subprocess.run(
            [sys.executable,
             os.path.join(REPO, "tools", "bench_scaling.py"), "--generate"],
            cwd=REPO, check=True,
        )

    rounds: list[dict] = []
    for r in range(args.rounds):
        for name in names:
            env = CONFIGS[name]
            log(f"[ab_storage] round {r + 1}/{args.rounds} config={name}: "
                f"local[{LO}] then local[{HI}]")
            r_lo = run_level(LO, env)
            r_hi = run_level(HI, env)
            eff = r_hi["events_per_sec"] / r_lo["events_per_sec"] / (HI / LO)
            rec = {
                "round": r + 1, "config": name,
                "ev_s_lo": r_lo["events_per_sec"],
                "ev_s_hi": r_hi["events_per_sec"],
                "reps_lo": r_lo["reps_sec"], "reps_hi": r_hi["reps_sec"],
                "efficiency": round(eff, 3),
            }
            rounds.append(rec)
            log(f"[ab_storage]   {name}: eff={eff:.3f} "
                f"(hi {r_hi['events_per_sec']:,.0f} ev/s)")

    summary = {}
    for name in names:
        rs = [x for x in rounds if x["config"] == name]
        summary[name] = {
            "median_efficiency": round(
                statistics.median(x["efficiency"] for x in rs), 3),
            "median_ev_s_hi": round(
                statistics.median(x["ev_s_hi"] for x in rs), 1),
            "median_ev_s_lo": round(
                statistics.median(x["ev_s_lo"] for x in rs), 1),
        }
    out = {
        "protocol": f"interleaved per-round storage sweep at {LO}:{HI} threads",
        "n_keys": bs.N_KEYS,
        "rounds": rounds,
        "summary": summary,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
