"""Interleaved conf A/B probe at one parallelism level.

The host's memory subsystem drifts on the scale of minutes (see
BENCH/RUNS.md), so conf variants are comparable only when their reps
INTERLEAVE within one window: round-robin base,v1,v2,... × R rounds,
one subprocess (warmup + 1 measured rep) per cell, then compare each
variant's per-round ratio to base.

    python tools/conf_probe.py [--cpus 32] [--rounds 2] [--keep-log]

Writes BENCH/conf_probe.json.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault("DX_SCALE_KEYS", "8000000")
import bench_scaling as bs  # noqa: E402

VARIANTS: dict[str, dict[str, str]] = {
    # dx.session now defaults to ParallelGC, so the G1 baseline must be
    # pinned explicitly to stay a baseline.
    "base": {"DX_EXTRA_JAVA": "-XX:+UseG1GC"},
    "pgc": {"DX_EXTRA_JAVA": "-XX:+UseParallelGC"},
    "zstd": {"DX_IO_CODEC": "zstd"},
    "sp128": {"DX_SHUFFLE_PARTS": "128"},
    "pgc_zstd": {"DX_EXTRA_JAVA": "-XX:+UseParallelGC", "DX_IO_CODEC": "zstd"},
    "pgc_sp128": {"DX_EXTRA_JAVA": "-XX:+UseParallelGC",
                  "DX_SHUFFLE_PARTS": "128"},
}


def run_cell(cpus: int, env_over: dict[str, str]) -> dict:
    env = {**os.environ, "DX_SCALE_REPS": "2", **env_over}
    out = subprocess.run(
        ["taskset", "-c", f"0-{cpus - 1}", sys.executable,
         os.path.join(REPO, "tools", "bench_scaling.py"), "--worker", str(cpus)],
        capture_output=True, text=True, cwd=REPO, check=True, env=env,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--keep-log", action="store_true")
    ap.add_argument("--variants", default=",".join(VARIANTS))
    args = ap.parse_args()

    if not (args.keep_log and os.path.exists(bs.LOG)):
        bs.N_KEYS = int(os.environ["DX_SCALE_KEYS"])
        print(f"[probe] generating changelog: {bs.N_KEYS} keys", file=sys.stderr)
        bs.generate()

    names = [v for v in args.variants.split(",") if v in VARIANTS]
    rounds = []
    for r in range(args.rounds):
        row = {}
        for name in names:
            cell = run_cell(args.cpus, VARIANTS[name])
            row[name] = cell
            print(f"[probe] round {r + 1} {name}: best {cell['best_sec']}s "
                  f"({cell['events_per_sec']:,.0f} ev/s) reps {cell['reps_sec']}",
                  file=sys.stderr, flush=True)
        rounds.append(row)
    summary = {
        "cpus": args.cpus,
        "variants": {n: VARIANTS[n] for n in names},
        "rounds": [
            {n: {"best_sec": c["best_sec"], "reps_sec": c["reps_sec"]}
             for n, c in row.items()}
            for row in rounds
        ],
        "vs_base": {
            n: [round(row["base"]["best_sec"] / row[n]["best_sec"], 3)
                for row in rounds if "base" in row]
            for n in names if n != "base"
        },
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "conf_probe.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
