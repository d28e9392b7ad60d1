"""Codec A/B at the wide 8:32 threads pair (VERDICT r4 → r5 #1).

The r4 attribution says the 8→32 shortfall is the single shared
memory bus + disk (private-heap executors and shuffle symmetry were
controlled away; a raw 32-process sha256 probe scales ~1.0). The one
remaining software lever is BYTES PER EVENT over that bus: this tool
A/Bs compression codecs — (a) spark.io.compression.codec (shuffle /
spill / broadcast, default lz4), (b) the parquet write codec
(default snappy), (c) both — against the baseline, interleaved
within one host window so every comparison sees the same machine
state (the repo's standing rule: never read absolute numbers without
an interleaved control).

Per round, per config: one CPU-pinned local[8] level then one
local[32] level (tools/bench_scaling.py --worker, 3 reps each, rep 0
warmup, min-of-measured), identical physical plan (32 shuffle
partitions at both levels). Reported per config: each round's
efficiency ev/s(32)/ev/s(8)/4, the 32-side absolute ev/s (an
efficiency "gain" bought by slowing the lo side is not a win), and
medians across rounds.

Usage:
    python tools/ab_codec.py [--rounds 3] [--keep-log]
                             [--configs base,zstd_io,zstd_parquet,zstd_both]
Env: DX_SCALE_KEYS (default 8_000_000 → ~32M events).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault("DX_SCALE_KEYS", "8000000")
import bench_scaling as bs  # noqa: E402

# Every config pins BOTH codecs explicitly: dx.session.get_spark now
# defaults to zstd at >=16 cores (the adoption this tool measured), so
# "base" must spell out the stock lz4/snappy to stay an honest control.
CONFIGS: dict[str, dict[str, str]] = {
    "base": {
        "DX_IO_CODEC": "lz4",
        "DX_EXTRA_CONF": "spark.sql.parquet.compression.codec=snappy",
    },
    "zstd_io": {
        "DX_IO_CODEC": "zstd",
        "DX_EXTRA_CONF": "spark.sql.parquet.compression.codec=snappy",
    },
    "zstd_parquet": {
        "DX_IO_CODEC": "lz4",
        "DX_EXTRA_CONF": "spark.sql.parquet.compression.codec=zstd",
    },
    "zstd_both": {
        "DX_IO_CODEC": "zstd",
        "DX_EXTRA_CONF": "spark.sql.parquet.compression.codec=zstd",
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
        env={**os.environ, "DX_SCALE_REPS": "3", **env_extra},
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--keep-log", action="store_true")
    ap.add_argument("--configs", default=",".join(CONFIGS))
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH", "AB_CODEC.json"))
    args = ap.parse_args()
    names = [c for c in args.configs.split(",") if c]
    unknown = [c for c in names if c not in CONFIGS]
    if unknown:
        ap.error(f"unknown configs: {unknown}")

    bs.N_KEYS = int(os.environ["DX_SCALE_KEYS"])
    if not (args.keep_log and os.path.exists(bs.LOG)):
        log(f"[ab_codec] generating changelog: {bs.N_KEYS} keys")
        # subprocess so the generator JVM exits before measurement
        # starts (in-process bs.generate() leaves a ~33 GB py4j JVM
        # resident for the whole sweep)
        subprocess.run(
            [sys.executable,
             os.path.join(REPO, "tools", "bench_scaling.py"), "--generate"],
            cwd=REPO, check=True,
        )

    rounds: list[dict] = []
    for r in range(args.rounds):
        for name in names:
            env = CONFIGS[name]
            log(f"[ab_codec] round {r + 1}/{args.rounds} config={name}: "
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
            log(f"[ab_codec]   {name}: eff={eff:.3f} "
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
        "protocol": f"interleaved per-round config sweep at {LO}:{HI} threads",
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
