"""Same-session alternating A/B: hex _content_sha (pre-migration
commit) vs binary _content_sha (HEAD) on the official replay protocol.

Round-2/3 lesson applied: cross-session numbers are invalid on this
shared host, so the two code versions alternate WITHIN one session —
hex,bin,hex,bin (>= 3 pairs), each side a fresh CPU-pinned subprocess
running tools/bench_scaling.py's worker on the SAME pre-generated
changelog. The hex side runs from a read-only git worktree at the
last pre-migration commit; the binary side from the live repo.

Usage:
    python tools/ab_sha_binary.py [hex_commit] [pairs] [cpus]
Defaults: hex_commit = the parent of the migration commit (captured
below), pairs = 3, cpus = 32. Env: DX_SCALE_KEYS (default 8_000_000,
the official ~32M-event protocol size).

Writes one JSON line to stdout; raw per-rep timings included.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

HEX_COMMIT_DEFAULT = "ab7b58f"  # parent of the binary-sha migration
WT = os.path.join(REPO, ".tmp", "ab_hex_wt")


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def run_worker(root: str, cpus: int) -> dict:
    out = subprocess.run(
        ["taskset", "-c", f"0-{cpus - 1}", sys.executable,
         os.path.join(root, "tools", "bench_scaling.py"), "--worker", str(cpus)],
        capture_output=True, text=True, cwd=root, check=True,
        env={**os.environ, "DX_SCALE_REPS": os.environ.get("DX_SCALE_REPS", "3")},
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> int:
    hex_commit = sys.argv[1] if len(sys.argv) > 1 else HEX_COMMIT_DEFAULT
    pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    os.environ.setdefault("DX_SCALE_KEYS", "8000000")

    subprocess.run(["git", "worktree", "remove", "--force", WT],
                   cwd=REPO, capture_output=True)
    subprocess.run(["git", "worktree", "add", "--detach", WT, hex_commit],
                   cwd=REPO, check=True, capture_output=True)
    # the worktree's worker resolves paths relative to ITS root: share
    # the generated changelog via a symlink
    os.makedirs(os.path.join(WT, ".tmp"), exist_ok=True)
    link = os.path.join(WT, ".tmp", "scaling")
    if not os.path.islink(link):
        os.symlink(os.path.join(REPO, ".tmp", "scaling"), link)

    log(f"[ab-sha] generating shared changelog ({os.environ['DX_SCALE_KEYS']} keys)")
    import tools.bench_scaling as bs
    bs.generate()

    results: dict[str, list[dict]] = {"hex": [], "bin": []}
    effs = []
    for p in range(pairs):
        h = run_worker(WT, cpus)
        b = run_worker(REPO, cpus)
        results["hex"].append(h)
        results["bin"].append(b)
        ratio = round(h["best_sec"] / b["best_sec"], 3)
        effs.append(ratio)
        log(f"[pair {p}] hex {h['best_sec']}s vs bin {b['best_sec']}s "
            f"-> speedup {ratio}")
    out = {
        "protocol": f"alternating hex/bin, {pairs} pairs, local[{cpus}] pinned, "
                    f"min of measured reps per side",
        "hex_commit": hex_commit,
        "events": results["hex"][0]["events"],
        "pairs_speedup_bin": effs,
        "median_speedup_bin": round(statistics.median(effs), 3),
        "raw": results,
    }
    subprocess.run(["git", "worktree", "remove", "--force", WT],
                   cwd=REPO, capture_output=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
