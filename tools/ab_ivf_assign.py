"""Same-session A/B: ivf_assign HOF form vs pandas-UDF matmul form
(BENCH protocol: interleaved reps, min of measured, warmup rep 0).

The HOF form builds k interpreted `aggregate(zip_with(...))` dot
products per row — O(k·dim) expression tree, fine at the oracle's
k=16 but out of codegen territory for production k. The matmul form
is one Arrow-batched pandas UDF doing V @ C.T in exact int64 numpy;
plan size O(1) in k. Both are pytest-equivalence-tested bit-identical
(tests/test_pipelines.py::test_ivf_assign_matmul_equivalence); this
tool measures where the crossover sits.

Usage: python tools/ab_ivf_assign.py [sf_dir] [reps] [k ...]
Default ks: 16 256. Writes one JSON line to stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    from dx.pipelines import similarity as sim
    from dx.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    ks = [int(x) for x in sys.argv[3:]] or [16, 256]
    spark = get_spark("ab-ivf-assign")
    vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    # replicate the corpus so per-row compute dominates JVM/Arrow
    # startup at this tiny SF (assignment cost is per-row; the
    # centroid set is identical for every replica)
    corpus = vecs.withColumn(
        "__rep", F.explode(F.sequence(F.lit(0), F.lit(15)))
    ).select(
        (F.col("vec_id") * 16 + F.col("__rep")).alias("vec_id"), "embedding"
    ).cache()
    n = corpus.count()
    result: dict[str, dict] = {"sf_dir": sf_dir, "rows": n, "ks": {}}
    for k in ks:
        cents = sim.ivf_centroids(vecs, k=k)
        times: dict[str, list[float]] = {"hof": [], "matmul": []}
        plan_s: dict[str, float] = {}
        for rep in range(reps + 1):  # rep 0 = warmup for both
            for impl in ("hof", "matmul"):
                t0 = time.monotonic()
                df = sim.ivf_assign(corpus, cents, impl=impl)
                plan_s[impl] = round(time.monotonic() - t0, 3)
                t0 = time.monotonic()
                df.write.format("noop").mode("overwrite").save()
                dt = time.monotonic() - t0
                if rep > 0:
                    times[impl].append(round(dt, 3))
                print(f"[k={k} rep {rep}] {impl}: {dt:.3f}s "
                      f"(plan {plan_s[impl]}s)", file=sys.stderr)
        best_h, best_m = min(times["hof"]), min(times["matmul"])
        result["ks"][str(k)] = {
            "reps": times,
            "best_hof": best_h,
            "best_matmul": best_m,
            "speedup_matmul": round(best_h / best_m, 2),
        }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
