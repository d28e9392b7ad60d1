"""Same-session A/B: md5-per-(shingle,i) MinHash vs one-md5 + integer
permutations (BENCH protocol: interleaved reps, min of measured).

Form A (current, dx/pipelines/dedup.minhash_signatures_df): element i
of the signature = min over shingles of md5(f"{i}:" + shingle) — k
md5 calls per shingle (k=8).

Form B (candidate): one md5 per shingle (u32 slice, text.u32), then
k universal-hash permutations min((a_i * h + b_i) % P) in pure int64
arithmetic — identical shuffle shape (per-doc partial-combined min),
~1/k the hash CPU. Constants are deterministic md5-derived literals
(hardcoded, same on the DuckDB side) with a_i < P, h < 2^32, so
a*h + b < 2^63 (no overflow). P = 2^31 - 1.

Usage: python tools/ab_minhash.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from dx.pipelines.text import word_shingles  # noqa: E402

MH_P = 2147483647  # 2^31 - 1
MH_AB = [
    (1250150343, 10069388), (900231574, 1260435945),
    (1294180885, 786266819), (781571296, 1161115865),
    (1617287443, 146054044), (1349824861, 669593129),
    (612791779, 1610176249), (2084106643, 20107235),
]


def form_a(df, k=8):
    ex = df.select(F.col("doc_id"), F.explode(word_shingles(F.col("text"), 3)).alias("__sh"))
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("__sh")))).alias(f"mh{i}")
        for i in range(k)
    ]
    return ex.groupBy("doc_id").agg(*aggs)


def form_b(df, k=8):
    ex = df.select(
        F.col("doc_id"), F.explode(word_shingles(F.col("text"), 3)).alias("__sh")
    ).select(
        F.col("doc_id"),
        F.conv(F.substring(F.md5(F.col("__sh")), 1, 8), 16, 10)
        .cast("long").alias("__h"),
    )
    aggs = [
        F.min((F.lit(a) * F.col("__h") + F.lit(b)) % F.lit(MH_P)).alias(f"mh{i}")
        for i, (a, b) in enumerate(MH_AB[:k])
    ]
    return ex.groupBy("doc_id").agg(*aggs)


def main() -> int:
    from dx.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("ab-minhash")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    times = {"a": [], "b": []}
    for rep in range(reps + 1):  # rep 0 = warmup for both
        for name, fn in (("a", form_a), ("b", form_b)):
            t0 = time.monotonic()
            fn(docs).write.format("noop").mode("overwrite").save()
            dt = time.monotonic() - t0
            if rep > 0:
                times[name].append(round(dt, 3))
            print(f"[rep {rep}] form {name}: {dt:.3f}s", file=sys.stderr)
    out = {
        "sf_dir": sf_dir,
        "reps": times,
        "best_a": min(times["a"]),
        "best_b": min(times["b"]),
        "speedup_b": round(min(times["a"]) / min(times["b"]), 2),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
