"""Same-session alternating A/B of the two fingerprint forms
(VERDICT r2 'what's wrong' #2 / next-round #5).

A = scalar Column form (array_min over an interpreted transform tree)
B = explode->min-agg form (fingerprint_df, whole-stage codegen)

Alternating A,B,A,B,... inside ONE JVM is the only valid comparison on
this host (BASELINE.md: cross-session numbers drift 2-3x with page
cache / GC regime). Materialization via the noop sink.
"""
import json
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")
from dx.pipelines import text as ptext  # noqa: E402
from dx.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
PAIRS = int(sys.argv[2]) if len(sys.argv) > 2 else 3

spark = get_spark(app_name="ab-fp", master="local[32]", shuffle_partitions=32)
docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
docs.count()  # warm file index / page cache once, outside the timings


def run(df):
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    return round(time.monotonic() - t0, 3)


def scalar_form():
    return docs.select(
        F.col("doc_id"), ptext.fingerprint(F.col("text"), 16).alias("fp")
    )


def explode_form():
    return ptext.fingerprint_df(docs, "text", "doc_id", 16)


# equivalence gate before timing anything
mismatch = (
    scalar_form().alias("a")
    .join(explode_form().alias("b"), "doc_id")
    .filter(~(F.col("a.fp").eqNullSafe(F.col("b.fp"))))
    .count()
)
assert mismatch == 0, f"forms disagree on {mismatch} docs"

pairs = []
for i in range(PAIRS):
    a = run(scalar_form())
    b = run(explode_form())
    pairs.append({"pair": i + 1, "scalar_s": a, "explode_s": b,
                  "speedup": round(a / b, 2)})
    print(f"[ab] pair {i+1}: scalar={a}s explode={b}s speedup={a/b:.2f}x",
          file=sys.stderr)

med = sorted(p["speedup"] for p in pairs)[len(pairs) // 2]
print(json.dumps({"sf_dir": SF_DIR, "pairs": pairs, "median_speedup": med}))
