"""Similarity search over embedding columns (array<float>).

- Brute-force cosine top-k: the exactness baseline. All math is
  integer-exact: embeddings are quantized to int64 milli-units, dot
  products and norms accumulate in int64 (dim 64, |x|<1 ⇒ norms <
  2^20, products < 2^40 — no overflow), and the final cosine is a
  single IEEE-deterministic double op chain, so results are
  bit-identical across engines (the DuckDB oracle reproduces them).
- Sign-LSH bucketing: the scale path. 8 deterministic integer
  hyperplanes (md5-derived, no RNG state) partition vectors into 256
  buckets; ANN probes only matching/nearby buckets — at 10^10 vectors
  the bucket id is the shuffle key and the flat scan disappears.

Distance math is JVM higher-order array math (zip_with/aggregate),
with one measured exception: IVF coarse assignment defaults to an
Arrow-batched int64-numpy matmul (see ivf_assign — interpreted HOF
lambdas never enter codegen, and the A/B shows matmul 9.5–54× faster
at k=16–256 with bit-identical output).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

QUANT = 1000  # milli-unit quantization


def quantize(c: Column) -> Column:
    """float32 array → exact int64 milli-units (floor(x*1000))."""
    return F.transform(c, lambda x: F.floor(x.cast("double") * QUANT).cast("long"))


def dot_q(a: Column, b: Column) -> Column:
    """Exact int64 dot product of two quantized vectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def norm_sq_q(a: Column) -> Column:
    return dot_q(a, a)


def cosine_bps(dot: Column, na: Column, nb: Column) -> Column:
    """floor(10000 · dot / sqrt(na·nb)) — int in, IEEE-deterministic
    double chain (na·nb < 2^53 stays exact), int out. Zero-norm
    vectors (no angle defined) yield NULL, not an ANSI div-by-zero."""
    return F.when(
        (na > 0) & (nb > 0),
        F.floor(dot * 10000 / F.sqrt((na * nb).cast("double"))).cast("long"),
    )


def cosine_topk(df: DataFrame, query_id: int, k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k by cosine against the row with ``id_col=query_id``.

    Plan shape: the 1-row query side is broadcast; the corpus scan is
    embarrassingly parallel; top-k is TakeOrderedAndProject (no full
    sort). Deterministic total order: (cos_bps desc, id asc).
    """
    q = (
        df.filter(F.col(id_col) == query_id)
        .select(
            quantize(F.col(vec_col)).alias("qv"),
        )
        .withColumn("qn", norm_sq_q(F.col("qv")))
    )
    corpus = df.filter(F.col(id_col) != query_id).select(
        F.col(id_col), quantize(F.col(vec_col)).alias("v")
    )
    joined = corpus.crossJoin(F.broadcast(q))
    dot = dot_q(F.col("v"), F.col("qv"))
    return (
        joined.select(
            F.col(id_col),
            dot.alias("dot_q"),
            norm_sq_q(F.col("v")).alias("norm_q"),
            cosine_bps(dot, norm_sq_q(F.col("v")), F.col("qn")).alias("cos_bps"),
        )
        .orderBy(F.col("cos_bps").desc(), F.col(id_col))
        .limit(k)
    )


def hyperplanes(n_planes: int = 8, dim: int = 64, seed: str = "dx") -> list[list[int]]:
    """Deterministic integer hyperplanes in [-1000, 1000]: component
    (p, i) = (u32(md5(f"{seed}:{p}:{i}")) % 2001) - 1000. Pure data —
    reproducible in SQL, no RNG state to ship to executors."""
    out = []
    for p in range(n_planes):
        row = []
        for i in range(dim):
            h = int(hashlib.md5(f"{seed}:{p}:{i}".encode()).hexdigest()[:8], 16)
            row.append(h % 2001 - 1000)
        out.append(row)
    return out


def sign_lsh_bucket(vec_q: Column, planes: list[list[int]]) -> Column:
    """Bucket id = Σ_p (dot(v, h_p) > 0) << p over integer hyperplanes."""
    out = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(v).cast("long") for v in plane])
        out = out + F.when(dot_q(vec_q, lit_plane) > 0, F.lit(1 << p).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return out


def lsh_bucket_stats(df: DataFrame, n_planes: int = 8,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Bucket occupancy for the sign-LSH index (the ANN partition map)."""
    planes = hyperplanes(n_planes)
    return (
        df.select(
            F.col(id_col),
            sign_lsh_bucket(quantize(F.col(vec_col)), planes).alias("bucket"),
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("n_vecs"), F.min(id_col).alias("min_vec"))
    )


def ivf_centroids(df: DataFrame, k: int = 16, id_col: str = "vec_id",
                  vec_col: str = "embedding") -> list[tuple[int, list[int]]]:
    """Deterministic IVF coarse centroids: the ``k`` corpus vectors
    with the smallest ``md5(id)`` (a seeded sample — no RNG state to
    ship, reproducible in SQL), quantized. Returned in that order;
    list position = centroid index. A production build would run
    k-means refinement from this seed; the partition/probe machinery
    below is identical either way."""
    rows = (
        df.select(F.col(id_col), quantize(F.col(vec_col)).alias("v"))
        .withColumn("__r", F.md5(F.col(id_col).cast("string")))
        .orderBy("__r", id_col)
        .limit(k)
        .collect()
    )
    return [(int(r[id_col]), list(r["v"])) for r in rows]


def ivf_assign(df: DataFrame, centroids: list[tuple[int, list[int]]],
               id_col: str = "vec_id", vec_col: str = "embedding",
               impl: str = "matmul") -> DataFrame:
    """Inverted-file (IVF) coarse assignment: each vector goes to the
    centroid with the max integer dot product (IP quantizer, the
    IndexIVFFlat-IP shape); ties break to the smallest centroid index.
    Exact int64 math — the DuckDB oracle reproduces every assignment.
    At 10^10 vectors the centroid id becomes the partition key and a
    query probes only its top-P lists.

    Two bit-identical implementations (pytest-equivalence-tested):

    - ``impl="matmul"`` (default): one Arrow-batched pandas UDF
      computing ``V @ C.T`` in int64 numpy per batch (products <
      2^40, dim-64 sums < 2^46 + k-way max — exact), argmax ties to
      the FIRST max like array_position. The k×dim centroid matrix
      ships once per task in the closure; plan size is O(1) in k.
    - ``impl="hof"``: k interpreted higher-order ``aggregate`` dot
      products per row, zero Python; the expression tree grows
      O(k·dim). Kept as the UDF-free twin and the equivalence anchor.

    There is NO crossover — the interleaved A/B
    (tools/ab_ivf_assign.py, BENCH/AB_IVF_ASSIGN.json) measures
    matmul 9.5× faster at k=16 and 54× at k=256: Spark never
    code-gens interpreted HOF lambdas, so the "zero Python" form pays
    per-row interpretation that dwarfs one Arrow hop. Measurement
    over philosophy, same as the fingerprint reversal.

    Output: id_col, centroid (0-based index), dot_q (winning score).
    """
    if impl == "matmul":
        return _ivf_assign_matmul(df, centroids, id_col, vec_col)
    v = quantize(F.col(vec_col))
    scores = F.array(
        *[dot_q(v, F.array(*[F.lit(x).cast("long") for x in c]))
          for _, c in centroids]
    )
    return df.select(
        F.col(id_col),
        (F.array_position(scores, F.array_max(scores)) - 1).cast("long")
        .alias("centroid"),
        F.array_max(scores).alias("dot_q"),
    )


def _ivf_assign_matmul(df: DataFrame, centroids: list[tuple[int, list[int]]],
                       id_col: str, vec_col: str) -> DataFrame:
    """Matmul form of ivf_assign — see its docstring. Quantization
    happens inside the UDF with the same float64 op chain as
    quantize() (cast float→double, ·1000, floor), so assignments are
    bit-identical to the HOF form.

    Degenerate inputs (ADVICE r4 #3): a NULL embedding yields a NULL
    (centroid, dot_q) row — the same thing the HOF form produces
    (quantize(NULL) → NULL dots → array_max NULL). Non-finite
    ELEMENTS (NaN/±inf) raise ValueError: int64 astype of non-finite
    floats is undefined behavior, so bit-identical equivalence is only
    promised for finite fixed-length vectors; upstream embedding
    pipelines must not emit NaN."""
    cmat = np.array([c for _, c in centroids], dtype=np.int64)  # k×dim

    @F.pandas_udf("struct<centroid: long, dot_q: long>")
    def assign(vecs: pd.Series) -> pd.DataFrame:
        if len(vecs) == 0:
            return pd.DataFrame({"centroid": [], "dot_q": []})
        null_mask = vecs.isna().to_numpy()
        out_c = np.full(len(vecs), None, dtype=object)
        out_d = np.full(len(vecs), None, dtype=object)
        if (~null_mask).any():
            stacked = np.stack(vecs[~null_mask].to_numpy()).astype(np.float64)
            if not np.isfinite(stacked).all():
                raise ValueError(
                    "ivf_assign(impl='matmul'): non-finite embedding "
                    "elements (NaN/inf) — int64 quantization is "
                    "undefined; clean the vectors or use impl='hof'"
                )
            v = np.floor(stacked * QUANT).astype(np.int64)  # == quantize()
            scores = v @ cmat.T                   # n×k int64 exact
            best = scores.argmax(axis=1)          # first max, like
            out_c[~null_mask] = best.astype(np.int64)   # array_position
            out_d[~null_mask] = scores[np.arange(len(best)), best]
        return pd.DataFrame({"centroid": out_c, "dot_q": out_d})

    a = df.select(F.col(id_col), assign(F.col(vec_col)).alias("a"))
    return a.select(F.col(id_col), F.col("a.centroid").alias("centroid"),
                    F.col("a.dot_q").alias("dot_q"))


def ivf_bucket_stats(df: DataFrame, k: int = 16, id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """IVF list occupancy (the ANN partition map, IVF flavor)."""
    cents = ivf_centroids(df, k, id_col, vec_col)
    return (
        ivf_assign(df, cents, id_col, vec_col)
        .groupBy("centroid")
        .agg(F.count("*").alias("n_vecs"), F.min(id_col).alias("min_vec"))
    )


def ivf_topk(df: DataFrame, query_id: int, k: int = 10, n_lists: int = 16,
             nprobe: int = 2, id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """IVF ANN search: rank the query's centroids by dot product, keep
    the top ``nprobe`` lists, run EXACT integer cosine only over the
    vectors assigned to those lists, return top-k. At scale the
    assignment is a precomputed partition column, so the scan prunes
    to nprobe/n_lists of the corpus before any distance math — the
    recall/cost dial is nprobe. Deterministic order: (cos_bps desc,
    id asc); the query vector itself is excluded.
    """
    cents = ivf_centroids(df, n_lists, id_col, vec_col)
    qv = (
        df.filter(F.col(id_col) == query_id)
        .select(quantize(F.col(vec_col)).alias("qv"))
        .collect()[0]["qv"]
    )
    qlit = F.array(*[F.lit(int(x)).cast("long") for x in qv])
    qn = sum(int(x) * int(x) for x in qv)
    # rank centroids for the query driver-side (n_lists is small)
    cscores = [
        (idx, sum(int(a) * int(b) for a, b in zip(c, qv)))
        for idx, (_, c) in enumerate(cents)
    ]
    probe = sorted(cscores, key=lambda t: (-t[1], t[0]))[:nprobe]
    probe_idx = [int(i) for i, _ in probe]
    assigned = ivf_assign(df, cents, id_col, vec_col).filter(
        F.col("centroid").isin(probe_idx) & (F.col(id_col) != query_id)
    )
    corpus = df.select(F.col(id_col), quantize(F.col(vec_col)).alias("v")).join(
        assigned.select(id_col, "centroid"), id_col
    )
    dot = dot_q(F.col("v"), qlit)
    nv = norm_sq_q(F.col("v"))
    return (
        corpus.select(
            F.col(id_col), F.col("centroid"),
            dot.alias("dot_q"),
            cosine_bps(dot, nv, F.lit(qn).cast("long")).alias("cos_bps"),
        )
        .orderBy(F.col("cos_bps").desc(), F.col(id_col))
        .limit(k)
    )


def lsh_neardup_pairs(df: DataFrame, threshold_bps: int = 9000,
                      n_planes: int = 8, id_col: str = "vec_id",
                      vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-bucketed (the scale
    ANN-dedup path): exact integer cosine is evaluated ONLY for pairs
    sharing a sign-LSH bucket — the shuffle key is the bucket id and
    the pairwise work is O(Σ bucket²), never O(n²). Mirrors the text
    pipeline's find(LSH)→verify(exact) split; vectors whose true
    cosine exceeds the threshold but that land in different buckets
    are the LSH recall tradeoff (more planes/bands tighten it).
    Output: vec_a < vec_b, dot_q, cos_bps ≥ threshold_bps.
    """
    planes = hyperplanes(n_planes)
    q = df.select(F.col(id_col), quantize(F.col(vec_col)).alias("v"))
    b = q.withColumn("bucket", sign_lsh_bucket(F.col("v"), planes))
    a_, c_ = b.alias("a"), b.alias("b")
    j = a_.join(
        c_,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    )
    dot = dot_q(F.col("a.v"), F.col("b.v"))
    na = norm_sq_q(F.col("a.v"))
    nb = norm_sq_q(F.col("b.v"))
    return (
        j.select(
            F.col(f"a.{id_col}").alias("vec_a"),
            F.col(f"b.{id_col}").alias("vec_b"),
            dot.alias("dot_q"),
            cosine_bps(dot, na, nb).alias("cos_bps"),
        )
        .filter(F.col("cos_bps") >= threshold_bps)
    )
