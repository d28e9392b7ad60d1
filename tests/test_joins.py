"""Temporal join operators (dx/joins.py) + approx skew sketch: small
planted fixtures checked against brute-force semantics (the driver's
DuckDB oracle covers them at data scale — rel_asof_join /
rel_interval_join / cdc_skew_approx)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dx.joins import asof_join, interval_join


def test_asof_join_backward(spark):
    build = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (2, 15, "c")], "k long, lsn long, v string"
    )
    probe = spark.createDataFrame(
        [(1, 12), (1, 20), (1, 5), (2, 99), (3, 7)], "k long, probe long"
    )
    out = {
        (r["k"], r["probe"]): r["v"]
        for r in asof_join(
            probe, build, on=["k"], left_on="probe", right_on="lsn"
        ).collect()
    }
    assert out[(1, 12)] == "a"      # latest ≤ 12
    assert out[(1, 20)] == "b"      # inclusive: equal ordinate matches
    assert out[(1, 5)] is None      # nothing at-or-before → left semantics
    assert out[(2, 99)] == "c"
    assert out[(3, 7)] is None      # key absent from build

    excl = {
        (r["k"], r["probe"]): r["v"]
        for r in asof_join(
            probe, build, on=["k"], left_on="probe", right_on="lsn",
            inclusive=False,
        ).collect()
    }
    assert excl[(1, 20)] == "a"     # strict <: the lsn=20 row is excluded


def test_interval_join_matches_bruteforce(spark):
    points = spark.range(0, 200).select(
        F.col("id").alias("pid"), (F.col("id") * 3.7 % 100).alias("x")
    )
    intervals = spark.createDataFrame(
        [(0, 5.0, 12.0), (1, 10.0, 45.0), (2, 40.0, 41.0), (3, 90.0, 130.0)],
        "iid long, lo double, hi double",
    )
    got = {
        (r["pid"], r["iid"])
        for r in interval_join(
            points, intervals, "x", "lo", "hi", bin_size=10.0
        ).collect()
    }
    want = {
        (r["pid"], r["iid"])
        for r in points.crossJoin(intervals)
        .filter((F.col("x") >= F.col("lo")) & (F.col("x") < F.col("hi")))
        .collect()
    }
    assert got == want and got


def test_repo_key_stats_approx_bound(spark):
    from dx import skew

    df = spark.range(0, 5000).select(
        (F.col("id") % 3).cast("string").alias("repo"),
        (F.col("id") % 700).cast("string").alias("path"),
    )
    approx = {r["repo"]: r for r in skew.repo_key_stats(df, rsd=0.05).collect()}
    exact = {r["repo"]: r for r in
             skew.repo_key_stats(df, approx=False).collect()}
    for repo, e in exact.items():
        a = approx[repo]
        assert a["n_events"] == e["n_events"]            # count is exact
        rel = abs(a["n_keys"] - e["n_keys"]) / e["n_keys"]
        assert rel < 0.15, f"HLL estimate off by {rel:.2%}"


def test_asof_join_property_vs_bruteforce(spark):
    """Quantified check: for random key/ordinate sets, the union-window
    as-of join equals the brute-force definition (max build ordinate
    at-or-before each probe), including unmatched probes."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(max_examples=5, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(
        builds=st.lists(
            st.tuples(st.integers(0, 3), st.integers(0, 50)),
            min_size=1, max_size=25, unique=True,  # unique (key, ord)
        ),
        probes=st.lists(
            st.tuples(st.integers(0, 4), st.integers(0, 55)),
            min_size=1, max_size=25,
        ),
    )
    def check(builds, probes):
        bdf = spark.createDataFrame(
            [(k, o, f"v{k}:{o}") for k, o in builds], "k long, lsn long, v string"
        )
        pdf = spark.createDataFrame(
            [(i, k, o) for i, (k, o) in enumerate(probes)],
            "pid long, k long, probe long",
        )
        got = {
            r["pid"]: r["v"]
            for r in asof_join(pdf, bdf, on=["k"], left_on="probe",
                               right_on="lsn").collect()
        }
        for i, (k, o) in enumerate(probes):
            cands = [(bo, f"v{bk}:{bo}") for bk, bo in builds
                     if bk == k and bo <= o]
            want = max(cands)[1] if cands else None
            assert got[i] == want, (i, k, o, got[i], want)

    check()


def test_asof_join_null_value_columns_atomic(spark):
    """A build row whose value column is legitimately NULL must win AS A
    WHOLE: every value column comes from the same (latest) build row,
    NULL fields included — not per-column last(ignorenulls) mixing
    columns from different build rows (ADVICE r2, dx/joins.py)."""
    build = spark.createDataFrame(
        [(1, 10, "a", 5), (1, 20, None, 7)],
        "k long, lsn long, v string, x long",
    )
    probe = spark.createDataFrame([(1, 25), (1, 15)], "k long, probe long")
    out = {
        r["probe"]: (r["v"], r["x"])
        for r in asof_join(
            probe, build, on=["k"], left_on="probe", right_on="lsn"
        ).collect()
    }
    # probe 25: latest build row is (lsn=20, v=NULL, x=7) — v stays NULL
    assert out[25] == (None, 7)
    # probe 15: latest is (lsn=10, v='a', x=5), untouched by the fix
    assert out[15] == ("a", 5)
