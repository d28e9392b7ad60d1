"""Hot-repo detection + salted repartition (X6, BASELINE.json:6).

ABSENT in the reference (SURVEY.md §2.5 R4: a hot DataX table/range
simply runs long). Here: repos whose event share exceeds a threshold
get a synthetic salt ``pmod(hash(path), n_salts)`` so a pre-MERGE
``repartition(repo, __salt)`` spreads one hot repo over ``n_salts``
reducers. AQE skew-join (enabled in session.py) is the built-in
backstop for the MERGE join itself.

Detection uses a cheap partial-aggregated count (one tiny shuffle of
|repos| rows), not a scan-and-collect of data rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hot_repos(df: DataFrame, frac_threshold: float = 0.10, repo_col: str = "repo") -> list[str]:
    """Repos holding more than ``frac_threshold`` of the batch's rows.

    ONE action: the groupBy count is map-side combined (each shuffle
    moves |repos| rows, not data rows), and the batch total is a
    1-row aggregate over those same per-repo counts,
    broadcast-crossJoined back — NOT a single-partition window: at
    10^10 events the repo universe itself is millions of rows, and an
    empty-partition window would pull every one through a single task
    (ADVICE r4 #1). The narrow combined count runs twice (no
    ReuseExchange across the aggregate alias); two narrow passes beat
    one single-task funnel at any real repo cardinality.
    """
    counts = df.groupBy(repo_col).count()
    total = counts.agg(F.sum("count").alias("__total"))
    rows = (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("count") > frac_threshold * F.col("__total"))
        .collect()
    )
    return [r[repo_col] for r in rows]


def repo_key_stats(df: DataFrame, repo_col: str = "repo", path_col: str = "path",
                   approx: bool = True, rsd: float = 0.05) -> DataFrame:
    """Per-repo skew profile: event count + distinct-key count.

    ``approx=True`` uses ``approx_count_distinct`` (HyperLogLog++, one
    pass, O(1) state per repo) — at 10^10 events an exact distinct
    would shuffle every (repo, path) pair just to plan salting, while
    the HLL sketch rides the same map-side combine as the count. The
    interesting signal is ``events_per_key``: a repo with many events
    over FEW distinct paths is per-key hot (salting can't split one
    key; maxby partial-combine handles it), while many events over
    many paths is spread by the bucket hash for free.
    """
    distinct = (
        F.approx_count_distinct(path_col, rsd) if approx
        else F.countDistinct(path_col)
    )
    n = F.count("*")
    return df.groupBy(repo_col).agg(
        n.alias("n_events"),
        distinct.alias("n_keys"),
        F.floor(n * 100 / distinct).cast("long").alias("events_per_key_x100"),
    )


def with_salt(df: DataFrame, hot: list[str], n_salts: int = 16,
              repo_col: str = "repo", path_col: str = "path") -> DataFrame:
    """Add ``__salt``: 0 for cold repos, pmod(hash(path), n_salts) for hot."""
    if not hot:
        return df.withColumn("__salt", F.lit(0))
    return df.withColumn(
        "__salt",
        F.when(
            F.col(repo_col).isin(hot), F.pmod(F.hash(F.col(path_col)), F.lit(n_salts))
        ).otherwise(F.lit(0)),
    )


def salted_repartition(df: DataFrame, num_partitions: int | None = None,
                       frac_threshold: float = 0.10, n_salts: int = 16) -> DataFrame:
    """Salt hot repos, repartition by (repo, __salt), drop the salt.

    Used ahead of the MERGE shuffle so a Zipf-hot repo's rows land on
    ``n_salts`` partitions instead of one (T6).
    """
    hot = hot_repos(df, frac_threshold)
    salted = with_salt(df, hot, n_salts)
    parts = [F.col("repo"), F.col("__salt")]
    out = (
        salted.repartition(num_partitions, *parts)
        if num_partitions
        else salted.repartition(*parts)
    )
    return out.drop("__salt")
