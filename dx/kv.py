"""S4 keyed/wide-column scan connector, EXECUTED (SURVEY.md §2.2 S4).

DataX's KV-family readers — †hbase11xreader (rowkey-range split),
†otsreader (primary-key-range split), †mongodbreader (_id-range split
+ verbatim query filter), †cassandrareader — all share one shape:
split the key space into ranges, open one connection per task, scan
each range with projection and an optional store-side filter. Spark
has no built-in source for an arbitrary keyed store, so this is the
documented custom-operator path (b): per-partition imperative scans
behind ``mapInPandas``, Arrow-batched, with the range split computed
from the store itself.

The live store here is sqlite3 — in the Python standard library, so
the connector EXECUTES end-to-end in any environment (the same move
that gave S1 a live database via Spark's bundled Derby). The
connector shape is store-agnostic: quantile splits, schema mapping,
range predicates, projection and verbatim-filter pushdown are the
reusable structure; the sqlite3 connect/catalog/scan calls are the
thin layer a production deployment swaps for an HBase/OTS/Mongo
client.

Scale notes (the parts that must survive 1000 executors):
- Splits are EXACT quantiles of the key column (one ORDER BY/OFFSET
  probe per boundary on the driver), not lexicographic midpoints —
  skewed key spaces still yield balanced tasks, the same reason
  DataX's hbase reader lets users override auto-split boundaries.
- Each task scans ONLY its [lo, hi) range with an indexed predicate
  (the key is the store's primary key) and streams fetchmany batches
  into Arrow — no full-table read anywhere, no driver collect.
- Projection and the verbatim ``where`` filter are pushed into the
  store's SQL/scan API, so bytes that don't survive the filter never
  cross the wire.
"""

from __future__ import annotations

import sqlite3
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# sqlite declared type → (Spark type, pandas dtype for null-safe batches)
_TYPES = {
    "INTEGER": (T.LongType(), "Int64"),
    "BIGINT": (T.LongType(), "Int64"),
    "TEXT": (T.StringType(), None),
    "VARCHAR": (T.StringType(), None),
    "REAL": (T.DoubleType(), "float64"),
    "DOUBLE": (T.DoubleType(), "float64"),
    "BLOB": (T.BinaryType(), None),
}


def _columns(db_path: str, table: str) -> dict[str, str]:
    """Declared column types from the store's schema catalog."""
    with sqlite3.connect(f"file:{db_path}?mode=ro", uri=True) as conn:
        info = conn.execute(f"PRAGMA table_info({table})").fetchall()
    if not info:
        raise ValueError(f"kv table not found: {table}")
    return {row[1]: (row[2] or "TEXT").upper() for row in info}


def kv_splits(
    db_path: str,
    table: str,
    key_col: str,
    n_splits: int,
    key_range: tuple | None = None,
) -> list[tuple]:
    """Exact-quantile key-range boundaries: [lo, hi) per split, hi=None
    for the last (†hbase11xreader auto-split; quantiles instead of
    lexicographic midpoints so skewed keys still balance)."""
    lo_bound, hi_bound = key_range or (None, None)
    pred, args = "", []
    if lo_bound is not None:
        pred, args = f" WHERE {key_col} >= ?", [lo_bound]
    if hi_bound is not None:
        pred += (" AND" if pred else " WHERE") + f" {key_col} < ?"
        args.append(hi_bound)
    with sqlite3.connect(f"file:{db_path}?mode=ro", uri=True) as conn:
        n_rows = conn.execute(
            f"SELECT count(*) FROM {table}{pred}", args
        ).fetchone()[0]
        bounds = [lo_bound]
        for i in range(1, max(1, n_splits)):
            off = (n_rows * i) // n_splits
            row = conn.execute(
                f"SELECT {key_col} FROM {table}{pred} "
                f"ORDER BY {key_col} LIMIT 1 OFFSET ?",
                args + [off],
            ).fetchone()
            if row is not None and row[0] != bounds[-1]:
                bounds.append(row[0])  # dedupe: repeated keys merge splits
    bounds.append(hi_bound)
    return [(bounds[i], bounds[i + 1]) for i in range(len(bounds) - 1)]


def read_kv(
    spark: SparkSession,
    db_path: str,
    table: str = "kv",
    key_col: str = "k",
    columns: list[str] | None = None,
    where: str | None = None,
    key_range: tuple | None = None,
    n_splits: int = 8,
    batch_rows: int = 4096,
) -> DataFrame:
    """Partition-parallel keyed range scan (S4): one task per key
    range, each opening its own store connection and streaming
    Arrow-sized batches. ``columns`` projects store-side; ``where`` is
    interpolated VERBATIM into the scan (DataX †mongodbreader query /
    †hbase11xreader filter semantics — the user speaks the store's
    filter dialect); ``key_range`` bounds the whole scan [lo, hi)."""
    decl = _columns(db_path, table)
    cols = columns or list(decl)
    missing = [c for c in cols if c not in decl]
    if missing:
        raise ValueError(f"unknown kv columns: {missing}")
    fields, dtypes = [], {}
    for c in cols:
        spark_t, pd_t = _TYPES.get(decl[c], (T.StringType(), None))
        fields.append(T.StructField(c, spark_t, True))
        if pd_t:
            dtypes[c] = pd_t
    schema = T.StructType(fields)

    splits = kv_splits(db_path, table, key_col, n_splits, key_range)
    sel = ", ".join(cols)

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        conn = sqlite3.connect(f"file:{db_path}?mode=ro", uri=True)
        try:
            for ranges in batches:
                for lo, hi in zip(ranges["lo"], ranges["hi"]):
                    pred, args = [], []
                    if not pd.isna(lo):
                        pred.append(f"{key_col} >= ?")
                        args.append(lo.item() if hasattr(lo, "item") else lo)
                    if not pd.isna(hi):
                        pred.append(f"{key_col} < ?")
                        args.append(hi.item() if hasattr(hi, "item") else hi)
                    if where:
                        pred.append(f"({where})")
                    stmt = f"SELECT {sel} FROM {table}"
                    if pred:
                        stmt += " WHERE " + " AND ".join(pred)
                    cur = conn.execute(stmt, args)
                    while True:
                        rows = cur.fetchmany(batch_rows)
                        if not rows:
                            break
                        pdf = pd.DataFrame.from_records(rows, columns=cols)
                        yield pdf.astype(dtypes) if dtypes else pdf
        finally:
            conn.close()

    # one range per task: a two-column ranges frame, range-partitioned
    # on lo so each split lands in its own partition
    lo_t = next(
        (f.dataType for f in fields if f.name == key_col), T.LongType()
    )
    ranges_schema = T.StructType(
        [T.StructField("lo", lo_t, True), T.StructField("hi", lo_t, True)]
    )
    ranges_df = spark.createDataFrame(splits, ranges_schema)
    if len(splits) > 1:
        ranges_df = ranges_df.repartitionByRange(len(splits), F.col("lo"))
    return ranges_df.mapInPandas(scan, schema)


def read_kv_versions(
    spark: SparkSession,
    db_path: str,
    table: str,
    key_col: str,
    version_col: str,
    columns: list[str],
    max_versions: int = 1,
    key_range: tuple | None = None,
    n_splits: int = 8,
    batch_rows: int = 4096,
) -> DataFrame:
    """†hbase11xreader ``multiVersionFixedColumn`` mode: the newest
    ``max_versions`` versions of each key's fixed columns, emitted as
    TALL rows ``(key, cell, version, value)`` — one row per surviving
    (key, column, version) cell, values stringified, exactly the
    4-tuple shape DataX emits for versioned HBase cells. The
    latest-N cut runs INSIDE the store (a windowed scan over only the
    task's key range), so superseded versions never reach Spark.
    ``version_col`` must be unique per key (HBase cell timestamps);
    ties would make the cut order-dependent in any engine."""
    decl = _columns(db_path, table)
    missing = [c for c in [key_col, version_col, *columns] if c not in decl]
    if missing:
        raise ValueError(f"unknown kv columns: {missing}")
    key_t, key_pd = _TYPES.get(decl[key_col], (T.StringType(), None))
    ver_t, ver_pd = _TYPES.get(decl[version_col], (T.LongType(), "Int64"))
    schema = T.StructType(
        [
            T.StructField(key_col, key_t, True),
            T.StructField("cell", T.StringType(), True),
            T.StructField("version", ver_t, True),
            T.StructField("value", T.StringType(), True),
        ]
    )
    splits = kv_splits(db_path, table, key_col, n_splits, key_range)
    sel = ", ".join([key_col, version_col, *columns])

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        conn = sqlite3.connect(f"file:{db_path}?mode=ro", uri=True)
        try:
            for ranges in batches:
                for lo, hi in zip(ranges["lo"], ranges["hi"]):
                    pred, args = [], []
                    if not pd.isna(lo):
                        pred.append(f"{key_col} >= ?")
                        args.append(lo.item() if hasattr(lo, "item") else lo)
                    if not pd.isna(hi):
                        pred.append(f"{key_col} < ?")
                        args.append(hi.item() if hasattr(hi, "item") else hi)
                    inner = f"SELECT {sel}, row_number() OVER (PARTITION BY " \
                            f"{key_col} ORDER BY {version_col} DESC) AS _rn " \
                            f"FROM {table}"
                    if pred:
                        inner += " WHERE " + " AND ".join(pred)
                    cur = conn.execute(
                        f"SELECT {sel} FROM ({inner}) WHERE _rn <= ?",
                        args + [max_versions],
                    )
                    while True:
                        rows = cur.fetchmany(batch_rows)
                        if not rows:
                            break
                        wide = pd.DataFrame.from_records(
                            rows, columns=[key_col, version_col, *columns]
                        )
                        tall = wide.melt(
                            id_vars=[key_col, version_col],
                            value_vars=columns,
                            var_name="cell",
                            value_name="value",
                        ).rename(columns={version_col: "version"})
                        tall["value"] = tall["value"].map(
                            lambda v: None if pd.isna(v) else str(v)
                        )
                        if key_pd:
                            tall[key_col] = tall[key_col].astype(key_pd)
                        if ver_pd:
                            tall["version"] = tall["version"].astype(ver_pd)
                        yield tall
        finally:
            conn.close()

    ranges_schema = T.StructType(
        [T.StructField("lo", key_t, True), T.StructField("hi", key_t, True)]
    )
    ranges_df = spark.createDataFrame(splits, ranges_schema)
    if len(splits) > 1:
        ranges_df = ranges_df.repartitionByRange(len(splits), F.col("lo"))
    return ranges_df.mapInPandas(scan, schema)


def stage_kv(
    db_path: str,
    table: str,
    pdf: pd.DataFrame,
    key_col: str | tuple | None,
) -> None:
    """Stage a pandas frame as a keyed store table — test/fixture
    scale only; production scans an EXISTING store. ``key_col`` is the
    PRIMARY KEY: a single column, a tuple for composite keys
    (versioned tables key on (key, version)), or None for no key.
    Replaces the table if present."""

    def decl(col: str) -> str:
        kind = str(pdf[col].dtype).lower()
        if "int" in kind:
            return "INTEGER"
        if "float" in kind:
            return "REAL"
        head = pdf[col].dropna()
        if len(head) and isinstance(head.iloc[0], (bytes, bytearray)):
            return "BLOB"
        return "TEXT"

    with sqlite3.connect(db_path) as conn:
        conn.execute(f"DROP TABLE IF EXISTS {table}")
        col_sql = [
            f"{c} {decl(c)}"
            f"{' PRIMARY KEY' if isinstance(key_col, str) and c == key_col else ''}"
            for c in pdf.columns
        ]
        if isinstance(key_col, tuple):
            col_sql.append(f"PRIMARY KEY ({', '.join(key_col)})")
        conn.execute(f"CREATE TABLE {table} ({', '.join(col_sql)})")
        conn.executemany(
            f"INSERT INTO {table} VALUES ({', '.join('?' * len(pdf.columns))})",
            pdf.itertuples(index=False, name=None),
        )
        conn.commit()
