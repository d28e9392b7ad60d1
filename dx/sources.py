"""Source readers: DataX reader-config parity on spark.read (§2.2-2.3).

DataX jobs declare sources as JSON plugin configs; this module maps
that surface onto declarative DataFrame scans so a DataX user can port
a job file ~mechanically. Covered capabilities (SURVEY.md rows):

- S2 file scan (†plugin-unstructured-storage-util): csv/text/parquet/
  orc/json with delimiter, encoding, header-skip, compression (Spark
  infers by extension), nullFormat.
- P1 column projection by index or name, P4 constant columns
  ({"type": t, "value": v}), P12 type coercion with C9 dirty-record
  semantics: `try_cast` — a malformed cell becomes NULL and is counted,
  never a failed job; rows failing any cast can be split to a
  quarantine frame (E1 errorLimit check is then a count assert).
- S1 JDBC scan config shape (table/column/where/querySql, splitPk →
  partitionColumn/lowerBound/upperBound/numPartitions). Building the
  reader is pure config mapping; no database exists in the sandbox, so
  `jdbc_reader_options` returns the option dict for inspection/tests
  and `read_jdbc` applies it verbatim.

At scale all of this stays inside Catalyst: projections prune the
scan, `where` pushes down, constants fold — nothing here adds a
shuffle or a UDF.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# DataX column type tag → Spark cast target (§1.1 type matrix)
TYPE_MAP = {
    "long": "long",
    "double": "double",
    "string": "string",
    "bool": "boolean",
    "boolean": "boolean",
    "date": "timestamp",
    "bytes": "binary",
}


@dataclass
class ColumnSpec:
    """One entry of a reader's `column` list.

    index OR name selects a source column; value injects a constant
    (P4); type casts (P12). `{"index": 0, "type": "long"}`,
    `{"name": "price", "type": "double"}`, `{"type": "string",
    "value": "dx"}` are all valid DataX shapes.
    """

    type: str = "string"
    index: int | None = None
    name: str | None = None
    value: object | None = None
    format: str | None = None  # date format for type=date
    alias: str | None = None

    def expr(self, source_cols: list[str]):
        t = TYPE_MAP.get(self.type, self.type)
        if self.value is not None:
            c = F.lit(self.value)
        elif self.name is not None:
            c = F.col(self.name)
        elif self.index is not None:
            c = F.col(source_cols[self.index])
        else:
            raise ValueError("column spec needs index, name, or value")
        if self.type == "date" and self.format:
            c = F.try_to_timestamp(c.cast("string"), F.lit(self.format))
        else:
            c = c.try_cast(t)  # P12 coercion, C9 dirty semantics
        out_name = self.alias or self.name or (
            f"c{self.index}" if self.index is not None else "const"
        )
        return c.alias(out_name)


@dataclass
class FileReaderConfig:
    """S2 file reader parameter block (txtfilereader/hdfsreader shape)."""

    path: str
    file_type: str = "csv"  # csv | text | parquet | orc | json
    field_delimiter: str = ","  # multi-char delimiters OK (Spark sep)
    encoding: str = "utf-8"
    skip_header: bool = False
    # DataX fidelity nit: DataX `skipHeader` only SKIPS the first line —
    # columns stay index-addressed. Spark's header=true additionally
    # adopts the header names (handy for name-addressed specs, and the
    # default here). Set use_header_names=False for strict DataX
    # semantics: the line is skipped and columns read as c0..cN.
    use_header_names: bool = True
    compress: str | None = None  # gzip/bzip2/...; None = infer by extension
    null_format: str | None = None
    columns: list[ColumnSpec] = field(default_factory=list)
    where: str | None = None  # P2: pushed-down predicate


def read_file(spark: SparkSession, cfg: FileReaderConfig) -> DataFrame:
    """Build the declarative scan for a file reader config."""
    ft = cfg.file_type.lower()
    if ft == "csv":
        opts = dict(
            sep=cfg.field_delimiter,
            encoding=cfg.encoding,
            header=str(cfg.skip_header).lower(),
            nullValue=cfg.null_format,
        )
        if cfg.compress:
            opts["compression"] = cfg.compress
        df = spark.read.options(**opts).csv(cfg.path)
        if cfg.skip_header and not cfg.use_header_names:
            # strict DataX skipHeader: skip the line, keep positional names
            df = df.toDF(*[f"c{i}" for i in range(len(df.columns))])
    elif ft == "text":
        df = spark.read.text(cfg.path)
    elif ft in ("parquet", "orc", "json"):
        df = getattr(spark.read, ft)(cfg.path)
    else:
        raise ValueError(f"unsupported file_type: {cfg.file_type}")
    if cfg.where:
        df = df.filter(cfg.where)  # Catalyst pushes to the scan
    if cfg.columns:
        df = df.select(*[c.expr(df.columns) for c in cfg.columns])
    return df


def dirty_pred(required: list[str]):
    """C9: the dirty-row predicate — any required column NULL after
    try_cast (coercion failure)."""
    pred = None
    for c in required:
        p = F.col(c).isNull()
        pred = p if pred is None else (pred | p)
    return pred


def dirty_split(df: DataFrame, required: list[str]) -> tuple[DataFrame, DataFrame]:
    """C9/E1: split rows whose required columns failed coercion (NULL
    after try_cast) into (clean, dirty). The error-limit check is then
    `dirty.count() <= limit` per batch — counting, never crashing."""
    pred = dirty_pred(required)
    dirty = df.filter(pred)
    clean = df.filter(~pred)
    return clean, dirty


def jdbc_reader_options(
    url: str,
    table: str | None = None,
    query_sql: str | None = None,
    columns: list[str] | None = None,
    where: str | None = None,
    split_pk: str | None = None,
    split_bounds: tuple[int, int] | None = None,
    num_partitions: int = 1,
    fetch_size: int = 2048,
) -> dict[str, str]:
    """S1/R1: CommonRdbmsReader config → spark.read.jdbc options.

    querySql overrides table+column+where (P3 pass-through); splitPk
    becomes partitionColumn range partitioning (R1) — Spark issues one
    WHERE-range query per partition, exactly DataX's task split.
    """
    opts: dict[str, str] = {"url": url, "fetchsize": str(fetch_size)}
    if query_sql:
        opts["query"] = query_sql
    else:
        sel = ", ".join(columns) if columns else "*"
        stmt = f"SELECT {sel} FROM {table}"
        if where:
            stmt += f" WHERE {where}"
        opts["query"] = stmt
    if split_pk and split_bounds:
        lo, hi = split_bounds
        # partitionColumn requires dbtable, not query
        opts.pop("query", None)
        opts.update(
            dbtable=table or "",
            partitionColumn=split_pk,
            lowerBound=str(lo),
            upperBound=str(hi),
            numPartitions=str(num_partitions),
        )
        if where:
            opts["dbtable"] = f"(SELECT * FROM {table} WHERE {where}) t"
    return opts


def read_jdbc(spark: SparkSession, **kw) -> DataFrame:
    """Apply jdbc_reader_options verbatim (needs a reachable database)."""
    return spark.read.format("jdbc").options(**jdbc_reader_options(**kw)).load()


def jdbc_writer_options(
    url: str,
    table: str,
    columns: list[str] | None = None,
    write_mode: str = "insert",
    batch_size: int = 2048,
) -> dict:
    """W1: CommonRdbmsWriter config → the Spark JDBC write plan.

    Returns ``{"mode": <df.write mode>, "options": {...},
    "upsert_sql": <str|None>}``:

    - ``insert`` → plain batched INSERT: ``df.write.format("jdbc")
      .options(**options).mode(mode).save()`` (Spark's writer issues
      executeBatch of ``batchsize`` rows per partition — exactly
      DataX's batchSize chunking, one connection per channel/task).
    - ``truncate`` → overwrite with ``truncate=true`` (TRUNCATE +
      INSERT, table not dropped — preserves grants/indexes, the DataX
      preSql-truncate idiom as a first-class mode).
    - ``replace`` / ``update`` → the returned ``upsert_sql`` is the
      per-row statement template (MySQL ``REPLACE INTO`` /
      ``INSERT ... ON DUPLICATE KEY UPDATE``, †writeMode semantics) to
      run via ``df.foreachPartition`` + executemany, because Spark's
      built-in JDBC writer only INSERTs. At lake scale the engine's
      MERGE (dx/lake.py, X3) IS the replace/update path — this
      template exists for porting small dimension-table jobs verbatim.

    Executed end-to-end (write + append + projected/filtered read +
    splitPk range scan) against embedded Apache Derby — the database
    every Spark distribution ships on its classpath — in
    tests/test_sources.py::test_jdbc_execution_when_database_available;
    DX_JDBC_URL points the same test at any external database.
    """
    opts = {
        "url": url,
        "dbtable": table,
        "batchsize": str(batch_size),
        "isolationLevel": "READ_COMMITTED",
    }
    cols = columns or []
    collist = ", ".join(cols)
    qs = ", ".join("?" for _ in cols)
    if write_mode == "insert":
        return {"mode": "append", "options": opts, "upsert_sql": None}
    if write_mode == "truncate":
        return {"mode": "overwrite", "options": {**opts, "truncate": "true"},
                "upsert_sql": None}
    if write_mode == "replace":
        sql = f"REPLACE INTO {table} ({collist}) VALUES ({qs})"
        return {"mode": "upsert", "options": opts, "upsert_sql": sql}
    if write_mode == "update":
        updates = ", ".join(f"{c} = VALUES({c})" for c in cols)
        sql = (f"INSERT INTO {table} ({collist}) VALUES ({qs}) "
               f"ON DUPLICATE KEY UPDATE {updates}")
        return {"mode": "upsert", "options": opts, "upsert_sql": sql}
    raise ValueError(f"unknown writeMode: {write_mode}")


def read_query_sql(spark: SparkSession, query_sql: str) -> DataFrame:
    """P3 querySql pass-through against the Spark catalog: a DataX job
    whose reader declares ``querySql`` runs that text as the plan. On a
    JDBC source the same string goes into the ``query`` option
    (jdbc_reader_options); against lake/warehouse tables it is
    ``spark.sql`` — either way the user's SQL is the source, verbatim."""
    return spark.sql(query_sql)
