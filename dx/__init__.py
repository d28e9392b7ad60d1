"""dx — a from-scratch PySpark-native CDC / incremental-ingest engine.

Replaces the reference's (crabo/DataX, a fork of alibaba/DataX)
Reader->Channel->Writer plugin pipeline with a single DataFrame-based
binlog/WAL replay over an Iceberg-style lake table of source-code
repositories keyed by (repo, path).

Capability parity map: SURVEY.md §2 (the reference checkout at
/root/reference was empty at survey time; upstream paths cited there
are public-knowledge alibaba/DataX paths, marked †).

Modules
-------
session    SparkSession factory (AQE, Arrow, pinned confs)
generator  deterministic changelog + seed-table synthesis (FIXTURES.md)
transforms vectorized pandas/Arrow UDFs: normalization + sha256  [X7]
dedup      per-key max-LSN dedup (window + max_by strategies)    [X2]
skew       hot-key detection + salted repartition                [X6]
lake       LakeTable: snapshots, schema versions, ALTER, merge   [X3,X4]
manifest   commit manifest / watermarks / idempotent batch guard [X5]
engine     micro-batch replay loop + lineage/metrics emit        [X1,X8]
"""

__version__ = "0.1.0"
