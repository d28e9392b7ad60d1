"""Vectorized payload transforms — zero per-row Python (X7, BASELINE.json:15).

DataX analogue: the per-record transformer chain (†SURVEY.md §2.3
P5–P11, e.g. core/transport/transformer/*Transformer.java) executed
row-at-a-time between RecordSender and the channel. Here every
transform is either a JVM built-in column expression (whole-stage
codegen) or an Arrow-batched pandas UDF — never a row-at-a-time
Python UDF.

The sha256 content invariant is computed two independent ways and
cross-checked in tests (SURVEY.md §7.4 #3):
- engine hot path: built-in ``F.sha2(col, 256)`` (JVM, codegen'd);
- oracle-parity path: :func:`sha256_pandas` (hashlib inside an Arrow
  batch) — identical hex output over UTF-8 bytes.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def normalize_content_py(s: str | None) -> str | None:
    """Canonical content form shared by engine and pandas oracle:
    CRLF / CR → LF. Single source of truth for the sha256 invariant."""
    if s is None:
        return None
    return s.replace("\r\n", "\n").replace("\r", "\n")


def normalize_content_pandas_series(s: pd.Series) -> pd.Series:
    # vectorized pandas str ops over the Arrow batch — no per-row Python
    return s.str.replace("\r\n", "\n", regex=False).str.replace("\r", "\n", regex=False)


@F.pandas_udf(T.StringType())
def normalize_content_udf(s: pd.Series) -> pd.Series:
    return normalize_content_pandas_series(s)


def sha256_hex_py(s: str | None) -> str | None:
    if s is None:
        return None
    return hashlib.sha256(s.encode("utf-8")).hexdigest()


@F.pandas_udf(T.StringType())
def sha256_pandas(s: pd.Series) -> pd.Series:
    return s.map(sha256_hex_py)


def sha256_bin_py(s: str | None) -> bytes | None:
    if s is None:
        return None
    return hashlib.sha256(s.encode("utf-8")).digest()


@F.pandas_udf(T.BinaryType())
def sha256_bin_pandas(s: pd.Series) -> pd.Series:
    """Binary twin of sha256_pandas for the in-flight representation."""
    return s.map(sha256_bin_py)


def normalize_content(col: Column) -> Column:
    """JVM-side normalization, identical semantics to the pandas path.

    Built-ins are preferred in the hot path (SURVEY.md §4.1: stay
    inside whole-stage codegen); the pandas UDF exists for parity
    checks and for transforms with no built-in equivalent.

    One pass, one regex: ``\\r\\n?`` → ``\\n`` collapses both CRLF and
    lone CR, equivalent to the two chained replaces (left-to-right
    scan: a CR absorbs its following LF when present) but with ONE
    intermediate string per row instead of two — the normalize+sha
    expression is the hottest per-row allocation site in the replay
    write (GC dominates the 32-thread profile, BENCH/PROFILE.md).
    """
    return F.regexp_replace(col, "\r\n?", "\n")


def content_sha(col: Column) -> Column:
    """Per-row invariant: sha256 hex of the normalized content.

    This is the EDGE form (oracle compares, exports, user-facing
    queries). In-flight/stored sha is the 32-byte binary form below —
    half the bytes of the 64-char hex string on the hottest
    shuffle+write path, where GC pressure is the measured 8→32
    scaling limiter (BENCH/PROFILE.md)."""
    return F.sha2(normalize_content(col), 256)


def content_sha_bin(col: Column) -> Column:
    """32-byte binary sha256 of normalized content — the in-flight /
    stored representation (lake SYSTEM_COLUMNS). sha2 only emits hex,
    so unhex folds it back to the digest inside the same codegen
    stage; the transient hex never survives to the shuffle or the
    parquet encoder. Hex at the edges via sha_hex()."""
    return F.unhex(F.sha2(normalize_content(col), 256))


def sha_hex(col: Column) -> Column:
    """Export edge: stored binary digest → lowercase hex (the form
    DuckDB's sha256() and the reference invariant compare against;
    Spark's hex() is uppercase, hence the lower)."""
    return F.lower(F.hex(col))


# ---------------------------------------------------------------------------
# DataX transformer parity (SURVEY.md §2.3) — expression registry, the
# Spark-first replacement for TransformerRegistry († P11). Each returns a
# Column; composition happens in select/withColumn (fused by codegen).
# ---------------------------------------------------------------------------

def dx_substr(col: Column, start: int, length: int) -> Column:
    """†SubstrTransformer (P5): 0-based start in DataX → 1-based substring."""
    return F.substring(col, start + 1, length)


def dx_pad(col: Column, side: str, length: int, pad: str) -> Column:
    """†PadTransformer (P6)."""
    return F.lpad(col, length, pad) if side == "l" else F.rpad(col, length, pad)


def dx_replace(col: Column, start: int, length: int, replacement: str) -> Column:
    """†ReplaceTransformer (P7): splice replacement over [start, start+length)."""
    return F.concat(
        F.substring(col, 1, start),
        F.lit(replacement),
        col.substr(F.lit(start + length + 1), F.length(col)),
    )


def dx_digest(col: Column, algo: str = "sha256") -> Column:
    """†DigestTransformer (P10): md5/sha1/sha256 of a field."""
    if algo == "md5":
        return F.md5(col)
    if algo == "sha1":
        return F.sha1(col)
    return F.sha2(col, 256)


TRANSFORMS = {
    "dx_substr": dx_substr,
    "dx_pad": dx_pad,
    "dx_replace": dx_replace,
    "dx_digest": dx_digest,
    "normalize_content": normalize_content,
    "content_sha": content_sha,
    # Arrow-batched pandas UDF entries — the dx_groovy migration
    # target for transforms with no built-in equivalent (job.json:
    # {"name": "dx_registry", "parameter": {"fn": "sha256_pandas"}})
    "normalize_content_pandas": normalize_content_udf,
    "sha256_pandas": sha256_pandas,
}
