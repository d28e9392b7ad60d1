"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with
a metadata struct; decode / feature-extract steps are Arrow-batched
``mapInPandas`` stages. The decoder routes through PIL when it is
importable (``HAS_PIL``): real image bytes yield real
format/width/height. This sandbox container does not ship PIL, so
payloads that PIL can't open — and every payload when PIL is absent —
fall back to the clearly-marked deterministic fake (`_fake_decode`)
behind the same signature, keeping the Spark-side plumbing (schema,
batch shape, partitioning) real and tested in both environments.

At scale: binary payloads never enter a shuffle — the decode stage is
a narrow map over the scan, and downstream ops keep only extracted
features (width/height/fingerprint), dropping the blob before any
wide transform.
"""

from __future__ import annotations

import hashlib
import io
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # optional real codec — absent in this sandbox
    from PIL import Image as _PILImage

    HAS_PIL = True
except ImportError:
    _PILImage = None
    HAS_PIL = False

DECODED_SCHEMA = (
    "doc_id long, payload_len int, format string, width int, height int, "
    "feature_sha string, feature_md5 string"
)


def with_fake_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach a deterministic binary payload column (stand-in for real
    image bytes): unhex(md5(text)) — 16 opaque bytes per row."""
    return df.withColumn("payload", F.unhex(F.md5(F.col(text_col))))


def _fake_decode(payload: bytes) -> tuple[str, int, int]:
    """STUB decoder: deterministic pseudo-metadata from the payload
    bytes, so the plumbing is testable without image libraries. Used
    for every payload when PIL is absent, and as the fallback for
    bytes PIL can't open when it is present (see _decode)."""
    h = int.from_bytes(payload[:4], "big")
    return ("png" if h % 2 == 0 else "jpeg", h % 640 + 1, (h >> 8) % 480 + 1)


def _decode(payload: bytes) -> tuple[str, int, int]:
    """Real codec when available: PIL open on the bytes → (format,
    width, height), lowercase format for a stable cross-codec
    vocabulary. Non-image bytes (this repo's deterministic fake
    payloads included) fall back to _fake_decode in BOTH environments,
    so fixture outputs are identical with and without PIL installed."""
    if HAS_PIL:
        try:
            with _PILImage.open(io.BytesIO(payload)) as img:
                return ((img.format or "unknown").lower(),
                        int(img.width), int(img.height))
        except Exception:
            pass
    return _fake_decode(payload)


def decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas stage: binary payload → typed metadata + feature sha.

    Vectorized per Arrow batch; per-element work is the decoder call
    (unavoidable for codec libraries) — everything else stays columnar.
    """
    for pdf in batches:
        meta = [_decode(p) for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "payload_len": pdf["payload"].str.len().astype("int32"),
                "format": [m[0] for m in meta],
                "width": pd.Series([m[1] for m in meta], dtype="int32"),
                "height": pd.Series([m[2] for m in meta], dtype="int32"),
                "feature_sha": [
                    hashlib.sha256(p).hexdigest() for p in pdf["payload"]
                ],
                # md5 over the lowercase-hex form of the bytes: the
                # oracle-able fingerprint (DuckDB's md5 is VARCHAR-only,
                # and hex(payload) == the md5-hex the payload was minted
                # from, so SQL reproduces this as md5(md5(text))).
                "feature_md5": [
                    hashlib.md5(p.hex().encode()).hexdigest()
                    for p in pdf["payload"]
                ],
            }
        )


def decode_documents(df: DataFrame) -> DataFrame:
    """Full multimodal plumbing: attach payload → decode via Arrow
    batches → typed metadata frame (blob dropped before any shuffle)."""
    return (
        with_fake_payload(df)
        .select("doc_id", "payload")
        .mapInPandas(decode_batch, schema=DECODED_SCHEMA)
    )
