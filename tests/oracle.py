"""Naive single-threaded pandas replay oracle (SURVEY.md §5.2 T2).

Replays the changelog strictly in LSN order into a dict — the
slowest, most obviously-correct implementation of the CDC semantics.
The engine's distributed replay must match it bit-for-bit on the
per-row sha256(content) invariant and on every materialized column
(including evolved columns with drop/re-add field-id semantics).

Shares normalization/hash code with the engine via dx.transforms
(single source of truth — SURVEY.md §7.4 #3).
"""

from __future__ import annotations

import hashlib

import pandas as pd

from dx.transforms import normalize_content_py, sha256_bin_py


def _cast(value: str | None, col_type: str):
    if value is None:
        return None
    if col_type == "long":
        try:
            return int(value)
        except ValueError:
            return None
    return value


def replay(seed_df: pd.DataFrame, changelog: pd.DataFrame) -> pd.DataFrame:
    """Full ordered replay → final table state as a pandas DataFrame.

    Columns: repo, path, commit, lang, content (normalized), evolved
    columns by (name, field-id) semantics, _content_sha, _lsn.
    """
    state: dict[tuple[str, str], dict] = {}
    for r in seed_df.itertuples(index=False):
        content = normalize_content_py(r.content)
        state[(r.repo, r.path)] = {
            "commit": r.commit,
            "lang": r.lang,
            "content": content,
            "_lsn": 0,
            "vals": {},  # fid -> value
        }

    next_fid = 6  # base columns hold fids 1-5 (lake.py BASE_COLUMNS)
    active: list[tuple[str, int, str]] = []  # (name, fid, type)

    for ev in changelog.sort_values("lsn").itertuples(index=False):
        if ev.op == "DDL":
            if ev.ddl_action == "add_column":
                active.append((ev.ddl_column, next_fid, ev.ddl_type or "string"))
                next_fid += 1
            elif ev.ddl_action == "drop_column":
                active = [a for a in active if a[0] != ev.ddl_column]
            continue
        key = (ev.repo, ev.path)
        if ev.op == "D":
            state.pop(key, None)
            continue
        extra = ev.extra or {}
        state[key] = {
            "commit": ev.commit,
            "lang": ev.lang,
            "content": normalize_content_py(ev.content),
            "_lsn": int(ev.lsn),
            "vals": {fid: _cast(extra.get(name), ty) for name, fid, ty in active},
        }

    rows = []
    for (repo, path), st in state.items():
        row = {
            "repo": repo,
            "path": path,
            "commit": st["commit"],
            "lang": st["lang"],
            "content": st["content"],
        }
        for name, fid, _ty in active:
            row[name] = st["vals"].get(fid)
        row["_content_sha"] = sha256_bin_py(st["content"])
        row["_lsn"] = st["_lsn"]
        rows.append(row)
    cols = ["repo", "path", "commit", "lang", "content"] + [a[0] for a in active] + [
        "_content_sha", "_lsn",
    ]
    out = pd.DataFrame(rows, columns=cols)
    return out.sort_values(["repo", "path"]).reset_index(drop=True)


def state_hash(df: pd.DataFrame) -> str:
    """Order-insensitive hash of a final-state frame (column-name-sorted,
    row-sorted canonical TSV → sha256)."""
    d = df.copy()
    d = d[sorted(d.columns)]
    d = d.sort_values(list(d.columns)).reset_index(drop=True)
    payload = d.to_csv(sep="\t", index=False, na_rep="\\N")
    return hashlib.sha256(payload.encode("utf-8")).hexdigest()


def spark_state_to_pandas(df) -> pd.DataFrame:
    """Collect a Spark final-state frame into oracle-comparable pandas."""
    pdf = df.toPandas()
    if "_content_sha" in pdf.columns:
        # binary column: the non-Arrow collect path yields bytearray —
        # normalize to bytes so comparisons/state_hash match the
        # oracle's hashlib digests exactly.
        pdf["_content_sha"] = pdf["_content_sha"].map(
            lambda v: bytes(v) if isinstance(v, (bytearray, memoryview)) else v
        )
    return pdf.sort_values(["repo", "path"]).reset_index(drop=True)
