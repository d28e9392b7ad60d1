"""Deterministic changelog + seed-table synthesis (FIXTURES.md F1/F2).

DataX analogue: the `streamreader` synthetic source (†SURVEY.md §2.2
S3) — rows generated from column specs. Here generation is seeded and
invariant-preserving so a naive single-threaded replay oracle is
well-defined (FIXTURES.md F2 invariants):

- an I for a key either creates it or follows its D (re-insert);
- U/D only target keys alive at that LSN;
- after `add_column c`, subsequent I/U events carry a value for c in
  the ``extra`` map; after `drop_column c` they do not;
- LSNs are unique and dense from 1.

Two generators:
- :func:`gen_seed_table` / :func:`gen_changelog` — pandas, exact
  invariants, used by tests (≤ ~1M events).
- :func:`gen_changelog_spark` — distributed via ``spark.range`` +
  ``mapInPandas`` for bench scale; LSNs unique + per-key monotone by
  construction (lsn = version * n_keys + key_idx), no driver-side
  materialization, O(1) state per row — this is the path that scales
  to 10^10 events on a real cluster.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import numpy as np
import pandas as pd

EXTS = ["py", "java", "scala", "rs", "go", "md"]
LANG_OF = {"py": "python", "java": "java", "scala": "scala", "rs": "rust", "go": "go", "md": "markdown"}
DIRS = ["core", "util", "io", "net", "api", "db", "fmt", "sys"]
NAMES = ["main", "lib", "mod", "engine", "parser", "codec", "index", "store", "plan", "exec"]

CHANGELOG_COLUMNS = [
    "lsn", "batch_seq", "source_partition", "op", "repo", "path",
    "commit", "lang", "content", "extra", "ddl_action", "ddl_column",
    "ddl_type", "event_ts",
]

CHANGELOG_DDL = (
    "lsn long, batch_seq long, source_partition int, op string, "
    "repo string, path string, commit string, lang string, content string, "
    "extra map<string,string>, ddl_action string, ddl_column string, "
    "ddl_type string, event_ts timestamp"
)

_EPOCH = pd.Timestamp("2020-01-01", tz="UTC")


def _commit_sha(repo: str, path: str, version: int) -> str:
    return hashlib.sha1(f"{repo}:{path}:{version}".encode()).hexdigest()


def make_content(repo: str, path: str, version: int, seed: int = 42) -> str:
    """Deterministic pseudo-code content, 200–4000 chars.

    Includes ``\\r\\n`` / ``\\r`` line endings, unicode, and (rarely)
    empty string, so the normalization pandas UDF (transforms.py) and
    the sha256 invariant are exercised on real edge cases.
    """
    h = int(hashlib.md5(f"{seed}:{repo}:{path}:{version}".encode()).hexdigest(), 16)
    if h % 97 == 0:
        return ""
    n_lines = 5 + h % 60
    sep = "\n"
    if h % 11 == 0:
        sep = "\r\n"
    elif h % 13 == 0:
        sep = "\r"
    lines = []
    for k in range(n_lines):
        hk = (h >> (k % 48)) & 0xFFFFFFFF
        lines.append(f"def fn_{hk:08x}(x_{k}):  # v{version} {'λ' if hk % 7 == 0 else ''}")
        lines.append(f"    return x_{k} * {hk % 1000} + {version}")
    return sep.join(lines)


def _paths(n: int, rng: np.random.Generator) -> list[str]:
    out, seen = [], set()
    while len(out) < n:
        depth = int(rng.integers(1, 4))
        parts = [DIRS[int(rng.integers(0, len(DIRS)))] for _ in range(depth)]
        name = NAMES[int(rng.integers(0, len(NAMES)))]
        ext = EXTS[int(rng.integers(0, len(EXTS)))]
        p = "src/" + "/".join(parts) + f"/{name}_{len(out)}.{ext}"
        if p not in seen:
            seen.add(p)
            out.append(p)
    return out


def gen_seed_table(n_repos: int = 3, paths_per_repo: int = 50, seed: int = 42) -> pd.DataFrame:
    """F1 `source_code` seed state; primary key (repo, path)."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n_repos):
        repo = f"org{i // 4}/repo{i % 4}_{i}"
        for path in _paths(paths_per_repo, rng):
            ext = path.rsplit(".", 1)[-1]
            rows.append(
                {
                    "repo": repo,
                    "path": path,
                    "commit": _commit_sha(repo, path, 0),
                    "lang": LANG_OF[ext],
                    "content": make_content(repo, path, 0, seed),
                }
            )
    return pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])


@dataclass
class DDLSpec:
    """DDL event injected at a fixed fraction of the stream."""

    at_frac: float
    action: str  # add_column | drop_column
    column: str
    type: str = "string"


@dataclass
class _KeyState:
    version: int = 0
    alive: bool = True


def gen_changelog(
    seed_df: pd.DataFrame,
    n_events: int = 10_000,
    seed: int = 42,
    zipf_s: float = 1.2,
    n_source_partitions: int = 8,
    batch_size: int = 1_000,
    p_ops: tuple[float, float, float] = (0.30, 0.55, 0.15),  # I, U, D among data events
    ddl_specs: list[DDLSpec] | None = None,
    p_new_key: float = 0.5,
) -> pd.DataFrame:
    """F2 changelog over the seed table's key space, invariants per FIXTURES.md.

    Repo popularity follows Zipf(zipf_s) for skew scenarios (T6).
    """
    ddl_specs = ddl_specs or []
    rng = np.random.default_rng(seed + 1)
    repos = seed_df["repo"].unique().tolist()
    repo_w = 1.0 / np.arange(1, len(repos) + 1) ** zipf_s
    repo_w = repo_w / repo_w.sum()
    by_repo: dict[str, list[str]] = {
        r: seed_df.loc[seed_df.repo == r, "path"].tolist() for r in repos
    }
    state: dict[tuple[str, str], _KeyState] = {
        (r.repo, r.path): _KeyState(version=0, alive=True) for r in seed_df.itertuples()
    }
    fresh_counter = 0

    ddl_at = sorted(((max(1, int(s.at_frac * n_events)), s) for s in ddl_specs), key=lambda t: t[0])
    active_cols: list[tuple[str, str]] = []  # (name, type)

    rows = []
    p_i, p_u, p_d = p_ops
    for lsn in range(1, n_events + 1):
        if ddl_at and lsn == ddl_at[0][0]:
            spec = ddl_at.pop(0)[1]
            if spec.action == "add_column" and all(n != spec.column for n, _ in active_cols):
                active_cols.append((spec.column, spec.type))
            elif spec.action == "drop_column":
                active_cols = [(n, t) for n, t in active_cols if n != spec.column]
            rows.append(
                (lsn, (lsn - 1) // batch_size, int(rng.integers(0, n_source_partitions)),
                 "DDL", None, None, None, None, None, None,
                 spec.action, spec.column, spec.type, _EPOCH + pd.Timedelta(seconds=lsn))
            )
            continue

        u = rng.random()
        op = "I" if u < p_i else ("U" if u < p_i + p_u else "D")
        live = [k for k, st in state.items() if st.alive]
        dead = [k for k, st in state.items() if not st.alive]
        if op in ("U", "D") and not live:
            op = "I"
        if op == "I":
            if dead and rng.random() > p_new_key:
                key = dead[int(rng.integers(0, len(dead)))]  # re-insert after D
            else:
                ri = int(rng.choice(len(repos), p=repo_w))
                repo = repos[ri]
                fresh_counter += 1
                ext = EXTS[fresh_counter % len(EXTS)]
                path = f"src/new/gen_{fresh_counter}.{ext}"
                by_repo[repo].append(path)
                key = (repo, path)
                state.setdefault(key, _KeyState(version=0, alive=False))
            st = state[key]
            if st.alive:  # I on a live key — treat as upsert-I only on dead/new keys
                op = "U"
        else:
            # zipf-weighted repo choice, then a live path within it
            for _ in range(8):
                ri = int(rng.choice(len(repos), p=repo_w))
                repo = repos[ri]
                cand = [k for k in live if k[0] == repo]
                if cand:
                    key = cand[int(rng.integers(0, len(cand)))]
                    break
            else:
                key = live[int(rng.integers(0, len(live)))]
            st = state[key]

        st = state[key]
        if op == "D":
            st.alive = False
            rows.append(
                (lsn, (lsn - 1) // batch_size, int(rng.integers(0, n_source_partitions)),
                 "D", key[0], key[1], None, None, None, None, None, None, None,
                 _EPOCH + pd.Timedelta(seconds=lsn))
            )
        else:  # I or U — full-row image
            st.version += 1
            st.alive = True
            ext = key[1].rsplit(".", 1)[-1]
            extra = {
                c: (str(lsn) if t == "long" else f"{c}_val_{lsn}") for c, t in active_cols
            } or None
            rows.append(
                (lsn, (lsn - 1) // batch_size, int(rng.integers(0, n_source_partitions)),
                 op, key[0], key[1], _commit_sha(key[0], key[1], st.version),
                 LANG_OF.get(ext, "text"), make_content(key[0], key[1], st.version, seed),
                 extra, None, None, None, _EPOCH + pd.Timedelta(seconds=lsn))
            )
    return pd.DataFrame(rows, columns=CHANGELOG_COLUMNS)


def permute_delivery(changelog: pd.DataFrame, seed: int = 7, window_batches: int = 2) -> pd.DataFrame:
    """T4 out-of-order: permute delivery order within ±window batches.

    The LSN values are untouched — only the physical row order (and
    batch_seq) changes, modeling late/reordered binlog shipping.
    """
    rng = np.random.default_rng(seed)
    jitter = rng.integers(-window_batches, window_batches + 1, size=len(changelog))
    out = changelog.copy()
    out["batch_seq"] = np.maximum(0, out["batch_seq"].to_numpy() + jitter)
    out = out.sample(frac=1.0, random_state=seed).sort_values("batch_seq", kind="stable")
    return out.reset_index(drop=True)


def gen_changelog_spark(
    spark,
    n_keys: int = 100_000,
    mean_versions: int = 4,
    seed: int = 42,
    n_repos: int = 50,
    zipf_s: float = 1.2,
    n_source_partitions: int = 32,
    delete_frac: float = 0.05,
    partitions: int | None = None,
):
    """Distributed changelog generator for bench / 10^10-scale runs.

    Key i gets v_i versions (Zipf-ish in its repo's popularity); event
    (i, v) has lsn = v * n_keys + i + 1 — globally unique, per-key
    monotone, and interleaved across keys so consecutive LSN ranges
    touch many keys (realistic churn). No driver materialization: each
    input split generates its own rows inside mapInPandas (Arrow
    batches, zero per-row Python beyond numpy vector ops).
    """
    from pyspark.sql import functions as F  # local import keeps module importable w/o spark

    partitions = partitions or spark.sparkContext.defaultParallelism
    base = spark.range(0, n_keys, 1, partitions)

    repo_w = 1.0 / np.arange(1, n_repos + 1) ** zipf_s
    repo_cum = (repo_w / repo_w.sum()).cumsum()

    def gen(batches):
        for pdf in batches:
            idx = pdf["id"].to_numpy()
            h = (idx.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15) + np.uint64(seed)) & np.uint64(0xFFFFFFFFFFFFFFFF)
            u = (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)
            repo_idx = np.searchsorted(repo_cum, u)
            # version count: 1..2*mean_versions, deterministic per key
            nv = 1 + ((h >> np.uint64(17)) % np.uint64(2 * mean_versions - 1)).astype(np.int64)
            key_idx = np.repeat(idx, nv)
            ver = np.concatenate([np.arange(1, v + 1) for v in nv]) if len(nv) else np.array([], dtype=np.int64)
            rep = np.repeat(repo_idx, nv)
            lsn = ver * n_keys + key_idx + 1
            last = np.concatenate([np.r_[np.zeros(v - 1, bool), True] for v in nv]) if len(nv) else np.array([], bool)
            hh = (key_idx.astype(np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F) + np.uint64(seed)) & np.uint64(0xFFFFFFFF)
            is_del = last & (ver > 1) & ((hh.astype(np.float64) / float(1 << 32)) < delete_frac)
            op = np.where(ver == 1, "I", "U").astype(object)
            op[is_del] = "D"
            repo = np.char.add("org/", np.char.add("repo", rep.astype(str)))
            ext = np.array(EXTS, dtype=object)[(key_idx % len(EXTS)).astype(int)]
            path = np.char.add(
                np.char.add("src/gen/f", key_idx.astype(str)), np.char.add(".", ext.astype(str))
            )
            seed_base = (key_idx * np.int64(1_000_003) + ver * np.int64(7919) + seed).astype(np.int64)
            body = pd.Series(seed_base).map(lambda s: f"def fn_{s & 0xFFFFFFFF:08x}(x):\n    return x * {s % 1000}\n")
            content = pd.Series(np.char.add("# gen v", ver.astype(str))).str.cat(body, sep="\n")
            content = content.str.cat([content] * 6, sep="")  # ~200-600 chars
            commit = pd.util.hash_pandas_object(
                pd.Series(key_idx * np.int64(31) + ver), index=False
            ).astype(np.uint64).map(lambda x: f"{x:016x}{x:016x}"[:40])
            out = pd.DataFrame(
                {
                    "lsn": lsn.astype(np.int64),
                    "batch_seq": (lsn // max(1, n_keys)).astype(np.int64),
                    "source_partition": (key_idx % n_source_partitions).astype(np.int32),
                    "op": op,
                    "repo": pd.Series(repo, dtype=object),
                    "path": pd.Series(path, dtype=object),
                    "commit": commit,
                    "lang": pd.Series(ext, dtype=object).map(LANG_OF),
                    "content": content,
                }
            )
            isd = pd.Series(is_del)
            for c in ("commit", "lang", "content"):
                out.loc[isd.values, c] = None
            out["extra"] = None
            out["ddl_action"] = None
            out["ddl_column"] = None
            out["ddl_type"] = None
            out["event_ts"] = _EPOCH.tz_localize(None) + pd.to_timedelta(out["lsn"] % 10_000_000, unit="s")
            yield out

    return base.mapInPandas(gen, schema=CHANGELOG_DDL).withColumn(
        "extra", F.col("extra").cast("map<string,string>")
    )
