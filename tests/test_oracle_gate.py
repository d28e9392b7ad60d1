"""Per-commit oracle gate for DEMOTED registry keys (ADVICE r4 #4).

The driver records exactly the first 50 registry keys into
CORRECTNESS_r{N}.json; with 56 registered, the keys past slot 50
(queries._BACK) are never re-verified by the driver against the
CURRENT code — a regression there would hide behind stale
prior-round green rows. This gate runs every past-the-window key
against its DuckDB oracle at sf0.001 on every pytest run, so the
demotion costs no per-commit coverage.

Computed DYNAMICALLY from the registry order (not from _BACK), so a
future reorder can never open a gap between "what the driver checks"
and "what this gate checks".
"""

from __future__ import annotations

import importlib.util
import os

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SF_DIR = os.environ.get("DX_GATE_SF_DIR", "/root/testdata/sf0.001")

DRIVER_SLOTS = 50  # observed identically in rounds 2-4 (positional)


def _load_check_entry():
    spec = importlib.util.spec_from_file_location(
        "check_entry", os.path.join(_REPO, "tools", "check_entry.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _demoted_keys() -> list[str]:
    import __spark_entry__ as entry

    return list(entry.queries())[DRIVER_SLOTS:]


@pytest.mark.skipif(not os.path.isdir(_SF_DIR), reason="no testdata")
@pytest.mark.parametrize("name", _demoted_keys())
def test_demoted_query_matches_oracle(spark, name):
    import duckdb

    import __spark_entry__ as entry

    ce = _load_check_entry()
    qs, oracles = entry.queries(), entry.oracle_sql()
    s_n, s_cols, s_h = ce.canon(qs[name](spark, _SF_DIR))
    if name not in oracles:
        # rows-only by documented design (cdc_skew_approx: HLL
        # estimates are engine-specific) — the hash-matched twin
        # cdc_skew_exact is driver-recorded.
        assert s_n > 0, f"{name}: no-oracle query returned 0 rows"
        return
    con = duckdb.connect()
    try:
        for t in ce.TABLES:
            p = f"{_SF_DIR}/{t}.parquet"
            if os.path.exists(p):
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
        o_n, o_cols, o_h = ce.canon(con.execute(oracles[name]).df())
    finally:
        con.close()
    assert s_cols == o_cols, f"{name}: columns {s_cols} vs {o_cols}"
    assert s_n == o_n, f"{name}: rows {s_n} vs {o_n}"
    assert s_h == o_h, f"{name}: value hash mismatch over {s_n} rows"
