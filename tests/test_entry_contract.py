"""Driver-contract meta-tests: queries()/oracle_sql() stay aligned.

The driver compares every queries() entry against its oracle_sql() twin
by NAME; a typo'd key silently demotes a query to the weaker rows-only
check. These tests make the mapping drift-proof: every oracle key must
name a real query, every un-oracled query must be on the explicit
rows-only allowlist, and entry() must run and return rows.
"""

from __future__ import annotations

import __ray_entry__ as entrymod

# the ONLY queries allowed to run without a DuckDB oracle (driver falls
# back to a rows-only check) — each needs a reason
# every registered query must carry an oracle twin — the media_decode
# waiver was retired when its deterministic kernels got a pinned
# sequential-replay table (tools/gen_pinned_oracles.py)
ROWS_ONLY_ALLOWED: set = set()


def test_every_query_has_oracle_or_waiver():
    qs = set(entrymod.queries())
    sqls = set(entrymod.oracle_sql())
    missing = qs - sqls - ROWS_ONLY_ALLOWED
    assert not missing, (
        f"queries without an oracle_sql twin or a waiver: {sorted(missing)}"
    )


def test_every_oracle_names_a_query():
    qs = set(entrymod.queries())
    sqls = set(entrymod.oracle_sql())
    orphans = sqls - qs
    assert not orphans, f"oracle_sql keys with no query: {sorted(orphans)}"


def test_entry_returns_rows():
    out = entrymod.entry()
    import pandas as pd

    if isinstance(out, pd.DataFrame):
        n = len(out)
        cols = list(out.columns)
    else:  # ray Dataset
        n = out.count()
        cols = out.schema().names
    assert n >= 0
    # schema must be stable/non-empty
    assert len(cols) > 0
