"""Capped DuckDB sweep of every oracle_sql() twin against an SF dir —
finds oracle-scalability offenders (the round-4 lesson: 'correct at
sf0.01' is meaningless for chain/closure-shaped SQL) without running the
engine side.

    python tools/oracle_probe.py [sf_dir] [--cap=60] [--only=a,b]

Each query runs on its own connection with a timer thread calling
con.interrupt() at the cap; output is one line per query (sec or
TIMEOUT/ERROR), slowest last.
"""

from __future__ import annotations

import os
import sys
import tempfile
import threading
import time

import duckdb

sys.path.insert(0, ".")


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/tmp/testdata_sf1"
    cap = 60.0
    only = None
    for a in sys.argv[1:]:
        if a.startswith("--cap="):
            cap = float(a.split("=", 1)[1])
        if a.startswith("--only="):
            only = set(a.split("=", 1)[1].split(","))

    import __ray_entry__ as entrymod

    sqls = entrymod.oracle_sql()
    spill = tempfile.mkdtemp(prefix="oracle_probe_spill_")
    results = []
    for name, sql in sqls.items():
        if only is not None and name not in only:
            continue
        con = duckdb.connect()
        con.execute("SET threads TO 8")
        con.execute("SET memory_limit='20GB'")
        con.execute(f"SET temp_directory='{spill}'")
        try:
            con.execute("SET max_temp_directory_size='20GB'")
        except Exception:
            pass
        for tbl in ("region nation customer supplier part orders "
                    "lineitem events documents embeddings").split():
            con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM "
                        f"read_parquet('{sf_dir}/{tbl}.parquet')")
        timer = threading.Timer(cap, con.interrupt)
        timer.start()
        t0 = time.time()
        try:
            n = len(con.execute(sql).fetchall())
            dt = time.time() - t0
            results.append((dt, name, f"{dt:7.1f}s  {n} rows"))
        except Exception as e:
            dt = time.time() - t0
            msg = str(e).splitlines()[0][:120]
            tag = "TIMEOUT" if ("INTERRUPT" in msg.upper()
                                or dt >= cap * 0.98) else "ERROR"
            results.append((dt + (1e6 if tag == "TIMEOUT" else 0), name,
                            f"{tag} at {dt:.1f}s: {msg}"))
        finally:
            timer.cancel()
            con.close()
        print(f"{name}: {results[-1][2]}", flush=True)
    print("\n=== slowest ===")
    for _, name, msg in sorted(results)[-15:]:
        print(f"{name}: {msg}")
    import shutil

    shutil.rmtree(spill, ignore_errors=True)


if __name__ == "__main__":
    main()
