"""Audit oracle_sql() output types for driver-canonicalizer hazards.

The driver materializes the DuckDB oracle via pandas, where HUGEINT
(the result type of sum() over integer columns) coerces to float64
while the Spark side stays int64 — the canonicalizer then hashes
`0.0` vs `0` and flags a mismatch even when values are identical
(VERDICT r2, What's wrong #1).  This tool binds every oracle (no
execution — DuckDB relation .types come from the binder) and flags
HUGEINT / UHUGEINT / DECIMAL output columns so the hazard is caught
at author time.

Usage: python tools/oracle_type_audit.py [sf_dir]
Exit 1 if any hazard found.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from postgresml_spark.session import TABLES

import __spark_entry__ as entry_mod

HAZARDS = ("HUGEINT", "UHUGEINT")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    bad = 0
    for name, sql in sorted(entry_mod.oracle_sql().items()):
        try:
            rel = con.sql(sql)
        except Exception as e:  # noqa: BLE001 - report and continue
            print(f"BINDERR {name}: {e}")
            bad += 1
            continue
        hits = [
            (c, str(ty))
            for c, ty in zip(rel.columns, rel.types)
            if any(h in str(ty).upper() for h in HAZARDS)
        ]
        decs = [
            (c, str(ty))
            for c, ty in zip(rel.columns, rel.types)
            if "DECIMAL" in str(ty).upper()
        ]
        if hits:
            print(f"HAZARD {name}: {hits}")
            bad += 1
        if decs:
            print(f"WARN-DECIMAL {name}: {decs}")
    if not bad:
        print("clean: no HUGEINT/UHUGEINT oracle outputs")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
