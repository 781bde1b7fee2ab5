"""Self-check harness: replicate the driver's DuckDB-oracle comparison.

Runs every queries() entry on Spark and its oracle_sql() on DuckDB at a
given SF dir, compares row count, sorted column names, and an
order-insensitive value multiset. Usage:

    python tools/selfcheck.py [sf_dir] [query_name ...]

Set SELFCHECK_JSON=/path.json to also write a machine-readable
per-query {status, rows, seconds} map (the committed SELFCHECK_r{N}
artifact — full-catalog correctness evidence beyond the driver's
50-query gate window, VERDICT r2 #5).

Set SELFCHECK_SKIP="name=reason;name=reason" to skip queries whose
ORACLE is intractable at the target SF (e.g. an all-pairs DuckDB
oracle that is quadratic in a 50k-row sf1 table). Skips are recorded
in the JSON with status "skipped" and the stated reason, so the
artifact documents exactly what was excluded and why (VERDICT r3 #3).

Set SELFCHECK_ORACLE_SKIP="name=reason;..." to skip ONLY the DuckDB
oracle while still RUNNING the Spark side (the sf10 sweep contract,
VERDICT r5 next #7: the quadratic oracle is what's intractable, the
distributed plan must still prove it runs and scales). Recorded with
status "oracle_skipped" + rows + seconds.
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from postgresml_spark.session import TABLES, get_spark

import __spark_entry__ as entry_mod


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return repr(v)


def _normalize(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for r in rows:
        vals = list(r)
        out.append(tuple(_norm_cell(vals[i]) for i in order))
    return sorted(out)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):  # Spark directory-parquet (e.g. make_sf1)
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    spark = get_spark("selfcheck")
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()

    results: dict[str, dict] = {}

    def record(name, status, t0, rows=None, msg=None):
        results[name] = {
            "status": status,
            "rows": rows,
            "seconds": round(time.time() - t0, 2),
            **({"detail": msg} if msg else {}),
        }

    skips: dict[str, str] = {}
    for part in os.environ.get("SELFCHECK_SKIP", "").split(";"):
        if "=" in part:
            k, _, v = part.partition("=")
            skips[k.strip()] = v.strip()
    oracle_skips: dict[str, str] = {}
    for part in os.environ.get("SELFCHECK_ORACLE_SKIP", "").split(";"):
        if "=" in part:
            k, _, v = part.partition("=")
            oracle_skips[k.strip()] = v.strip()

    n_pass = n_fail = 0
    for name, fn in sorted(queries.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        if name in skips:
            print(f"SKIP {name}: {skips[name]}")
            record(name, "skipped", t0, msg=skips[name])
            continue
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            record(name, "fail", t0, msg=f"spark error: {e}")
            n_fail += 1
            continue
        if name in oracle_skips:
            print(f"ORACLE-SKIP {name}: {oracle_skips[name]} "
                  f"(spark ran: {len(s_rows)} rows) [{time.time()-t0:.1f}s]")
            record(name, "oracle_skipped", t0, rows=len(s_rows),
                   msg=oracle_skips[name])
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows-only): {len(s_rows)} rows "
                  f"[{time.time()-t0:.1f}s]")
            record(name, "rows_only", t0, rows=len(s_rows))
            continue
        try:
            rel = con.sql(oracles[name])
            # Driver-canonicalizer hazard: HUGEINT (sum over integers)
            # coerces to float64 under pandas while Spark stays int64 —
            # hash-mismatch even with identical values (VERDICT r2 #1).
            hazards = [
                (c, str(ty))
                for c, ty in zip(rel.columns, rel.types)
                if "HUGEINT" in str(ty).upper()
            ]
            d_cols = list(rel.columns)
            d_rows = rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            record(name, "fail", t0, msg=f"duckdb error: {e}")
            n_fail += 1
            continue
        ok = True
        msgs = []
        if hazards:
            ok = False
            msgs.append(f"oracle emits HUGEINT (pandas->float64): {hazards}")
        if sorted(s_cols) != sorted(d_cols):
            ok = False
            msgs.append(f"cols spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
        if len(s_rows) != len(d_rows):
            ok = False
            msgs.append(f"rowcount spark={len(s_rows)} duckdb={len(d_rows)}")
        if ok:
            ns, nd = _normalize(s_rows, s_cols), _normalize(d_rows, d_cols)
            if ns != nd:
                ok = False
                diff = [(a, b) for a, b in zip(ns, nd) if a != b][:3]
                msgs.append(f"values differ, first diffs: {diff}")
        if ok:
            print(f"PASS {name}: {len(s_rows)} rows [{time.time()-t0:.1f}s]")
            record(name, "pass", t0, rows=len(s_rows))
            n_pass += 1
        else:
            print(f"FAIL {name}: " + "; ".join(msgs))
            record(name, "fail", t0, rows=len(s_rows), msg="; ".join(msgs))
            n_fail += 1

    print(f"\n{n_pass} passed, {n_fail} failed")
    out_json = os.environ.get("SELFCHECK_JSON")
    if out_json:
        import json

        with open(out_json, "w") as f:
            json.dump(
                {"sf_dir": sf_dir, "n_pass": n_pass, "n_fail": n_fail,
                 "n_rows_only": sum(
                     1 for r in results.values() if r["status"] == "rows_only"
                 ),
                 "queries": results},
                f, indent=1, sort_keys=True,
            )
        print(f"wrote {out_json}")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
