"""Synthesize an sf1 dataset (10× sf0.1) for scale sweeps.

The driver only ships sf{0.001,0.01,0.1} (TESTDATA.md, read-only).
For SCALE.md's sf0.1→sf1 ratio table we replicate every fact table
10× with key-domain offsets so FK relationships hold exactly
(lineitem→orders/part/supplier, orders→customer, events→customer);
the tiny dims (region/nation) stay as-is, like a real 10× tenant
growth would look. Replica 0 keeps original document text (exact-dup
groups survive); replicas 1+ get a rep-token suffix (realistic
near-dup neighborhoods) — same scheme as tools/scalecheck.py.

Writes to /tmp/testdata_sf1 (never under /root/testdata, which is
read-only by contract). Usage:

    python tools/make_sf1.py [out_dir] [factor]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from postgresml_spark.session import get_spark, load_table

SRC = "/root/testdata/sf0.1"

# key column -> (table that owns it); every column listed here is
# offset by rep * (max(key)+1) of its owning domain.
KEY_DOMAINS = {
    "c_custkey": ("customer", "c_custkey"),
    "o_custkey": ("customer", "c_custkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "p_partkey": ("part", "p_partkey"),
    "l_partkey": ("part", "p_partkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("customer", "c_custkey"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}

COPY_TABLES = ["region", "nation"]
SCALE_TABLES = [
    "customer", "supplier", "part", "orders", "lineitem", "events",
    "documents", "embeddings",
]


def main() -> int:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/testdata_sf1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("make_sf1")

    bounds = {}
    for col, (tbl, key) in KEY_DOMAINS.items():
        dom = (tbl, key)
        if dom not in bounds:
            bounds[dom] = (
                load_table(spark, SRC, tbl).agg(F.max(key)).head()[0] + 1
            )

    for t in COPY_TABLES:
        load_table(spark, SRC, t).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{t}.parquet")
        )
        print(f"{t}: copied")

    reps = None
    for t in SCALE_TABLES:
        df = load_table(spark, SRC, t)
        if reps is None:
            reps = F.broadcast(
                spark.range(factor).select(F.col("id").alias("__rep"))
            )
        wide = df.crossJoin(reps)
        cols = []
        for c in df.columns:
            if c in KEY_DOMAINS:
                k = bounds[KEY_DOMAINS[c]]
                cols.append(
                    (F.col(c) + F.col("__rep") * F.lit(k)).alias(c)
                )
            elif t == "documents" and c == "text":
                cols.append(
                    F.when(F.col("__rep") == 0, F.col("text"))
                    .otherwise(
                        F.concat_ws(" ", "text",
                                    F.concat(F.lit("rep"), "__rep"))
                    ).alias("text")
                )
            else:
                cols.append(F.col(c))
        n_parts = max(4, factor * 2)
        wide.select(*cols).repartition(n_parts).write.mode(
            "overwrite"
        ).parquet(os.path.join(out_dir, f"{t}.parquet"))
        print(f"{t}: x{factor}")
    spark.stop()
    print(f"done -> {out_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
