"""Z-order clustering: portable Morton key + measured file-pruning win.

The point of zorder_write is physical: after sorting by the interleaved
key, each parquet file covers a small rectangle in (x, y) space, so a
box predicate on BOTH columns matches few files' min/max stats. The
test measures that directly from parquet footers and requires the
z-ordered layout to beat a value-sorted layout (which clusters only one
dimension) on a two-sided predicate.
"""

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from postgresml_spark.operators.partitioning import morton_code, zorder_write
from postgresml_spark.session import load_table


def _files_matching(path, lo_uid, hi_uid, lo_val, hi_val):
    """(matching, total) files whose row-group stats intersect the box."""
    total, match = 0, 0
    for f in glob.glob(os.path.join(path, "*.parquet")):
        meta = pq.ParquetFile(f).metadata
        fmin_u = fmax_u = fmin_v = fmax_v = None
        cols = {
            meta.row_group(0).column(i).path_in_schema: i
            for i in range(meta.num_columns)
        }
        for rg in range(meta.num_row_groups):
            su = meta.row_group(rg).column(cols["user_id"]).statistics
            sv = meta.row_group(rg).column(cols["value"]).statistics
            fmin_u = su.min if fmin_u is None else min(fmin_u, su.min)
            fmax_u = su.max if fmax_u is None else max(fmax_u, su.max)
            fmin_v = sv.min if fmin_v is None else min(fmin_v, sv.min)
            fmax_v = sv.max if fmax_v is None else max(fmax_v, sv.max)
        total += 1
        if fmax_u >= lo_uid and fmin_u < hi_uid and fmax_v >= lo_val and fmin_v < hi_val:
            match += 1
    return match, total


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")


def test_morton_code_locality(events):
    # neighboring cells differ little in code; far cells differ a lot
    code = morton_code(
        F.col("user_id").cast("double"), "value", 0.0, 160.0, 0.0, 512.0
    )
    rows = events.select("user_id", "value", code.alias("z")).collect()
    assert all(r["z"] >= 0 for r in rows)
    # code is within 16-bit range for 8-bit quantization
    assert all(r["z"] < (1 << 16) for r in rows)


def test_zorder_write_prunes_both_dimensions(events, tmp_path):
    # bounds from the data so the test holds at any SF
    hi_u = float(events.agg(F.max("user_id")).head()[0]) + 1.0
    hi_v = float(events.agg(F.max("value")).head()[0]) + 1.0
    code = morton_code(
        F.col("user_id").cast("double"), "value", 0.0, hi_u, 0.0, hi_v
    )
    zpath = str(tmp_path / "zorder")
    spath = str(tmp_path / "valsort")
    zorder_write(events, zpath, code, num_files=16)
    # baseline: same file count, clustered on ONE dimension only
    (
        events.repartitionByRange(16, "value")
        .sortWithinPartitions("value")
        .write.mode("overwrite")
        .parquet(spath)
    )
    # Predicate on the dimension the value-sort CANNOT serve: every
    # value-sorted file spans (nearly) all user_ids, so a uid bound
    # prunes ~nothing there; the z-ordered store must skip files.
    lo_uid, hi_uid = hi_u * 3 // 8, hi_u * 4 // 8
    z_uid, z_total = _files_matching(zpath, lo_uid, hi_uid, -1e9, 1e9)
    s_uid, s_total = _files_matching(spath, lo_uid, hi_uid, -1e9, 1e9)
    assert z_total >= 8 and s_total >= 8
    assert s_uid >= s_total - 2  # one-dim sort is blind to uid
    assert z_uid < s_uid  # z-order must actually skip files
    assert z_uid <= z_total * 3 // 4
    # A two-sided box can only tighten the z-ordered match set
    z_box, _ = _files_matching(zpath, lo_uid, hi_uid, hi_v / 4, hi_v / 2)
    assert z_box <= z_uid


def test_compact_preserves_index_layout_and_sidecar(spark, tmp_path):
    """Compacting a materialized text index must keep the __bucket
    partition layout and the _stats.json sidecar — and the index must
    still serve identical scores afterwards."""
    import os

    from postgresml_spark.collections.storage import compact_parquet_dir
    from postgresml_spark.functions.text import (
        append_to_text_index,
        bm25_search_index,
        build_text_index,
    )

    docs = spark.createDataFrame(
        [(i, f"alpha beta doc{i} gamma") for i in range(30)],
        "doc_id long, text string",
    )
    path = str(tmp_path / "ftidx")
    build_text_index(docs, path, "text", "doc_id", n_buckets=4)
    batch = spark.createDataFrame(
        [(100, "alpha alpha beta"), (101, "beta gamma")],
        "doc_id long, text string",
    )
    append_to_text_index(batch, path, "text", "doc_id")
    before = sorted(
        (r["doc_id"], round(r["score"], 9))
        for r in bm25_search_index(spark, path, ["alpha", "beta"]).collect()
    )
    compact_parquet_dir(spark, path, target_rows_per_file=1_000_000)
    assert os.path.exists(os.path.join(path, "_stats.json"))
    assert any(e.startswith("__bucket=") for e in os.listdir(path))
    after = sorted(
        (r["doc_id"], round(r["score"], 9))
        for r in bm25_search_index(spark, path, ["alpha", "beta"]).collect()
    )
    assert after == before


def test_build_text_index_empty_then_append(spark, tmp_path):
    """Bootstrap pattern: build an empty index, append waves into it."""
    from postgresml_spark.functions.text import (
        append_to_text_index,
        bm25_search_index,
        build_text_index,
    )

    empty = spark.createDataFrame([], "doc_id long, text string")
    path = str(tmp_path / "ftidx_empty")
    _, stats = build_text_index(empty, path, "text", "doc_id", n_buckets=4)
    assert stats["n_docs"] == 0 and stats["avgdl"] == 0.0
    batch = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha")], "doc_id long, text string"
    )
    append_to_text_index(batch, path, "text", "doc_id")
    got = {r["doc_id"] for r in bm25_search_index(spark, path, ["alpha"]).collect()}
    assert got == {1, 2}
