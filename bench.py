"""Benchmark harness: runs the query catalog at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric", "value", "unit", "queries", "sf"}.

Timing = full plan execution to a count/collect action (results are
small aggregates; collect cost is negligible vs scan/shuffle).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from postgresml_spark.session import get_spark  # noqa: E402

# shared probe set for the SDK serving metrics (8 queries → median)
_SERVING_PROBES = [
    "distributed query engine", "vector similarity search",
    "stream processing state", "columnar storage format",
    "hash join strategy", "window aggregate partition",
    "sorted merge spill", "shuffle exchange reuse",
]


def _run_serving_probes(coll, pipe, pipe2) -> tuple[dict, dict]:
    """The six SDK serving `*_ms` medians + per-metric variance.

    Callable in-process (fallback) or from the fresh-process probe
    (`bench.py --serving-probe`, VERDICT r7 next #2): 8 in-process
    probes land inside host-noise bursts WHOLESALE (SCALE.md measured
    14.26 vs 1.70 ms back-to-back on identical code), so the recorded
    bench runs them in a fresh process that rebuilds the served
    indexes from the already-written stores."""
    derived: dict = {}
    variance: dict = {}

    def q(t):
        return {"query": {"fields": {"text": {"query": t}}}, "limit": 10}

    def hq(t):
        return {
            "query": {
                "semantic_search": {"text": {"query": t, "boost": 1.5}},
                "full_text_search": {"text": {"query": t, "boost": 0.8}},
            },
            "limit": 10,
        }

    def fq(t):
        return {
            "query": {
                "fields": {"text": {"query": t}},
                "filter": {"lang": {"$in": ["en", "fr"]}},
            },
            "limit": 10,
        }

    def med(key, call, qps=False):
        call(_SERVING_PROBES[0])  # warm (incl. lazy index build)
        ts = []
        # n=32 per metric (4 passes over the 8-probe set — same
        # hardening as the store probes, VERDICT r9 next #4): with
        # n=8 a single multi-ms host-noise burst spanning one
        # metric's probe window shifted its whole median (hybrid
        # medians 1.5->4.0 ms on identical code+store in the r10 A/B
        # while an idle re-probe read 1.45; OPTIMIZATION_r10.md).
        # Probe mix unchanged; these calls are ~ms each.
        for _ in range(4):
            for p in _SERVING_PROBES:
                t0 = time.perf_counter()
                call(p)
                ts.append(time.perf_counter() - t0)
        ts.sort()
        v = round(ts[len(ts) // 2] * 1000, 2)
        derived[key] = v
        variance[key] = {
            "median": v,
            "min": round(ts[0] * 1000, 2),
            "max": round(ts[-1] * 1000, 2),
            "n": len(ts),
        }
        if qps and v:
            derived[key.replace("_ms", "_qps")] = round(1000.0 / v, 1)

    med("vector_search_indexed_ms",
        lambda p: coll.vector_search(q(p), pipe, method="index"), qps=True)
    # hybrid through the resident tier (semantic matvec + resident
    # ts postings, buffered telemetry)
    med("hybrid_search_indexed_ms",
        lambda p: coll.search(hq(p), pipe2, method="index"), qps=True)
    # candidate-bounded hybrid (method='candidate', r6): semantic
    # side through the ANN shortlist + ft-doc augmentation instead
    # of the O(corpus·d) matvec — the 100-TB serving path
    med("hybrid_candidate_ms",
        lambda p: coll.search(hq(p), pipe2, method="candidate"))
    # DEFAULT entry point (no method kwarg — method='auto' since r4):
    # unfiltered SDK queries must land on the served tier without
    # opt-in, so this is the number a reference user actually gets
    med("vector_search_default_ms",
        lambda p: coll.vector_search(q(p), pipe))
    med("hybrid_search_default_ms",
        lambda p: coll.search(hq(p), pipe2))
    # FILTERED vector search on the served tier (r4: the pgvector
    # 0.8 iterative-scan analog — metadata filters no longer fall
    # back to the per-query Spark plan)
    med("vector_search_filtered_ms",
        lambda p: coll.vector_search(fq(p), pipe))
    return derived, variance


def _run_store_probes(spark, sf_dir, sparse_path, bm25_path):
    """sparse_served / bm25_served / knn_served medians + variance —
    the three Spark-job-per-query serving metrics (VERDICT r8 next
    #5: they were the last `*_served_ms` outside the fresh-process
    probe, so their drift had no variance channel and was
    uninterpretable). Callable in-process (fallback) or from
    `bench.py --serving-probe` with store paths."""
    derived: dict = {}
    variance: dict = {}

    def med(key, calls, digits=1):
        # 3 warm reps: these are Spark-JOB latencies — a fresh
        # process's first executions carry codegen + JIT that the
        # steady state (the number the drift table compares) does not
        for _ in range(3):
            calls[0]()
        ts = []
        # n>=16 per metric (VERDICT r9 next #4): the r9 medians over
        # n=5 were uninterpretable against 100-300 ms scheduler
        # hiccups (sparse_served 662->962 ms on untouched code); four
        # passes over the same probe set keeps the probe mix identical
        # while the median converges. Same metric, better estimator —
        # recorded here per the bench-contract note in
        # OPTIMIZATION_r10.md.
        for _ in range(4):
            for c in calls:
                t0 = time.perf_counter()
                c()
                ts.append(time.perf_counter() - t0)
        ts.sort()
        v = round(ts[len(ts) // 2] * 1000, digits)
        derived[key] = v
        derived[key.replace("_ms", "_qps")] = (
            round(1000.0 / v, 2) if v else None
        )
        variance[key] = {
            "median": v,
            "min": round(ts[0] * 1000, digits),
            "max": round(ts[-1] * 1000, digits),
            "n": len(ts),
        }

    try:
        from postgresml_spark.operators.sparse import sparse_search_index

        probes = [["vector", "merge"], ["stream"], ["hash", "table"],
                  ["spark", "row"], ["value"]]
        med("sparse_served_ms",
            [lambda p=p: sparse_search_index(spark, sparse_path, p,
                                             k=10).collect()
             for p in probes])
    except Exception as e:
        print(f"probe sparse-served error: {e}", file=sys.stderr)
    try:
        from postgresml_spark.functions.text import bm25_search_index

        tprobes = [["vector", "merge"], ["stream", "hash"],
                   ["table", "scan"], ["spark", "row"], ["sort", "value"]]
        med("bm25_served_ms",
            [lambda p=p: bm25_search_index(spark, bm25_path, p,
                                           k=10).collect()
             for p in tprobes])
    except Exception as e:
        print(f"probe bm25-served error: {e}", file=sys.stderr)
    try:
        from postgresml_spark.operators.similarity import ServedIndex
        from postgresml_spark.session import load_table

        emb = load_table(spark, sf_dir, "embeddings")
        qvs = [
            [float(x) for x in r["embedding"]]
            for r in emb.orderBy("vec_id").limit(8).collect()
        ]
        idx = ServedIndex(emb)
        try:
            med("knn_served_ms",
                [lambda qv=qv: idx.search(qv, k=10).collect()
                 for qv in qvs])
        finally:
            idx.close()
    except Exception as e:
        print(f"probe knn-served error: {e}", file=sys.stderr)
    return derived, variance


def _bench_pipelines():
    from postgresml_spark.collections import Pipeline

    pipe = Pipeline(
        "p",
        {"text": {"semantic_search": {"model": "hash:16",
                                      "hnsw": {"m": 16, "ef_construction": 64}}}},
    )
    pipe2 = Pipeline(
        "ph",
        {"text": {"semantic_search": {"model": "hash:16"},
                  "full_text_search": {"configuration": "english"}}},
    )
    return pipe, pipe2


def serving_probe_main(wh: str, sf_dir: str | None = None,
                       sparse_path: str | None = None,
                       bm25_path: str | None = None) -> int:
    """`bench.py --serving-probe <warehouse> [sf_dir sparse bm25]`:
    fresh process, rebuild the served indexes from the stores the
    parent just wrote (attach = no-op sync — watermarks are current),
    probe, print ONE JSON line. With the optional store paths the
    probe also covers the three Spark-job serving metrics
    (sparse/bm25/knn `*_served_ms`, VERDICT r8 next #5)."""
    from postgresml_spark.collections import Collection

    spark = get_spark("bench-serving-probe")
    coll = Collection("bench_vs", spark, warehouse=wh)
    pipe, pipe2 = _bench_pipelines()
    coll.add_pipeline(pipe)
    coll.add_pipeline(pipe2)
    derived, variance = _run_serving_probes(coll, pipe, pipe2)
    if sf_dir and sparse_path and bm25_path:
        d2, v2 = _run_store_probes(spark, sf_dir, sparse_path, bm25_path)
        derived.update(d2)
        variance.update(v2)
    print(json.dumps({"derived": derived, "variance": variance}))
    spark.stop()
    return 0


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    import __spark_entry__ as entry_mod

    spark = get_spark("bench")
    queries = entry_mod.queries()

    # Warm the JVM + parquet footers once so per-query numbers measure
    # execution, not first-touch costs.
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    times: dict[str, float] = {}
    rows: dict[str, int] = {}
    total = 0.0
    for name, fn in sorted(queries.items()):
        t0 = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            n = len(df.collect())
            dt = time.perf_counter() - t0
            times[name] = round(dt, 3)
            rows[name] = n
            total += dt
        except Exception as e:  # report but keep the line parseable
            times[name] = -1.0
            print(f"bench error {name}: {e}", file=sys.stderr)

    # Throughput-class metrics were single-shot on a host with measured
    # ±25% noise (SCALE.md drift triage), which made round-over-round
    # drift unfalsifiable (VERDICT r6 next #6). Re-run the three
    # metrics' source queries twice more (fresh DataFrame per rep — the
    # shuffle-reuse trap) and derive from the MEDIAN of 3; min/max/n go
    # to BENCH_DETAIL.json's derived_variance block for the drift table.
    variance: dict[str, dict] = {}

    def _rep3(qname: str) -> float | None:
        if times.get(qname, -1) <= 0:
            return None
        if qname in variance:  # already warmed (tail-reps pass)
            return variance[qname]["median"]
        runs = [times[qname]]
        fn = queries[qname]
        for _ in range(2):
            try:
                t0 = time.perf_counter()
                fn(spark, sf_dir).collect()
                runs.append(time.perf_counter() - t0)
            except Exception as e:
                print(f"bench rep error {qname}: {e}", file=sys.stderr)
        runs.sort()
        variance[qname] = {
            "median": round(runs[len(runs) // 2], 3),
            "min": round(runs[0], 3),
            "max": round(runs[-1], 3),
            "n": len(runs),
        }
        return runs[len(runs) // 2]

    # Warm tail medians (VERDICT r7 next #7): the catalog map is
    # single-shot, so the heaviest entries carry first-touch noise and
    # round-over-round drift tables decompose badly. Re-run the top-20
    # heaviest queries 2 more times each; their {median,min,max,n} land
    # in derived_variance so drift compares warm medians, not one-shots.
    tail = [n for n, t in sorted(times.items(), key=lambda kv: -kv[1])
            if t > 0][:20]
    for qname in tail:
        _rep3(qname)

    # derived per-row costs comparable to BASELINE.md's batch numbers
    # (reference pgml.embed amortized: 17-30 ms/row with a real model;
    # our deterministic hash embedder is the no-model path)
    n_docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).count()
    derived = {}
    t_embed = _rep3("q50_hash_embeddings")
    if t_embed and n_docs:
        derived["embed_ms_per_row"] = round(t_embed / n_docs * 1000, 4)
    if times.get("q51_semantic_search", -1) > 0:
        derived["vector_search_sec"] = times["q51_semantic_search"]
    if times.get("q53_hybrid_search", -1) > 0:
        derived["hybrid_search_sec"] = times["q53_hybrid_search"]

    # Steady-state search latency: the single-run numbers above are
    # dominated by first-touch job costs; the reference's 18-31 ms
    # ivfflat figure is a warm-index number, so report the median of
    # repeated in-session runs as the comparable throughput metric.
    def _steady(name: str, reps: int = 5) -> float | None:
        fn = queries.get(name)
        if fn is None:
            return None
        try:
            fn(spark, sf_dir).collect()  # warm plan/codegen
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                fn(spark, sf_dir).collect()
                ts.append(time.perf_counter() - t0)
            ts.sort()
            return round(ts[len(ts) // 2] * 1000, 1)
        except Exception as e:
            print(f"bench steady error {name}: {e}", file=sys.stderr)
            return None

    for qname, key in (
        ("q51_semantic_search", "vector_search_steady_ms"),
        ("q53_hybrid_search", "hybrid_search_steady_ms"),
        ("q13_knn_cosine", "knn_steady_ms"),
    ):
        v = _steady(qname)
        if v is not None:
            derived[key] = v
            derived[key.replace("_ms", "_qps")] = round(1000.0 / v, 2) if v else None

    # SDK vector_search through the resident HNSW tier (VERDICT r2 #3):
    # build once at sync (reported separately), then serve with no
    # Spark job on the query path — the apples-to-apples number against
    # the reference's 18-31 ms warm indexed query. The six serving
    # `*_ms` medians come from a FRESH SUBPROCESS over the same stores
    # (VERDICT r7 next #2): in-process probes land inside host-noise
    # bursts wholesale; a fresh process measured 0.62 ms where the r7
    # driver bench recorded 5.87 on identical code.
    try:
        import shutil
        import subprocess
        import tempfile

        from pyspark.sql import functions as Fb

        from postgresml_spark.collections import Collection

        wh = tempfile.mkdtemp(prefix="bench_vsidx_")
        d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).filter(
            Fb.col("text").isNotNull()
        )
        coll = Collection("bench_vs", spark, warehouse=wh)
        coll.upsert_documents_df(
            d.select(Fb.col("doc_id").alias("id"), "text", "lang")
        )
        pipe, pipe2 = _bench_pipelines()
        coll.add_pipeline(pipe)
        coll.add_pipeline(pipe2)
        t0 = time.perf_counter()
        pipe.served_index("text")  # Arrow hop + graph build
        derived["vector_search_index_build_sec"] = round(time.perf_counter() - t0, 3)
        # store BUILDS for the Spark-job serving metrics (timed here;
        # their queries are probed in the fresh process below so all
        # nine `*_ms` serving medians share one variance channel —
        # VERDICT r8 next #5)
        spath = bpath = None
        try:
            from postgresml_spark.functions.text import build_text_index
            from postgresml_spark.operators.sparse import build_sparse_index

            d_stores = spark.read.parquet(
                os.path.join(sf_dir, "documents.parquet")
            )
            spath = tempfile.mkdtemp(prefix="bench_sidx_")
            t0 = time.perf_counter()
            build_sparse_index(d_stores, spath)
            derived["sparse_index_build_sec"] = round(
                time.perf_counter() - t0, 3
            )
            bpath = tempfile.mkdtemp(prefix="bench_bm25_")
            t0 = time.perf_counter()
            build_text_index(d_stores, bpath, "text", "doc_id")
            derived["bm25_build_sec"] = round(time.perf_counter() - t0, 3)
        except Exception as e:
            print(f"bench store-build error: {e}", file=sys.stderr)
        probe_out = None
        try:
            extra = (
                [sf_dir, spath, bpath] if spath and bpath else []
            )
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--serving-probe", wh, *extra],
                capture_output=True, text=True, timeout=1200,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            if proc.returncode == 0 and proc.stdout.strip():
                probe_out = json.loads(proc.stdout.strip().splitlines()[-1])
            else:
                print(f"serving probe rc={proc.returncode}: "
                      f"{proc.stderr[-500:]}", file=sys.stderr)
        except Exception as e:
            print(f"serving probe spawn error: {e}", file=sys.stderr)
        if probe_out is None:
            # fallback: same probes in-process (noise-prone but present)
            pd_, pv_ = _run_serving_probes(coll, pipe, pipe2)
            probe_out = {"derived": pd_, "variance": pv_,
                         "probe_mode": "in_process_fallback"}
            if spath and bpath:
                pd2, pv2 = _run_store_probes(spark, sf_dir, spath, bpath)
                probe_out["derived"].update(pd2)
                probe_out["variance"].update(pv2)
        else:
            probe_out["probe_mode"] = "fresh_process"
        derived.update(probe_out["derived"])
        derived["serving_probe_mode"] = probe_out["probe_mode"]
        variance.update(probe_out["variance"])
        shutil.rmtree(wh, ignore_errors=True)
        if spath:
            shutil.rmtree(spath, ignore_errors=True)
        if bpath:
            shutil.rmtree(bpath, ignore_errors=True)
    except Exception as e:
        print(f"bench vector-indexed error: {e}", file=sys.stderr)

    # Corpus-pipeline throughput: hygiene + dedup + shuffle end-to-end
    # (q72 runs the full 5-stage pipeline over a fixed 400-doc slice;
    # the per-doc number amortizes codegen/JIT fixed costs visible in
    # the raw wall-clock)
    t_corpus = _rep3("q72_corpus_assembly")
    if t_corpus:
        derived["corpus_pipeline_docs_per_sec"] = round(400 / t_corpus, 1)
    t_dedup = _rep3("q22_dedup_exact")
    if t_dedup and n_docs:
        derived["exact_dedup_docs_per_sec"] = round(n_docs / t_dedup, 1)

    # Incremental-sync throughput (VERDICT r6 next #7): a 100k-doc
    # synced collection, then 1% changed docs re-upserted — the
    # change-log sync must chunk/embed/write ONLY the 1% (count
    # asserted), and a no-op sync must be a watermark compare (~0 s).
    # NOTE (SCALE.md): with the deterministic hash embedder, embedding
    # is ~free, so the measured full/incremental ratio is
    # orchestration-bound; with the reference's real embedder
    # (17-30 ms/row) the same plans differ ~100x.
    try:
        import shutil
        import tempfile

        from pyspark.sql import functions as F

        from postgresml_spark.collections import Collection, Pipeline

        base_docs = (
            spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            .filter(F.col("text").isNotNull()).select("doc_id", "text", "lang")
        )
        nb = base_docs.count()
        K = max(1, 100_000 // max(nb, 1))
        big = base_docs.crossJoin(
            spark.range(K).withColumnRenamed("id", "rep")
        ).select((F.col("doc_id") * K + F.col("rep")).alias("id"),
                 "text", "lang")
        n_big = nb * K
        wh = tempfile.mkdtemp(prefix="bench_incsync_")
        coll = Collection("incsync", spark, warehouse=wh)
        coll.upsert_documents_df(big)
        pipe = Pipeline("p", {"text": {
            "semantic_search": {"model": "hash:1024"},
            "full_text_search": {"configuration": "english"},
        }})
        coll.add_pipeline(pipe)  # initial full build (not timed)
        t0 = time.perf_counter()
        pipe.resync()
        t_full = time.perf_counter() - t0
        coll._pipelines.pop("p")  # manual sync control for the timing
        changed = big.filter(F.pmod(F.col("id"), F.lit(100)) == 0) \
            .withColumn("text", F.concat(F.lit("UPDATED "), F.col("text")))
        n_chg = changed.count()
        coll.upsert_documents_df(changed)
        t0 = time.perf_counter()
        counts = pipe.sync()
        t_inc = time.perf_counter() - t0
        assert counts["text_chunks"] == n_chg, (
            f"incremental sync re-derived {counts['text_chunks']} chunks "
            f"for {n_chg} changed docs"
        )
        t0 = time.perf_counter()
        noop = pipe.sync()
        t_noop = time.perf_counter() - t0
        assert all(v == 0 for v in noop.values()), "no-op sync not empty"
        derived["full_resync_docs_per_sec"] = round(n_big / t_full, 1)
        derived["incremental_sync_docs_per_sec"] = round(n_big / t_inc, 1)
        derived["incremental_sync_changed_chunks"] = counts["text_chunks"]
        derived["noop_sync_ms"] = round(t_noop * 1000, 2)
        shutil.rmtree(wh, ignore_errors=True)
    except Exception as e:
        print(f"bench incremental-sync error: {e}", file=sys.stderr)

    # Resident sparse tier (ServedSparseIndex): same scores, no
    # Spark job per query — the GIN-in-shared-buffers analog. (The
    # Spark-job sparse/bm25/knn serving medians moved into the
    # fresh-process probe above — VERDICT r8 next #5.)
    try:
        from postgresml_spark.operators.sparse import ServedSparseIndex

        d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        probes = [["vector", "merge"], ["stream"], ["hash", "table"],
                  ["spark", "row"], ["value"]]
        t0 = time.perf_counter()
        sidx = ServedSparseIndex(d)
        derived["sparse_resident_build_sec"] = round(time.perf_counter() - t0, 3)
        sidx.search(probes[0], k=10)  # warm
        ts = []
        for p in probes:
            t0 = time.perf_counter()
            sidx.search(p, k=10)
            ts.append(time.perf_counter() - t0)
        ts.sort()
        v = round(ts[len(ts) // 2] * 1000, 3)
        derived["sparse_resident_ms"] = v
        derived["sparse_resident_qps"] = round(1000.0 / v, 1) if v else None
    except Exception as e:
        print(f"bench sparse-resident error: {e}", file=sys.stderr)

    # Batched sparse retrieval: the amortized form — N queries share
    # one corpus pass (broadcast union of query postings), so per-query
    # cost at batch volume is scan/N, the number that actually matters
    # for recall-stage retrieval in a training pipeline.
    try:
        from postgresml_spark.operators.sparse import (
            sparse_features,
            sparse_queries,
            sparse_topk_join,
        )

        d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        post = sparse_features(d, "text", "doc_id").localCheckpoint()
        words = ["vector", "merge", "stream", "hash", "table", "row",
                 "scan", "key", "value", "sort", "spark", "fast"]
        qdefs = [(i, [words[i % 12], words[(i * 5 + 1) % 12]]) for i in range(64)]
        qs = sparse_queries(d, qdefs)
        sparse_topk_join(post, qs, k=10).count()  # warm
        t0 = time.perf_counter()
        sparse_topk_join(post, qs, k=10).count()
        dt = time.perf_counter() - t0
        derived["sparse_batch64_sec"] = round(dt, 3)
        derived["sparse_batch_qps"] = round(64 / dt, 1)
    except Exception as e:
        print(f"bench sparse-batch error: {e}", file=sys.stderr)

    # Resident IVF at 100k x 128 (clustered synth): a same-ballpark
    # datapoint against the reference's warm ivfflat 18-31 ms —
    # sf0.1's 2k x 64 corpus is 3 orders of magnitude smaller, so the
    # sf-scale numbers alone overstate the win. tools/annbench.py has
    # the 1M x 256 run (6.7 ms median, recall@10 1.0).
    try:
        from postgresml_spark.operators.similarity import ResidentANN

        n_ann, dim_ann, nlist, nprobe = 100_000, 128, 256, 16
        import pyspark.sql.functions as Fb

        mode = (Fb.col("vec_id") % nlist + 1).cast("double")
        synth = (
            spark.range(n_ann)
            .withColumnRenamed("id", "vec_id")
            .withColumn(
                "embedding",
                Fb.transform(
                    Fb.sequence(Fb.lit(1), Fb.lit(dim_ann)),
                    lambda i: Fb.sin(mode * i.cast("double") * 2.39996)
                    + Fb.randn(42) * 0.15,
                ),
            )
        )
        ivf = ResidentANN(synth, nlist=nlist, nprobe=nprobe)
        import numpy as _np

        rng = _np.random.default_rng(7)
        qv = [
            ivf.mat[i] + rng.normal(0, 0.05, dim_ann)
            for i in rng.integers(0, n_ann, size=32)
        ]
        ivf.search(qv[0], k=10)  # warm BLAS
        ts = []
        for q in qv:
            t0 = time.perf_counter()
            ivf.search(q, k=10)
            ts.append(time.perf_counter() - t0)
        ts.sort()
        v = round(ts[len(ts) // 2] * 1000, 3)
        derived["resident_ivf_100k_ms"] = v
        derived["resident_ivf_100k_qps"] = round(1000.0 / v, 1) if v else None
    except Exception as e:
        print(f"bench resident-ivf error: {e}", file=sys.stderr)

    # Resident-serving latency: the true architectural twin of the
    # reference's warm ivfflat number (index in process memory, no
    # per-query job). Build once via Spark, serve from numpy.
    try:
        from postgresml_spark.operators.similarity import ResidentANN
        from postgresml_spark.session import load_table

        emb = load_table(spark, sf_dir, "embeddings")
        qvs = [
            [float(x) for x in r["embedding"]]
            for r in emb.orderBy("vec_id").limit(64).collect()
        ]
        t0 = time.perf_counter()
        ridx = ResidentANN(emb)
        derived["resident_build_sec"] = round(time.perf_counter() - t0, 3)
        ridx.search(qvs[0], k=10)  # warm numpy/BLAS
        ts = []
        for qv in qvs:
            t0 = time.perf_counter()
            ridx.search(qv, k=10)
            ts.append(time.perf_counter() - t0)
        ts.sort()
        v = round(ts[len(ts) // 2] * 1000, 3)
        derived["resident_knn_ms"] = v
        derived["resident_knn_qps"] = round(1000.0 / v, 1) if v else None
    except Exception as e:
        print(f"bench resident error: {e}", file=sys.stderr)
    # The driver captures only the LAST 2000 chars of stdout and
    # json.loads that (BENCH_r01 parsed fine at <2000 chars; r02-r04
    # stored a truncated tail with parsed=null).  Emit ONE stdout line
    # guaranteed <=2000 bytes: headline + full derived + as many
    # per-query times (slowest first) as fit.  The complete per-query
    # map goes to BENCH_DETAIL.json next to this script.
    full = {
        "metric": "catalog_wall_clock",
        "value": round(total, 3),
        "unit": "sec",
        "sf": sf,
        "n_queries": len(times),
        "n_errors": sum(1 for v in times.values() if v < 0),
        "queries": times,
        "derived": derived,
        "derived_variance": variance,
    }
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_DETAIL.json")
    try:
        with open(detail_path, "w") as f:
            json.dump(full, f, indent=1, sort_keys=True)
    except OSError as e:
        print(f"bench detail write error: {e}", file=sys.stderr)

    budget = 2000
    line_obj = {
        k: v for k, v in full.items()
        if k not in ("queries", "derived_variance")
    }
    line_obj["detail"] = "BENCH_DETAIL.json"
    line_obj["queries"] = {}
    base_len = len(json.dumps(line_obj, separators=(",", ":")))
    remaining = budget - base_len - 2  # newline + slack
    picked: dict[str, float] = {}
    for name, t in sorted(times.items(), key=lambda kv: -kv[1]):
        entry_len = len(json.dumps({name: t}, separators=(",", ":"))) - 1
        if remaining - entry_len < 0:
            break
        picked[name] = t
        remaining -= entry_len
    line_obj["queries"] = {k: picked[k] for k in sorted(picked)}
    line = json.dumps(line_obj, separators=(",", ":"))
    if len(line) > budget:  # derived grew past the budget: shed queries, then qps
        line_obj["queries"] = {}
        line_obj["derived"] = {
            k: v for k, v in derived.items() if not k.endswith("_qps")
        }
        line = json.dumps(line_obj, separators=(",", ":"))
    print(line)
    spark.stop()
    return 0


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--serving-probe":
        raise SystemExit(serving_probe_main(*sys.argv[2:6]))
    raise SystemExit(main())
