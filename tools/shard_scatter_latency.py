"""4-shard scatter latency ≈ max(shard) + merge, not sum (VERDICT r6 #2).

Round 6 shipped doc-hash scatter-gather serving but looped shards
sequentially, so a query's latency was sum(shards) — correct, yet it
defeated the point of sharding on a multi-core host. Round 7 fans the
scatter out on a cached thread pool (the per-shard work is numpy/BLAS,
which releases the GIL). This tool records the evidence:

  - single:      one resident index over the full corpus
  - shard_solo:  median per-shard latency measured one shard at a time
  - scatter:     the 4-shard ShardedPipelineIndex scatter-gather

Done-bar: scatter ≈ shard_solo + merge (a small constant), NOT
4 x shard_solo; and scatter beats the single big index (ANN/matvec work
is superlinear-in-rows enough that 4 quarter-scans win).

Run SOLO (BLAS threads skew under load): python tools/shard_scatter_latency.py
Writes tools/shard_scatter_latency.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from postgresml_spark.collections.serving import (  # noqa: E402
    ServedPipelineIndex,
    ShardedPipelineIndex,
)


def exact_doc_top10(mat, doc_ids, qs):
    """Brute-force float64 per-doc best-chunk cosine top-10 — the
    ground truth the sharded/single ANN recalls are judged against
    (VERDICT r7 next #4: two approximations compared to each other
    say nothing about what sharding costs or gains in recall)."""
    norms = np.linalg.norm(mat.astype(np.float64), axis=1)
    norms[norms == 0.0] = 1.0
    perm = np.argsort(doc_ids, kind="stable")
    ds = doc_ids[perm]
    uniq, starts = np.unique(ds, return_index=True)
    truth = []
    for q in qs:
        q64 = q.astype(np.float64)
        qn = np.linalg.norm(q64) or 1.0
        s = (mat.astype(np.float64) @ q64) / (norms * qn)
        best = np.maximum.reduceat(s[perm], starts)
        top = np.lexsort((uniq, -best))[:10]
        truth.append(set(int(d) for d in uniq[top]))
    return truth


def build_sharded(chunk_ids, doc_ids, mat, embed, n_shards,
                  lists, probes):
    shard_of = doc_ids % n_shards
    shards = []
    for i in range(n_shards):
        m = shard_of == i
        s = ServedPipelineIndex.from_arrays(
            chunk_ids[m], doc_ids[m], mat[m], embed,
            kind="ivfflat", params={"lists": lists, "probes": probes},
        )
        s.hnsw
        shards.append(s)
    sharded = ShardedPipelineIndex.__new__(ShardedPipelineIndex)
    sharded.n_shards = n_shards
    sharded.field = "_arrays_"
    sharded.shards = shards
    return sharded


def build(n_chunks=1_000_000, dim=256, n_shards=4, seed=11):
    # 70% clustered + 30% diffuse (the hybrid agreement tool's corpus
    # shape) with center-perturbed queries, so the reported top-10
    # agreement measures shard-vs-single ANN parity on queries that
    # MATCH something, not recall on pure noise
    rng = np.random.default_rng(seed)
    n_clusters = max(64, n_chunks // 1000)
    centers = rng.normal(size=(n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    k_cl = int(n_chunks * 0.7)
    mat = np.empty((n_chunks, dim), dtype=np.float32)
    cl = rng.integers(0, n_clusters, size=k_cl)
    step = 1 << 16
    for lo in range(0, k_cl, step):
        hi = min(lo + step, k_cl)
        mat[lo:hi] = centers[cl[lo:hi]] + rng.normal(
            scale=0.05, size=(hi - lo, dim))
    mat[k_cl:] = rng.normal(size=(n_chunks - k_cl, dim))
    chunk_ids = np.arange(n_chunks, dtype=np.int64)
    doc_ids = rng.integers(0, n_chunks // 4, size=n_chunks)
    qs = centers[rng.integers(0, n_clusters, size=24)] + rng.normal(
        scale=0.15, size=(24, dim))
    embed = lambda q: qs[int(q[1:])]  # noqa: E731

    single = ServedPipelineIndex.from_arrays(
        chunk_ids, doc_ids, mat, embed,
        kind="ivfflat", params={"lists": 256, "probes": 32},
    )
    single.hnsw
    # doc-hash split: the same modular placement ShardedPipelineIndex
    # applies inside its Spark build plan. Per-shard lists/probes scale
    # ~1/sqrt(shards) (cell SIZE stays within ~2x of the single
    # index's — a lists=256-per-shard variant with the same probe
    # count measured WORSE recall from finer/noisier cells, r9). The
    # 1/sqrt probe-count cut is what the r8 run showed as a 0.096
    # recall cliff at 4 shards (VERDICT r8 next #1); the scatter's
    # auto widen=sqrt(n) (ShardedPipelineIndex.search) restores the
    # single-index probe COUNT while each shard still scans ~1/sqrt(n)
    # of the single index's rows.
    sharded = build_sharded(chunk_ids, doc_ids, mat, embed, n_shards,
                            lists=128, probes=16)
    sharded2 = build_sharded(chunk_ids, doc_ids, mat, embed, 2,
                             lists=192, probes=24)
    truth = exact_doc_top10(mat, doc_ids, qs)
    return single, sharded, sharded2, truth, len(qs)


def median_ms(fn, n_queries, reps=3):
    ts = []
    for _ in range(reps):
        for i in range(n_queries):
            t0 = time.perf_counter()
            fn(f"q{i}")
            ts.append(time.perf_counter() - t0)
    ts.sort()
    return round(ts[len(ts) // 2] * 1000, 2)


def main():
    n_chunks = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    single, sharded, sharded2, truth, nq = build(n_chunks)
    out = {
        "n_chunks": n_chunks, "dim": 256, "n_shards": sharded.n_shards,
        "blas_threads": os.environ.get("OPENBLAS_NUM_THREADS", "default"),
    }

    # warm
    single.search("q0", limit=10)
    sharded.search("q0", limit=10)
    [s.search("q0", limit=10) for s in sharded.shards]

    out["single_search_ms"] = median_ms(
        lambda q: single.search(q, limit=10), nq)
    out["shard_solo_search_ms"] = median_ms(
        lambda q: sharded.shards[0].search(q, limit=10), nq)
    out["scatter_search_ms"] = median_ms(
        lambda q: sharded.search(q, limit=10), nq)

    out["single_matvec_ms"] = median_ms(
        lambda q: single.best_chunk_scores(q), nq)
    out["shard_solo_matvec_ms"] = median_ms(
        lambda q: sharded.shards[0].best_chunk_scores(q), nq)
    out["scatter_matvec_ms"] = median_ms(
        lambda q: sharded.best_chunk_scores(q), nq)

    # agreement vs the single index (exact identity needs probes==lists
    # — that's the pytest closure suite's job; here the indexes are ANN
    # configs, so report top-10 doc agreement instead)
    agree = []
    for i in range(nq):
        one = {r["document_id"] for r in single.search(f"q{i}", limit=10)}
        two = {r["document_id"] for r in sharded.search(f"q{i}", limit=10)}
        agree.append(len(one & two) / max(len(one), 1))
    out["search_agreement_at_10"] = round(float(np.mean(agree)), 4)

    # recall@10 vs brute-force exact truth per shard count (VERDICT r7
    # next #4): states what sharding COSTS or GAINS in recall, instead
    # of comparing two approximations to each other. Smaller per-shard
    # graphs navigate better, so sharding plausibly gains.
    def recall_at_10(idx):
        rs = []
        for i in range(nq):
            got = {r["document_id"] for r in idx.search(f"q{i}", limit=10)}
            rs.append(len(got & truth[i]) / max(len(truth[i]), 1))
        return round(float(np.mean(rs)), 4)

    out["recall_vs_exact"] = {
        "single": recall_at_10(single),
        "shards_2": recall_at_10(sharded2),
        "shards_4": recall_at_10(sharded),
    }
    out["scatter_vs_sum_matvec"] = round(
        out["scatter_matvec_ms"]
        / (sharded.n_shards * out["shard_solo_matvec_ms"]), 3)

    if os.environ.get("SHARD_SCATTER_CHILD"):
        print("CHILD_JSON:" + json.dumps(out))
        return

    # second leg: per-call BLAS capped to 1 thread — the serving-tier
    # config (multi-tenant hosts cap BLAS so queries don't stampede all
    # cores). Default machine-wide BLAS already saturates DRAM per
    # call, so the scatter pool's win shows in THIS regime: expected
    # scatter ~= max(shard)+merge, serial loop ~= sum(shards).
    import subprocess

    env = dict(os.environ, OPENBLAS_NUM_THREADS="1",
               SHARD_SCATTER_CHILD="1")
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), str(n_chunks)],
        env=env, capture_output=True, text=True, timeout=1800,
    )
    child = None
    for line in proc.stdout.splitlines():
        if line.startswith("CHILD_JSON:"):
            child = json.loads(line[len("CHILD_JSON:"):])
    result = {"blas_default": out, "blas_1_thread": child}
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "shard_scatter_latency.json"), "w") as f:
        json.dump(result, f)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
