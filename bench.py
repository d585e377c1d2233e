"""Benchmark harness — north-rule metric: edges/sec per
PageRank+triangle-count iteration on the transcript/TPC-H-derived edge
table, at two parallelism levels for the scaling criterion.

    python bench.py              # one JSON line (headline timings)
    python bench.py --scaling    # run at 8 and 32 CPUs in fresh
                                 # processes, report scaling efficiency

Env: GRAFT_SF_DIR (default /root/testdata/sf0.1),
     RAY_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import logging
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def run_bench() -> dict:
    import numpy as np
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from pgd_ray.graph.csr import build_csr  # (transcript graph below)
    from pgd_ray.graph.graphlets import edge_triangles, graphlet_macro
    from pgd_ray.graph.iterative import (
        IterativeEngine,
        connected_components,
        kill_pool,
        worker_pool,
    )
    from pgd_ray.pipelines.graph_build import build_graph
    from pgd_ray.sources.edges import copurchase_pairs, edges_from_transcripts
    from pgd_ray.sources.transcripts import derive_transcripts

    timings: dict[str, float] = {}
    nw = NUM_CPUS

    # warm the page cache so we measure compute+shuffle, not cold disk
    import pyarrow.parquet as pq

    pq.read_table(f"{SF_DIR}/lineitem.parquet")

    # q1: edge ETL — lineitem → co-purchase edges → dense ids → CSR
    t0 = time.perf_counter()
    dense, csr, vids = build_graph(copurchase_pairs(SF_DIR))
    timings["edge_etl"] = time.perf_counter() - t0
    m = csr.m
    pool = worker_pool(csr, nw)  # shared across PR + CC (startup amortized)

    # q2: PageRank (the north-rule iterative engine)
    t0 = time.perf_counter()
    eng = IterativeEngine(csr, "pagerank", n_workers=nw, workers=pool)
    deg = csr.degrees()
    dangling = deg == 0
    n = csr.n

    def extras(state):
        d = float(state[dangling].sum()) if dangling.any() else 0.0
        return {"alpha": 0.85, "base": 0.15 / n + 0.85 * d / n}

    state, iters = eng.run(np.full(n, 1.0 / n), extras, lambda d: d < 1e-10, 200)
    timings["pagerank"] = time.perf_counter() - t0
    pr_iter_sec = float(np.mean([mm["sec"] for mm in eng.metrics])) if eng.metrics else 0.0

    # q3: triangle counting (per-edge, full pass)
    t0 = time.perf_counter()
    tri_total = 0
    for b in edge_triangles(dense, csr, concurrency=(1, nw)).iter_batches(
        batch_size=1 << 18, batch_format="pyarrow"
    ):
        tri_total += int(b["triangle"].to_numpy(zero_copy_only=False).sum())
    tri_total //= 3
    timings["triangle_count"] = time.perf_counter() - t0

    # q4: connected components
    t0 = time.perf_counter()
    connected_components(csr, n_workers=nw, workers=pool)
    timings["connected_components"] = time.perf_counter() - t0
    kill_pool(pool)

    # q5: transcript pipeline (events → transcripts → tool graph → macro)
    t0 = time.perf_counter()
    tds = derive_transcripts(SF_DIR)
    teds = edges_from_transcripts(tds).materialize()
    tcsr = build_csr(teds)
    graphlet_macro(teds, tcsr, concurrency=(1, nw))
    timings["transcript_graphlets"] = time.perf_counter() - t0

    total = sum(timings.values())
    # north-rule throughput: edges/sec per (PageRank iteration + triangle pass)
    per_iter = pr_iter_sec + timings["triangle_count"] / max(iters, 1)
    result = {
        "metric": "sec total headline suite (copurchase graph: ETL+PR+tri+CC, transcript graphlets)",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "graph": {"n": int(csr.n), "m": int(m), "triangles": int(tri_total)},
        "pagerank_iters": int(iters),
        "pagerank_sec_per_iter": round(pr_iter_sec, 4),
        "edges_per_sec_per_pr_iter": int(m / pr_iter_sec) if pr_iter_sec else None,
        "edges_per_sec_triangles": int(m / timings["triangle_count"]),
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo_cpu, hi_cpu = 8, 32
    lo = one(lo_cpu)
    hi = one(hi_cpu)
    # throughput scaling on the compute-bound stages (PR iteration + triangles)
    thr_lo = lo["edges_per_sec_per_pr_iter"] + lo["edges_per_sec_triangles"]
    thr_hi = hi["edges_per_sec_per_pr_iter"] + hi["edges_per_sec_triangles"]
    eff = (thr_hi / thr_lo) / (hi_cpu / lo_cpu)
    return {
        "metric": "scaling efficiency (8 → 32 CPUs, fresh ray.init each)",
        "cpus": [lo_cpu, hi_cpu],
        "sec": [lo["value"], hi["value"]],
        "edges_per_sec_per_pr_iter": [lo["edges_per_sec_per_pr_iter"], hi["edges_per_sec_per_pr_iter"]],
        "edges_per_sec_triangles": [lo["edges_per_sec_triangles"], hi["edges_per_sec_triangles"]],
        "throughput_scaling_efficiency": round(eff, 3),
        "sf": SF_DIR,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
