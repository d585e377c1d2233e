"""Flagship pipeline (north rule): transcripts → edge table → CSR →
PageRank + triangle counts + connected components, one summary row per
vertex.

This is the pipeline ``__ray_entry__.entry()`` smoke-runs at sf0.001
and ``bench.py`` times at sf0.1: read_parquet → map_batches edge
extraction → groupby dedup → distributed CSR → kernel actor pool
(triangles) + iterative rounds (PageRank, CC).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
import ray.data

from pgd_ray.graph.csr import CSRGraph, build_csr
from pgd_ray.graph.graphlets import MacroCounts, graphlet_macro
from pgd_ray.graph.iterative import connected_components, pagerank
from pgd_ray.sources.edges import edges_from_transcripts
from pgd_ray.sources.transcripts import derive_transcripts


@dataclass
class GraphBundle:
    edges: ray.data.Dataset  # canonical, materialized
    csr: CSRGraph
    vids: np.ndarray | None


def graph_from_edges(edge_ds: ray.data.Dataset, dense: bool = True) -> GraphBundle:
    from pgd_ray.graph.normalize import normalize_edges

    eds, vids = normalize_edges(edge_ds, dense=dense)
    eds = eds.materialize()
    n = len(vids) if vids is not None else None
    return GraphBundle(edges=eds, csr=build_csr(eds, n=n), vids=vids)


def flagship(
    sf_dir: str,
    n_workers: int = 8,
    pr_tol: float = 1e-10,
    checkpoint_dir: str | None = None,
) -> tuple[pd.DataFrame, MacroCounts]:
    """Returns (per-vertex summary frame, macro graphlet counts).

    Summary columns: tool_id, pagerank, component, degree.
    """
    tds = derive_transcripts(sf_dir)
    eds = edges_from_transcripts(tds).materialize()
    csr = build_csr(eds)
    n = csr.n
    pr = pagerank(csr, tol=pr_tol, n_workers=n_workers,
                  checkpoint_dir=checkpoint_dir)
    comp = connected_components(csr, n_workers=n_workers)
    mac = graphlet_macro(eds, csr, concurrency=(1, n_workers))
    deg = csr.degrees()
    out = pd.DataFrame(
        {
            "tool_id": np.arange(n, dtype=np.int64),
            "pagerank": np.round(pr, 12),
            "component": comp.astype(np.int64),
            "degree": deg.astype(np.int64),
        }
    )
    return out, mac
