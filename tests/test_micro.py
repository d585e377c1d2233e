"""Per-edge micro counts vs the reference's committed golden matrix
(sample_graph.csv = a DD21-isomorphic graph with the reference
binary's per-edge outputs as columns 3-10; FIXTURES.md §3)."""

import numpy as np
import pandas as pd
import pytest

from pgd_ray.graph.csr import build_csr
from pgd_ray.graph.graphlets import graphlet_micro
from pgd_ray.sources.io import read_edge_list

GOLDEN = "/root/reference/sample_graph.csv"
COLS = ["triangle", "star2", "clique4", "chordal4", "tailed4", "cycle4", "star3", "path4"]


@pytest.mark.slow
def test_micro_matches_reference_golden():
    golden = pd.read_csv(
        GOLDEN, skiprows=1, header=None,
        names=["src", "dst", *COLS],
    )
    # run our engine ON the same file (cols 3+ ignored by the reader)
    eds, vids = read_edge_list(GOLDEN)
    eds = eds.materialize()
    csr = build_csr(eds, n=len(vids))
    micro = graphlet_micro(eds, csr, tailed_mode="zero", concurrency=(1, 4)).to_pandas()
    # file ids are contiguous → sorted dense relabel is an offset shift
    assert list(vids) == list(range(vids[0], vids[0] + len(vids)))
    micro["src"] = vids[micro["src"].to_numpy()]
    micro["dst"] = vids[micro["dst"].to_numpy()]
    g = golden.copy()
    lo = np.minimum(g["src"], g["dst"])
    hi = np.maximum(g["src"], g["dst"])
    g["src"], g["dst"] = lo, hi
    merged = micro.merge(g, on=["src", "dst"], suffixes=("", "_ref"))
    assert len(merged) == len(golden) == len(micro)
    for c in COLS:
        bad = merged[merged[c] != merged[f"{c}_ref"]]
        assert bad.empty, f"{c}: {len(bad)} mismatches, e.g.\n{bad.head(3)}"


def test_micro_internal_consistency():
    """chordal = C(tri,2) − clique and path = wv·wu − cycle per edge."""
    import pyarrow as pa
    import ray.data as rd

    from pgd_ray.graph.csr import csr_from_edge_arrays
    from tests.brute import random_graph

    edges = sorted(random_graph(12, 0.4, 9))
    src = np.array([a for a, b in edges])
    dst = np.array([b for a, b in edges])
    ds = rd.from_arrow(pa.table({"src": src, "dst": dst}))
    csr = csr_from_edge_arrays(src, dst, n=12)
    micro = graphlet_micro(ds, csr, tailed_mode="micro", concurrency=(1, 2)).to_pandas()
    deg = csr.degrees()
    dv = deg[micro["src"]]
    du = deg[micro["dst"]]
    tri = micro["triangle"]
    assert (micro["chordal4"] == tri * (tri - 1) // 2 - micro["clique4"]).all()
    assert (
        micro["path4"] == (dv - tri - 1) * (du - tri - 1) - micro["cycle4"]
    ).all()
    assert (micro["star2"] == dv + du - 2 * tri - 2).all()
