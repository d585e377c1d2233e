"""Fragment-backed graphlet kernels (graph.frag_kernel): bit-equality
with the broadcast kernels, with NO assembled whole-graph arrays — the
cluster-scale path for the signature workload (the reference shares one
in-RAM CSC across threads, graphlet_core.h:84-86; here the adjacency
stays range-partitioned and workers page fragments through an LRU)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray
import ray.data

from pgd_ray.graph.block_csr import build_range_csr
from pgd_ray.graph.frag_kernel import FragGraphletKernel, FragmentAdjacency
from pgd_ray.graph.graphlets import (
    GraphletKernel,
    edge_triangles,
    graphlet_macro,
    graphlet_micro,
    vertex_triangles,
)


def _random_graph(n=350, seed=0):
    rng = np.random.default_rng(seed)
    deg = np.minimum((rng.pareto(1.2, n) * 3 + 1).astype(int), n - 1)
    src = np.repeat(np.arange(n), deg)
    dst = rng.integers(0, n, len(src))
    keep = src != dst
    return src[keep], dst[keep]


@pytest.fixture(scope="module")
def frag_bundle(ray_session, tmp_path_factory):
    src, dst = _random_graph()
    pairs = ray.data.from_arrow(pa.table({"src": src, "dst": dst}))
    out = tmp_path_factory.mktemp("fragcsr")
    rcsr, _ = build_range_csr(pairs, n=350, num_ranges=7, out_dir=out)
    canon = rcsr.canonical_edges().materialize()
    return rcsr, canon


def test_fragment_macro_matches_broadcast(frag_bundle):
    rcsr, canon = frag_bundle
    # fragment path first: the RangeCSR's broadcast assembly must never
    # be triggered by it
    mac_f = graphlet_macro(canon, rcsr)
    assert rcsr._asm is None, "fragment kernel assembled the whole graph"
    mac_b = graphlet_macro(canon, rcsr.to_csr())
    assert mac_f.as_dict() == mac_b.as_dict()


def test_fragment_micro_and_triangles_match(frag_bundle):
    rcsr, canon = frag_bundle
    csr = rcsr.to_csr()
    for kw in ({"tailed_mode": "zero"}, {"tailed_mode": "micro"}):
        mf = (graphlet_micro(canon, rcsr, **kw).to_pandas()
              .sort_values(["src", "dst"]).reset_index(drop=True))
        mb = (graphlet_micro(canon, csr, **kw).to_pandas()
              .sort_values(["src", "dst"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(mf, mb)
    tf = (edge_triangles(canon, rcsr).to_pandas()
          .sort_values(["src", "dst"]).reset_index(drop=True))
    tb = (edge_triangles(canon, csr).to_pandas()
          .sort_values(["src", "dst"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(tf, tb)
    vf = (vertex_triangles(canon, rcsr).to_pandas()
          .sort_values("v").reset_index(drop=True))
    vb = (vertex_triangles(canon, csr).to_pandas()
          .sort_values("v").reset_index(drop=True))
    pd.testing.assert_frame_equal(vf, vb)


def test_fragment_kernel_bounded_cache_evicts_and_stays_exact(frag_bundle):
    """A cache budget far below the total fragment bytes forces
    eviction inside every batch — counts must not change."""
    rcsr, canon = frag_bundle
    csr = rcsr.to_csr()
    adj = FragmentAdjacency(rcsr.bounds, dict(rcsr.paths), rcsr.n,
                            cache_bytes=1 << 11)
    fk = FragGraphletKernel(adj, mode="micro", tailed_mode="micro")
    ir, xr = csr.put()
    bk = GraphletKernel(ir, xr, mode="micro", tailed_mode="micro")
    t = canon.to_pandas()
    batch = pa.table({"src": t["src"].to_numpy(), "dst": t["dst"].to_numpy()})
    pd.testing.assert_frame_equal(bk(batch).to_pandas(), fk(batch).to_pandas())
    # over-budget fragments evict everything else: at most ONE resident
    # fragment remains (the floor — a worker must hold what it reads)
    assert len(adj._cache) == 1


def test_fragment_adjacency_empty_ranges_and_degrees(frag_bundle):
    rcsr, _ = frag_bundle
    csr = rcsr.to_csr()
    assert (rcsr.degrees() == csr.degrees()).all()
    adj = FragmentAdjacency(rcsr.bounds, rcsr.fragment_refs(), rcsr.n)
    ws = np.array([0, rcsr.n - 1, 5, 5, 0], dtype=np.int64)
    vals, lens = adj.gather(ws)
    assert (lens == csr.degrees()[ws]).all()
    expect = np.concatenate([csr.neighbors(int(w)) for w in ws])
    assert (vals == expect).all()
