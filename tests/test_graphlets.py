"""Macro graphlet parity: reference tiny goldens (FIXTURES.md §2),
property tests vs the brute-force enumerator, and the full DD21 golden."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from pgd_ray.graph.csr import build_csr, csr_from_edge_arrays
from pgd_ray.graph.graphlets import MACRO_KEYS, graphlet_macro, macro_from_partials
from pgd_ray.sources.io import read_graph
from tests.brute import brute_counts, random_graph

DD21 = {
    "total_2_1edge": 14267, "total_2_indep": 16502611, "total_3_tris": 9286,
    "total_2_star": 35397, "total_3_1edge": 81879530, "total_3_indep": 31553402783,
    "total_4_clique": 2116, "total_4_chordcycle": 9925, "total_4_tailed_tris": 41154,
    "total_4_cycle": 1267, "total_3_star": 13838, "total_4_path": 88568,
    "total_4_1edge": 234712803384, "total_4_2edge": 101544802,
    "total_4_2star": 203029889, "total_4_tri": 53278602,
    "total_4_indep": 45201167584460,
}


def _macro_from_arrays(src, dst, n):
    ds = rd.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    )
    csr = csr_from_edge_arrays(np.asarray(src), np.asarray(dst), n=n)
    return graphlet_macro(ds, csr, concurrency=(1, 2))


def test_k4_golden():
    mac = _macro_from_arrays([0, 0, 0, 1, 1, 2], [1, 2, 3, 2, 3, 3], 4)
    assert mac["total_4_clique"] == 1
    assert mac["total_3_tris"] == 4
    assert mac["total_2_1edge"] == 6
    assert mac["total_2_indep"] == 0


def test_chordal_golden():
    mac = _macro_from_arrays([0, 0, 0, 1, 2], [1, 2, 3, 2, 3], 5)
    assert mac["total_3_tris"] == 2
    assert mac["total_2_star"] == 2
    assert mac["total_4_chordcycle"] == 1
    assert mac["total_2_indep"] == 1 + 4  # n=5: C(5,2)-5=5


@pytest.mark.parametrize("seed,p", [(1, 0.3), (2, 0.5), (3, 0.7), (4, 0.15)])
def test_property_vs_bruteforce(seed, p):
    n = 11
    edges = random_graph(n, p, seed)
    if not edges:
        pytest.skip("empty graph")
    src = [a for a, b in edges]
    dst = [b for a, b in edges]
    mac = _macro_from_arrays(src, dst, n)
    exp = brute_counts(n, edges)
    for k in MACRO_KEYS:
        assert mac[k] == exp[k], f"{k}: got {mac[k]} want {exp[k]} (seed={seed})"


@pytest.mark.slow
def test_dd21_full_golden():
    eds, vids = read_graph("/root/reference/data/DD21.mtx")
    eds = eds.materialize()
    csr = build_csr(eds, n=len(vids))
    mac = graphlet_macro(eds, csr, concurrency=(1, 4))
    for k, v in DD21.items():
        assert mac[k] == v, k


def test_kernel_paths_agree():
    """Differential: dense-matrix, vectorized-searchsorted and the
    per-edge loop paths must produce identical micro tables."""
    import pyarrow as pa

    from pgd_ray.graph.graphlets import GraphletKernel

    rng = np.random.default_rng(17)
    for _ in range(3):
        n = 50
        mask = np.triu(rng.random((n, n)) < 0.25, 1)
        src, dst = np.nonzero(mask)
        csr = csr_from_edge_arrays(src.astype(np.int64), dst.astype(np.int64), n=n)
        refs = csr.put()
        batch = pa.table({"src": src.astype(np.int64), "dst": dst.astype(np.int64)})
        outs = []
        for dense, vec in [(True, True), (False, True), (False, False)]:
            k = GraphletKernel(*refs, mode="micro", tailed_mode="micro")
            k.dense = dense and k.dense
            k.vectorized = vec
            if not dense and k.dense:
                k.dense = False
            outs.append(k(batch).to_pandas())
        assert outs[0].equals(outs[1])
        assert outs[1].equals(outs[2])


def test_identities_and_gfd():
    from pgd_ray.graph.graphlets import check_identities, gfd

    mac = _macro_from_arrays([0, 0, 0, 1, 1, 2, 3], [1, 2, 3, 2, 3, 3, 4], 6)
    res = check_identities(mac)
    assert all(v == 0 for v in res.values()), res
    g = gfd(mac, "all")
    assert abs(g.sum() - 1.0) < 1e-12
    assert len(gfd(mac, "connected")) == 6
    assert len(gfd(mac, "disconnected")) == 5


def test_hub_skew_star_plus_clique():
    """Skew mitigation: a 20k-spoke hub star welded to a K6 clique.
    The hub edge volume is pathological (one vertex touches every
    spoke), exercising the adaptive heavy-edge routing; counts have a
    closed form, so correctness and termination are both checked."""
    h = 20_000  # hub spokes
    k = 6       # clique vertices (ids h+1 .. h+6); hub is vertex 0
    cl = [(h + a, h + b) for a in range(1, k + 1) for b in range(a + 1, k + 1)]
    src = np.array([0] * h + [a for a, _ in cl] + [0] * k, np.int64)
    dst = np.array(list(range(1, h + 1)) + [b for _, b in cl]
                   + [h + i for i in range(1, k + 1)], np.int64)
    n = h + k + 1
    mobj = _macro_from_arrays(src, dst, n)
    mac = mobj.counts
    import math
    C = math.comb
    # hub joins every clique vertex, so triangles = C(k,2) (inside K6,
    # which is K7 with the hub) ... the hub+K6 form K7; spokes add none.
    assert mac["total_3_tris"] == C(7, 3)
    assert mac["total_4_clique"] == C(7, 4)
    d0 = h + k  # hub degree
    assert mac["total_2_1edge"] == h + C(k, 2) + k
    assert mobj.total_wedges == C(d0, 2) + k * C(6, 2)


def test_forman_curvature_closed_forms():
    # K4: every edge deg 3/3, tri 2 -> F = 4-3-3+6 = 4
    # P3 path 0-1-2: edges deg (1,2) tri 0 -> F = 4-1-2 = 1
    import numpy as np
    import __ray_entry__ as em

    # use the query on real data for shape; closed forms via brute here
    import pyarrow.parquet as pq
    out = em.queries()["forman_curvature"]("/root/testdata/sf0.001")
    assert {"src", "dst", "curvature"} <= set(out.columns)
    # cross-check a sample against degrees/triangles from the oracle
    import duckdb
    con = duckdb.connect()
    for t in ["lineitem"]:
        con.sql(f"CREATE VIEW {t} AS FROM '/root/testdata/sf0.001/{t}.parquet'")
    ora = con.sql(em.oracle_sql()["forman_curvature"]).df()
    m = out.merge(ora, on=["src", "dst"], suffixes=("", "_o"))
    assert len(m) == len(out)
    assert (m["curvature"] == m["curvature_o"]).all()
