"""Block-structured CSR build (graph/block_csr.py): equivalence with
the in-memory constructor, the one-file-per-range resumable layout,
and the driver-materialization bound (the driver must only ever hold
the O(#ranges) manifest, never the edge stream)."""

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from pgd_ray.graph.block_csr import RangeCSR, build_range_csr
from pgd_ray.graph.csr import csr_from_edge_arrays
from pgd_ray.pipelines.graph_build import build_graph


def _rand_pairs(n, m, seed):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    return src, dst


def _pairs_ds(src, dst, blocks=8):
    t = pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    return rd.from_arrow(t).repartition(blocks)


def test_block_build_equals_in_memory_ctor(tmp_path):
    src, dst = _rand_pairs(200, 3000, seed=5)
    keep = src != dst
    lo = np.minimum(src[keep], dst[keep])
    hi = np.maximum(src[keep], dst[keep])
    uniq = np.unique(np.stack([lo, hi], axis=1), axis=0)
    ref = csr_from_edge_arrays(uniq[:, 0], uniq[:, 1], n=200)

    rcsr, _ = build_range_csr(
        _pairs_ds(src, dst), n=200, num_ranges=7, out_dir=tmp_path
    )
    got = rcsr.to_csr()
    assert got.n == ref.n and got.m == ref.m
    np.testing.assert_array_equal(got.indptr, ref.indptr)
    np.testing.assert_array_equal(got.indices, ref.indices)


def test_fragment_layout_and_canonical_roundtrip(tmp_path):
    src, dst = _rand_pairs(100, 800, seed=11)
    rcsr, _ = build_range_csr(_pairs_ds(src, dst), n=100, num_ranges=5, out_dir=tmp_path)
    # one parquet file per nonempty range, loadable independently
    assert len(list(tmp_path.glob("range=*.parquet"))) == len(rcsr.paths)
    total_nnz = 0
    for rid in rcsr.paths:
        v_lo, v_hi, indptr, indices = rcsr.fragment(rid)
        assert (v_lo, v_hi) == (rcsr.bounds[rid], rcsr.bounds[rid + 1])
        assert len(indptr) == v_hi - v_lo + 1
        assert indptr[-1] == len(indices)
        total_nnz += len(indices)
    assert total_nnz == 2 * rcsr.m
    # canonical_edges reproduces the exact deduped (src<dst) edge set
    keep = src != dst
    lo = np.minimum(src[keep], dst[keep])
    hi = np.maximum(src[keep], dst[keep])
    expected = set(map(tuple, np.unique(np.stack([lo, hi], axis=1), axis=0)))
    got = set(
        map(tuple, rcsr.canonical_edges().to_pandas()[["src", "dst"]].to_numpy())
    )
    assert got == expected


def test_driver_never_materializes_edge_stream(tmp_path, monkeypatch):
    """The scale contract: during the block build the driver pulls at
    most O(#ranges) rows (the manifest) — never the edges."""
    import ray.data.dataset as dsmod

    pulled = []
    orig = dsmod.Dataset.iter_internal_ref_bundles

    def counting(self, *a, **kw):
        for bundle in orig(self, *a, **kw):
            rows = bundle.num_rows()
            pulled.append(rows if rows is not None else 0)
            yield bundle

    monkeypatch.setattr(dsmod.Dataset, "iter_internal_ref_bundles", counting)
    src, dst = _rand_pairs(500, 20_000, seed=3)
    rcsr, _ = build_range_csr(
        _pairs_ds(src, dst, blocks=8), n=500, num_ranges=10, out_dir=tmp_path
    )
    assert rcsr.m > 5000  # sanity: the graph is much larger than the manifest
    assert sum(pulled) <= rcsr.num_ranges, (sum(pulled), rcsr.num_ranges)
    # the assembled arrays are plasma-backed views, not driver copies
    csr = rcsr.to_csr()
    assert not csr.indices.flags.writeable


def test_build_graph_dense_path(tmp_path):
    # gappy ids exercise the distinct+densify path
    src = np.array([1000, 7, 1000, 7, 55], dtype=np.int64)
    dst = np.array([7, 55, 55, 1000, 55], dtype=np.int64)
    ds, csr, vids = build_graph(_pairs_ds(src, dst, blocks=2), out_dir=str(tmp_path))
    assert vids.tolist() == [7, 55, 1000]
    assert csr.n == 3 and csr.m == 3
    rows = sorted(map(tuple, ds.to_pandas()[["src", "dst"]].to_numpy()))
    assert rows == [(0, 1), (0, 2), (1, 2)]


def test_empty_and_isolated_vertices(tmp_path):
    empty = rd.from_arrow(
        pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
    )
    rcsr, _ = build_range_csr(empty, n=4, out_dir=tmp_path)
    csr = rcsr.to_csr()
    assert csr.n == 4 and csr.m == 0
    assert csr.indptr.tolist() == [0, 0, 0, 0, 0]
    # isolated trailing vertex (n larger than max id + 1)
    one = _pairs_ds([0], [1], blocks=1)
    rcsr2, _ = build_range_csr(one, n=5, num_ranges=3, out_dir=tmp_path / "iso")
    csr2 = rcsr2.to_csr()
    assert csr2.n == 5 and csr2.m == 1
    assert csr2.indptr.tolist() == [0, 1, 2, 2, 2, 2]


def test_manifest_resume_skips_rebuild(tmp_path):
    """A completed build writes manifest.json LAST; a re-run with the
    same out_dir must resume from it WITHOUT touching the input."""
    src = np.array([1000, 7, 1000, 7, 55], dtype=np.int64)
    dst = np.array([7, 55, 55, 1000, 55], dtype=np.int64)
    rcsr, vids = build_range_csr(
        _pairs_ds(src, dst, blocks=2), dense=True, out_dir=tmp_path
    )
    assert (tmp_path / "manifest.json").exists()

    class Poison:  # any attribute access = the input was touched
        def __getattr__(self, name):
            raise AssertionError("resume path read the input dataset")

    rcsr2, vids2 = build_range_csr(Poison(), dense=True, out_dir=tmp_path)
    assert rcsr2.n == rcsr.n and rcsr2.m == rcsr.m
    assert rcsr2.bounds.tolist() == rcsr.bounds.tolist()
    assert rcsr2.nnz == rcsr.nnz and rcsr2.paths == rcsr.paths
    assert vids2.tolist() == vids.tolist() == [7, 55, 1000]
    a, b = rcsr.to_csr(), rcsr2.to_csr()
    assert a.indptr.tolist() == b.indptr.tolist()
    assert a.indices.tolist() == b.indices.tolist()

    # a missing fragment invalidates the manifest: full rebuild works
    victim = next(iter(rcsr.paths.values()))
    import os

    os.remove(victim)
    rcsr3, _ = build_range_csr(
        _pairs_ds(src, dst, blocks=2), dense=True, out_dir=tmp_path
    )
    assert rcsr3.m == rcsr.m
    assert rcsr3.to_csr().indices.tolist() == a.indices.tolist()


def test_multigraph_build_keeps_duplicates(ray_session):
    import ray

    from pgd_ray.graph.csr import build_csr

    # edge (0,1) x3, (1,2) x1 — dedup=False keeps multiplicity
    t = pa.table({"src": np.array([0, 0, 0, 1], np.int64),
                  "dst": np.array([1, 1, 1, 2], np.int64)})
    g = build_csr(ray.data.from_arrow(t), n=3, dedup=False)
    assert list(np.diff(g.indptr)) == [3, 4, 1]  # weighted degrees
    assert list(g.indices[:3]) == [1, 1, 1]
    gd = build_csr(ray.data.from_arrow(t), n=3, dedup=True)
    assert list(np.diff(gd.indptr)) == [1, 2, 1]


def test_weighted_pagerank_matches_dense(ray_session):
    import ray

    from pgd_ray.graph.csr import build_csr
    from pgd_ray.graph.iterative import IterativeEngine

    rng = np.random.default_rng(6)
    n = 25
    W = np.zeros((n, n), np.int64)
    for _ in range(60):
        a, b = rng.integers(0, n, 2)
        if a != b:
            W[min(a, b), max(a, b)] += 1
    src, dst = np.nonzero(W)
    exp_src = np.repeat(src, W[src, dst])
    exp_dst = np.repeat(dst, W[src, dst])
    g = build_csr(ray.data.from_arrow(pa.table(
        {"src": exp_src, "dst": exp_dst})), n=n, dedup=False)

    base = 0.15 / n
    eng = IterativeEngine(g, "pagerank", n_workers=3)
    x, _ = eng.run(np.full(n, 1.0 / n),
                   lambda s: {"base": base, "alpha": 0.85},
                   lambda d: False, 32)

    A = (W + W.T).astype(np.float64)
    wdeg = np.maximum(A.sum(1), 1.0)
    r = np.full(n, 1.0 / n)
    for _ in range(32):
        r = base + 0.85 * (A.T @ (r / wdeg))
    assert np.allclose(x, r, atol=1e-9)
