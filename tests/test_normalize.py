import numpy as np
import pyarrow as pa
import ray.data as rd

from pgd_ray.graph.normalize import (
    canonicalize,
    dedup_edges,
    densify,
    normalize_edges,
    symmetrize,
    vertex_ids,
)


def _ds(src, dst):
    return rd.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    )


def _rows(ds):
    return sorted(map(tuple, ds.to_pandas()[["src", "dst"]].to_numpy()))


def test_canonicalize_drops_self_loops_and_orients():
    out = canonicalize(_ds([3, 5, 2, 9], [1, 5, 7, 9]))
    assert _rows(out) == [(1, 3), (2, 7)]


def test_dedup_exact():
    out = dedup_edges(canonicalize(_ds([1, 2, 2, 1, 3], [2, 1, 1, 2, 4])))
    assert _rows(out) == [(1, 2), (3, 4)]


def test_symmetrize():
    out = symmetrize(_ds([1], [2]))
    assert _rows(out) == [(1, 2), (2, 1)]


def test_dense_ids_sorted_order():
    eds = canonicalize(_ds([10, 30], [20, 10]))
    vids = vertex_ids(eds)
    assert list(vids) == [10, 20, 30]
    dense = densify(eds, vids)
    assert _rows(dense) == [(0, 1), (0, 2)]


def test_normalize_empty():
    out, vids = normalize_edges(_ds([], []))
    assert out.count() == 0
    assert len(vids) == 0


def test_reader_semantics(tmp_path):
    # comments, comma delim, 3rd (weight) column ignored, dup+loop removed
    from pgd_ray.sources.io import read_edge_list

    f = tmp_path / "g.csv"
    f.write_text("# comment\n% other\n1,2,9\n2,1,4\n3,3,1\n2,3,5\n")
    eds, vids = read_edge_list(f)
    assert list(vids) == [1, 2, 3]
    assert _rows(eds) == [(0, 1), (1, 2)]


def test_mtx_reader_matches_generic(tmp_path):
    from pgd_ray.sources.io import read_mtx

    f = tmp_path / "g.mtx"
    f.write_text("%%MatrixMarket matrix coordinate pattern symmetric\n3 3 3\n1 2\n2 3\n1 3\n")
    eds, vids = read_mtx(f)
    assert _rows(eds) == [(0, 1), (0, 2), (1, 2)]


def test_csr_checkpoint_roundtrip(tmp_path):
    from pgd_ray.graph.csr import CSRGraph, csr_from_edge_arrays

    src = np.array([0, 0, 1, 2])
    dst = np.array([1, 2, 3, 3])
    g = csr_from_edge_arrays(src, dst, n=4)
    p = tmp_path / "csr.parquet"
    g.write(p)
    h = CSRGraph.read(p)
    assert h.n == g.n and h.m == g.m
    assert (h.indptr == g.indptr).all() and (h.indices == g.indices).all()
    # build_csr resumes from the checkpoint without recomputing
    from pgd_ray.graph.csr import build_csr

    ds = rd.from_arrow(pa.table({"src": src, "dst": dst}))
    g2 = build_csr(ds, n=4, checkpoint=p)
    assert (g2.indices == g.indices).all()
