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


def test_vertex_id_map_matches_broadcast_path():
    """Distributed dense-id assignment (sort + block dedup + O(#blocks)
    offsets + two hash joins) must equal the broadcast searchsorted
    path exactly — same (v, new_id) map, same remapped edges."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from pgd_ray.graph.normalize import normalize_edges

    rng = np.random.default_rng(11)
    # gappy, 1-based-ish, duplicated, self-loopy raw ids
    src = rng.choice([3, 17, 17, 40, 1000, 5, 900], 400)
    dst = rng.choice([3, 17, 40, 1000, 5, 900, 7777], 400)
    raw = rd.from_arrow(pa.table({"src": src.astype(np.int64),
                                  "dst": dst.astype(np.int64)})).repartition(8)
    eb, vids = normalize_edges(raw, dense=True)
    ed, vmap = normalize_edges(raw, dense=True, id_strategy="distributed")
    a = eb.to_pandas().sort_values(["src", "dst"], ignore_index=True)
    b = ed.to_pandas().sort_values(["src", "dst"], ignore_index=True)
    assert a.equals(b.astype(a.dtypes.to_dict()))
    m = vmap.to_pandas().sort_values("v", ignore_index=True)
    assert np.array_equal(m["v"].to_numpy(np.int64), vids)
    assert np.array_equal(m["new_id"].to_numpy(np.int64),
                          np.arange(len(vids)))


def test_vertex_id_map_driver_bound(monkeypatch):
    """The distributed id path must never pull vertex/edge ROWS into
    driver memory: the driver-materialization APIs are forbidden for
    the duration, and every object the driver ray.get()s must be a
    per-block scalar/summary, never a row table.  (to_arrow_refs is
    allowed — it yields refs, not data.)"""
    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data as rd
    import ray.data.dataset as dsmod

    from pgd_ray.graph.normalize import (canonicalize, dedup_edges,
                                         densify_distributed,
                                         vertex_id_map)

    rng = np.random.default_rng(5)
    src = rng.integers(0, 3000, 20_000).astype(np.int64)
    dst = rng.integers(0, 3000, 20_000).astype(np.int64)
    edges = dedup_edges(canonicalize(
        rd.from_arrow(pa.table({"src": src, "dst": dst}))
        .repartition(8))).materialize()

    def forbidden(self, *a, **kw):
        raise AssertionError("driver materialization API called")

    for api in ("to_pandas", "take_all", "take", "iter_batches",
                "iter_rows"):
        monkeypatch.setattr(dsmod.Dataset, api, forbidden)

    got_tables = []
    orig_get = ray.get

    def checking_get(refs, *a, **kw):
        out = orig_get(refs, *a, **kw)
        for o in out if isinstance(out, list) else [out]:
            if isinstance(o, pa.Table):
                got_tables.append(o.num_rows)
        return out

    monkeypatch.setattr(ray, "get", checking_get)
    vmap, n = vertex_id_map(edges)
    out = densify_distributed(edges, vmap, num_partitions=8).materialize()
    monkeypatch.undo()
    assert n == 3000 and out.count() > 10_000  # real work happened
    # the only row-shaped fetches are Ray's own sort-boundary SAMPLES:
    # O(#blocks) tables of ~10 rows each — never the vertex/edge table
    assert len(got_tables) <= 16, got_tables
    assert all(r <= 100 for r in got_tables), got_tables
    assert sum(got_tables) < 3000 / 2, got_tables
