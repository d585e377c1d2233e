"""Orderings, writers, univar stats."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from pgd_ray.functions.ordering import ORDERINGS, sort_edges
from pgd_ray.graph.csr import csr_from_edge_arrays
from pgd_ray.graph.graphlets import graphlet_micro
from pgd_ray.stages.univar import univar_stats
from pgd_ray.stages.writers import MICRO_HEADER, write_macro_stats, write_micro_csv


def _graph():
    src = np.array([0, 0, 0, 1, 1, 2])
    dst = np.array([1, 2, 3, 2, 3, 3])
    ds = rd.from_arrow(pa.table({"src": src, "dst": dst}))
    return ds, csr_from_edge_arrays(src, dst, n=4)


def test_all_orderings_run_and_are_deterministic():
    ds, csr = _graph()
    for strat in ORDERINGS:
        a = sort_edges(ds, csr, strat).to_pandas()
        b = sort_edges(ds, csr, strat).to_pandas()
        assert a.equals(b), strat
        assert len(a) == 6


def test_degree_ordering_descending():
    ds, csr = _graph()
    out = sort_edges(ds, csr, "degree").to_pandas()
    assert (np.diff(out["key"].to_numpy()) <= 0).all()


def test_micro_csv_golden_format(tmp_path):
    ds, csr = _graph()
    micro = graphlet_micro(ds, csr, concurrency=(1, 2))
    p = tmp_path / "micro.csv"
    write_micro_csv(micro, p, degree_vec=csr.degrees())
    lines = p.read_text().strip().splitlines()
    assert lines[0] == MICRO_HEADER
    assert len(lines) == 7
    first = lines[1].split(",")
    assert len(first) == 10
    # 1-based ids (SURVEY.md Q7)
    ids = {int(l.split(",")[0]) for l in lines[1:]} | {int(l.split(",")[1]) for l in lines[1:]}
    assert min(ids) == 1 and max(ids) == 4


def test_write_macro_stats(tmp_path):
    from pgd_ray.graph.graphlets import graphlet_macro

    ds, csr = _graph()
    mac = graphlet_macro(ds, csr, concurrency=(1, 2))
    p = tmp_path / "macro.txt"
    write_macro_stats(mac, p)
    text = p.read_text()
    assert "total_4_clique = 1" in text
    assert len(text.strip().splitlines()) == 17


def test_univar_stats_quantile_rule():
    # reference index rule: med_idx=floor(n/2), Q1=arr[med-floor(n/4)]
    vals = np.array([5, 1, 9, 3, 7, 2, 8, 4], dtype=np.int64)  # n=8
    ds = rd.from_arrow(pa.table({"x": vals}))
    st = univar_stats(ds, "x")
    arr = np.sort(vals)
    assert st["n"] == 8
    assert st["min"] == 1 and st["max"] == 9
    assert st["median"] == (arr[3] + arr[4]) / 2
    assert st["q1"] == arr[4 - 2] and st["q3"] == arr[4 + 2]
    assert abs(st["mean"] - vals.mean()) < 1e-12


def test_order_vertex_neighbors_semantics_and_invariance():
    """O4 (graphlet_core.cpp:1910-1953): per-vertex neighbor ordering
    by degree/kcore/rand — scheduling-only; graphlet counts must be
    invariant (the kernel re-normalizes internally)."""
    import ray

    from pgd_ray.functions.ordering import order_vertex_neighbors
    from pgd_ray.graph.csr import csr_from_edge_arrays
    from pgd_ray.graph.graphlets import GraphletKernel
    from tests.brute import random_graph

    edges = sorted(random_graph(40, 0.2, seed=6))
    src = np.array([a for a, b in edges])
    dst = np.array([b for a, b in edges])
    csr = csr_from_edge_arrays(src, dst, n=40)
    deg = csr.degrees()

    ordered = order_vertex_neighbors(csr, "degree", descending=True)
    # same neighbor SETS, degree-descending within each vertex
    for v in range(40):
        a = np.sort(csr.neighbors(v))
        b = ordered.neighbors(v)
        assert np.array_equal(a, np.sort(b))
        keys = deg[b]
        assert (np.diff(keys) <= 0).all()
    # s2l_neigh (ascending) flips the order
    asc = order_vertex_neighbors(csr, "degree", descending=False)
    for v in range(40):
        assert (np.diff(deg[asc.neighbors(v)]) >= 0).all()
    # rand is deterministic
    r1 = order_vertex_neighbors(csr, "rand", seed=7)
    r2 = order_vertex_neighbors(csr, "rand", seed=7)
    assert np.array_equal(r1.indices, r2.indices)

    # counts invariant: kernel consumes the REORDERED csr directly
    # (the neighbors_sorted=False flag triggers its re-normalization,
    # threaded automatically by _kernel_stage from csr.neighbors_sorted)
    assert ordered.neighbors_sorted is False
    k_plain = GraphletKernel(*csr.put(), mode="macro")
    k_ord = GraphletKernel(*ordered.put(), mode="macro",
                           neighbors_sorted=ordered.neighbors_sorted)
    t1 = k_plain._edge_counts(src.astype(np.int64), dst.astype(np.int64))
    t2 = k_ord._edge_counts(src.astype(np.int64), dst.astype(np.int64))
    for a, b in zip(t1[:4], t2[:4]):
        assert np.array_equal(a, b)


def test_cms_overestimates_and_is_tight_when_wide():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from pgd_ray.stages.cms import cms_estimate, cms_sketch

    rng = np.random.default_rng(3)
    keys = rng.integers(0, 40, 5000).astype(np.int64)
    ds = rd.from_arrow(pa.table({"k": keys})).repartition(6)
    true = {int(k): int(c) for k, c in
            zip(*np.unique(keys, return_counts=True))}
    # narrow sketch: estimates are always >= truth
    sk = cms_sketch(ds, "k", width=16, depth=4)
    assert sk.shape == (4, 16) and sk.sum() == 4 * len(keys)
    q = rd.from_arrow(pa.table({"k": np.array(sorted(true), np.int64)}))
    est = cms_estimate(q, "k", sk).to_pandas()
    for r in est.itertuples(index=False):
        assert r.est_count >= true[int(r.k)]
    # wide sketch: 40 keys in 4x4096 cells -> exact with overwhelming
    # probability under the fixed splitmix seeds (deterministic here)
    sk2 = cms_sketch(ds, "k", width=4096, depth=4)
    est2 = cms_estimate(q, "k", sk2).to_pandas()
    assert all(r.est_count == true[int(r.k)] for r in est2.itertuples(index=False))


def test_embedding_covariance_matches_numpy(ray_session):
    import ray.data as rd

    from pgd_ray.stages.vector_stats import embedding_covariance

    rng = np.random.default_rng(4)
    X = rng.normal(0, 2, (60, 5)).astype(np.float32)
    ds = rd.from_arrow(pa.table({
        "vec_id": np.arange(60, dtype=np.int64),
        "embedding": pa.array(list(X)),
    }))
    got = embedding_covariance(ds)
    Xd = X.astype(np.float64)
    C = np.cov(Xd, rowvar=False, bias=True)
    for r in got.itertuples():
        assert abs(r.cov - C[r.i - 1, r.j - 1]) < 1e-6
    assert len(got) == 5 * 6 // 2


def test_percentile_cont_matches_numpy_linear():
    import pandas as pd
    import ray.data as rd

    from pgd_ray.stages.quantiles import percentile_cont

    rng = np.random.default_rng(5)
    vals = np.concatenate([rng.standard_normal(5000) * 30,
                           rng.integers(-4, 5, 500).astype(float)])
    ds = rd.from_pandas(pd.DataFrame({"v": vals})).repartition(9)
    qs = [0.0, 0.1, 0.5, 0.9, 0.977, 1.0]
    got = percentile_cont(ds, "v", qs, bins=16, fetch_cap=64)
    want = np.percentile(vals, [q * 100 for q in qs], method="linear")
    np.testing.assert_allclose(got["value"].to_numpy(), np.round(want, 6),
                               atol=1e-6)
    # empty input → NaNs, schema intact
    empty = rd.from_pandas(pd.DataFrame({"v": pd.Series([], dtype=float)}))
    e = percentile_cont(empty, "v", [0.5])
    assert list(e.columns) == ["q", "value"] and np.isnan(e["value"][0])


def test_distinct_rows_matches_pandas_with_boundary_dups():
    import numpy as np
    import pandas as pd
    import ray.data

    from pgd_ray.stages.distinct import distinct_rows

    rng = np.random.default_rng(13)
    df = pd.DataFrame({
        "a": rng.integers(0, 20, 5000),
        "b": rng.integers(0, 5, 5000),
    })
    out = (distinct_rows(ray.data.from_pandas(df).repartition(16),
                         ["a", "b"])
           .to_pandas().sort_values(["a", "b"], ignore_index=True))
    ref = (df.drop_duplicates().sort_values(["a", "b"],
                                            ignore_index=True))
    assert (out.to_numpy() == ref.to_numpy()).all()
    # heavy-duplication case: one value spanning many blocks
    df2 = pd.DataFrame({"a": np.zeros(10000, np.int64),
                        "b": np.zeros(10000, np.int64)})
    out2 = distinct_rows(ray.data.from_pandas(df2).repartition(8),
                         ["a", "b"]).to_pandas()
    assert len(out2) == 1


def test_dedup_sorted_blocks_block_position_stitch():
    """Regression for ADVICE r3 (distinct.py / dedup.py): the boundary
    stitch must be keyed by block POSITION, not first-row value.  A
    duplicate run exactly filling a whole block must survive exactly
    once, and adversarial block layouts (empty blocks, consecutive
    identical full blocks) must not drop or duplicate values."""
    import pyarrow as pa
    import ray
    import ray.data

    from pgd_ray.stages.distinct import dedup_sorted_blocks

    def run(blocks):
        tables = [pa.table({"a": pa.array(b, pa.int64())}) for b in blocks]
        ds = ray.data.from_arrow_refs([ray.put(t) for t in tables])
        out = dedup_sorted_blocks(ds, ["a"]).to_pandas()
        return sorted(out["a"].tolist())

    # old-bug case: value 7 exactly fills the middle block — the
    # value-keyed stitch dropped it from BOTH block 2 and block 3
    assert run([[1, 7], [7, 7], [7, 9]]) == [1, 7, 9]
    # run crossing a boundary
    assert run([[3, 3], [3, 5]]) == [3, 5]
    # empty block between two blocks of the same value
    assert run([[4], [], [4]]) == [4]
    # two consecutive blocks entirely one value
    assert run([[2, 2], [2, 2], [6]]) == [2, 6]
    # no dups at all
    assert run([[1, 2], [3, 4]]) == [1, 2, 3, 4]
    # single block
    assert run([[5, 5, 8]]) == [5, 8]


def test_count_sorted_blocks_matches_pandas():
    """Round-5 sort-path per-key counts (VERDICT r4 item 4): interior
    runs count in-block, edge runs re-sum on the driver — including
    keys that exactly fill one or more whole blocks."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray
    import ray.data

    from pgd_ray.stages.distinct import count_sorted_blocks

    rng = np.random.default_rng(7)
    df = pd.DataFrame({
        "a": rng.integers(0, 30, 6000),
        "b": rng.integers(0, 4, 6000),
    })
    srt = (ray.data.from_pandas(df).repartition(16)
           .sort(["a", "b"]).materialize())
    out = (count_sorted_blocks(srt, ["a", "b"], alias="n")
           .to_pandas().sort_values(["a", "b"], ignore_index=True))
    ref = (df.groupby(["a", "b"]).size().rename("n").reset_index()
           .sort_values(["a", "b"], ignore_index=True))
    assert (out.to_numpy() == ref.to_numpy()).all()

    # adversarial block layouts (hand-built, globally sorted)
    def run(blocks):
        tables = [pa.table({"a": pa.array(b, pa.int64())}) for b in blocks]
        ds = ray.data.from_arrow_refs([ray.put(t) for t in tables])
        out = count_sorted_blocks(ds, ["a"]).to_pandas()
        return dict(zip(out["a"], out["n"]))

    # value 7 spans three blocks, one of them entirely 7
    assert run([[1, 7], [7, 7], [7, 9]]) == {1: 1, 7: 4, 9: 1}
    # run crossing one boundary
    assert run([[3, 3], [3, 5]]) == {3: 3, 5: 1}
    # empty block between two blocks of the same value
    assert run([[4], [], [4]]) == {4: 2}
    # single-block, single-run
    assert run([[2, 2, 2]]) == {2: 3}


def test_count_sorted_blocks_string_keys():
    """count_sorted_blocks is key-type-generic: string runs spanning
    block boundaries re-sum exactly like int ones."""
    import numpy as np
    import pandas as pd
    import ray.data

    from pgd_ray.stages.distinct import count_sorted_blocks

    rng = np.random.default_rng(3)
    df = pd.DataFrame({"k": rng.choice(
        ["alpha", "beta", "gamma", "delta"], 3000)})
    srt = (ray.data.from_pandas(df).repartition(12)
           .sort(["k"]).materialize())
    out = (count_sorted_blocks(srt, ["k"], alias="n").to_pandas()
           .sort_values("k", ignore_index=True))
    ref = (df.groupby("k").size().rename("n").reset_index()
           .sort_values("k", ignore_index=True))
    assert (out.to_numpy() == ref.to_numpy()).all()
