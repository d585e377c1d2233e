import numpy as np
import pytest
import ray

from pgd_ray.graph.csr import csr_from_edge_arrays
from pgd_ray.graph.iterative import (
    bfs_distances,
    connected_components,
    kcore,
    label_propagation,
    pagerank,
    personalized_pagerank,
)
from tests.brute import random_graph


def _csr(n, p, seed):
    edges = sorted(random_graph(n, p, seed))
    src = np.array([a for a, b in edges])
    dst = np.array([b for a, b in edges])
    return csr_from_edge_arrays(src, dst, n=n)


def _pr_ref(csr, alpha=0.85, tol=1e-12):
    n = csr.n
    deg = csr.degrees()
    s = np.full(n, 1.0 / n)
    src = np.repeat(np.arange(n), deg)
    dst = csr.indices
    for _ in range(500):
        w = s / np.maximum(deg, 1)
        contrib = np.zeros(n)
        np.add.at(contrib, dst, w[src])
        new = (1 - alpha) / n + alpha * (contrib + s[deg == 0].sum() / n)
        if np.abs(new - s).max() < tol:
            return new
        s = new
    return s


def _cc_ref(csr):
    lab = -np.ones(csr.n, dtype=np.int64)
    for s0 in range(csr.n):
        if lab[s0] >= 0:
            continue
        stack = [s0]
        lab[s0] = s0
        while stack:
            v = stack.pop()
            for u in csr.neighbors(v):
                if lab[u] < 0:
                    lab[u] = s0
                    stack.append(u)
    return lab


def _kcore_ref(csr):
    """Sequential peeling."""
    deg = csr.degrees().astype(np.int64).copy()
    core = np.zeros(csr.n, dtype=np.int64)
    alive = np.ones(csr.n, dtype=bool)
    for _ in range(csr.n):
        if not alive.any():
            break
        k = deg[alive].min()
        while True:
            peel = np.flatnonzero(alive & (deg <= k))
            if not len(peel):
                break
            for v in peel:
                core[v] = k
                alive[v] = False
                for u in csr.neighbors(v):
                    if alive[u]:
                        deg[u] -= 1
    return core


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_pagerank_allclose(seed):
    csr = _csr(40, 0.1, seed)
    pr = pagerank(csr, tol=1e-12, n_workers=2)
    assert np.allclose(pr, _pr_ref(csr), atol=1e-6)
    assert abs(pr.sum() - 1.0) < 1e-9


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_cc_exact(seed):
    csr = _csr(60, 0.05, seed)
    assert (connected_components(csr, n_workers=2) == _cc_ref(csr)).all()


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_kcore_exact(seed):
    csr = _csr(50, 0.15, seed)
    assert (kcore(csr, n_workers=2) == _kcore_ref(csr)).all()


def test_label_propagation_two_cliques():
    # two K5s joined by one edge → two stable communities
    e = []
    for base in (0, 5):
        e += [(base + i, base + j) for i in range(5) for j in range(i + 1, 5)]
    e.append((0, 5))
    src = np.array([a for a, b in e])
    dst = np.array([b for a, b in e])
    csr = csr_from_edge_arrays(src, dst, n=10)
    lab = label_propagation(csr, max_iter=20, n_workers=2)
    assert len(set(lab[:5])) == 1
    assert len(set(lab[5:])) == 1


def _bfs_ref(csr, sources):
    from collections import deque

    dist = np.full(csr.n, csr.n, dtype=np.int64)
    q = deque()
    for s in sources:
        dist[s] = 0
        q.append(s)
    while q:
        v = q.popleft()
        for u in csr.neighbors(v):
            if dist[u] > dist[v] + 1:
                dist[u] = dist[v] + 1
                q.append(u)
    return dist


def _ppr_ref(csr, seed, alpha=0.85, tol=1e-12):
    n = csr.n
    deg = csr.degrees()
    s = np.zeros(n)
    s[seed] = 1.0
    src = np.repeat(np.arange(n), deg)
    dst = csr.indices
    for _ in range(500):
        w = s / np.maximum(deg, 1)
        contrib = np.zeros(n)
        np.add.at(contrib, dst, w[src])
        new = alpha * contrib
        new[seed] += (1 - alpha) + alpha * s[deg == 0].sum()
        if np.abs(new - s).max() < tol:
            return new
        s = new
    return s


@pytest.mark.parametrize("seed", [1, 2])
def test_bfs_distances_exact(seed):
    csr = _csr(60, 0.05, seed)
    got = bfs_distances(csr, [0], n_workers=2)
    assert (got == _bfs_ref(csr, [0])).all()
    # multi-source: distance from the nearest of {0, 17, 42}
    got = bfs_distances(csr, [0, 17, 42], n_workers=2)
    assert (got == _bfs_ref(csr, [0, 17, 42])).all()


def test_bfs_unreachable_sentinel():
    csr = csr_from_edge_arrays(np.array([0, 1]), np.array([1, 2]), n=5)
    d = bfs_distances(csr, [0], n_workers=1)
    assert list(d[:3]) == [0, 1, 2]
    assert d[3] == 5 and d[4] == 5  # sentinel n for unreachable


@pytest.mark.parametrize("seed", [1, 2])
def test_personalized_pagerank_allclose(seed):
    csr = _csr(40, 0.1, seed)
    got = personalized_pagerank(csr, seed=3, tol=1e-12, n_workers=2)
    assert np.allclose(got, _ppr_ref(csr, 3), atol=1e-6)
    assert abs(got.sum() - 1.0) < 1e-9  # mass conserved


def test_bfs_ppr_parallelism_and_sharded_parity():
    csr = _csr(80, 0.06, seed=5)
    a = bfs_distances(csr, [2], n_workers=1)
    assert (a == bfs_distances(csr, [2], n_workers=4)).all()
    assert (a == bfs_distances(csr, [2], engine="sharded", n_workers=3)).all()
    p = personalized_pagerank(csr, seed=2, tol=1e-12, n_workers=1)
    assert np.allclose(
        p, personalized_pagerank(csr, seed=2, tol=1e-12, n_workers=4), atol=1e-15
    )
    assert np.allclose(
        p,
        personalized_pagerank(csr, seed=2, tol=1e-12, engine="sharded", n_workers=3),
        atol=1e-15,
    )


def test_pagerank_resume(tmp_path):
    csr = _csr(40, 0.1, 7)
    full = pagerank(csr, tol=1e-12, n_workers=2)
    pagerank(csr, tol=1e-12, n_workers=2, checkpoint_dir=tmp_path, max_iter=7)
    resumed = pagerank(csr, tol=1e-12, n_workers=2, checkpoint_dir=tmp_path, resume=True)
    assert np.allclose(full, resumed, atol=1e-12)
    assert (tmp_path / "manifest.json").exists()


def test_isolated_vertices():
    # vertex 3 isolated
    csr = csr_from_edge_arrays(np.array([0, 1]), np.array([1, 2]), n=4)
    pr = pagerank(csr, n_workers=1)
    assert abs(pr.sum() - 1.0) < 1e-9
    cc = connected_components(csr, n_workers=1)
    assert cc[3] == 3 and cc[0] == cc[1] == cc[2] == 0
    assert kcore(csr, n_workers=1)[3] == 0


def test_results_invariant_to_parallelism():
    """North-rule determinism: identical results at different worker
    counts (parallelism must never change any output)."""
    csr = _csr(50, 0.12, 11)
    assert np.allclose(pagerank(csr, n_workers=1), pagerank(csr, n_workers=4), atol=1e-15)
    assert (connected_components(csr, n_workers=1) == connected_components(csr, n_workers=4)).all()
    assert (kcore(csr, n_workers=1) == kcore(csr, n_workers=4)).all()
    assert (label_propagation(csr, n_workers=1) == label_propagation(csr, n_workers=4)).all()


def test_sharded_engine_bit_identical():
    """engine='sharded' (per-range state slices exchanged by ref, no
    per-round O(n) broadcast) must reproduce the broadcast engine
    bit-for-bit for all four programs (same gather order per range)."""
    csr = _csr(400, 0.03, seed=9)
    for fn, kw in (
        (pagerank, dict(tol=1e-12)),
        (connected_components, {}),
        (kcore, {}),
        (label_propagation, dict(max_iter=20)),
    ):
        a = fn(csr, engine="actors", n_workers=3, **kw)
        b = fn(csr, engine="sharded", n_workers=3, **kw)
        assert np.array_equal(a, b), fn.__name__


def test_sharded_engine_with_isolated_and_dangling():
    # vertices 8, 9 isolated (degree 0): dangling mass path + empty range
    src = np.array([0, 1, 2, 3])
    dst = np.array([1, 2, 3, 0])
    csr = csr_from_edge_arrays(src, dst, n=10)
    a = pagerank(csr, engine="actors", n_workers=4, tol=1e-12)
    b = pagerank(csr, engine="sharded", n_workers=4, tol=1e-12)
    np.testing.assert_allclose(a, b, atol=1e-15)
    assert np.array_equal(
        connected_components(csr, engine="sharded", n_workers=4),
        connected_components(csr, engine="actors", n_workers=4),
    )


def test_sharded_engine_from_range_csr(tmp_path):
    """Sharded workers can load their adjacency from RangeCSR fragment
    files — no process ever holds the full graph."""
    import pyarrow as pa
    import ray.data as rd

    from pgd_ray.graph.block_csr import build_range_csr
    from pgd_ray.graph.iterative import IterativeEngine

    edges = sorted(random_graph(300, 0.04, seed=4))
    src = np.array([a for a, b in edges], dtype=np.int64)
    dst = np.array([b for a, b in edges], dtype=np.int64)
    rcsr, _ = build_range_csr(
        rd.from_arrow(pa.table({"src": src, "dst": dst})),
        n=300, num_ranges=4, out_dir=tmp_path,
    )
    csr = rcsr.to_csr()
    eng = IterativeEngine(csr, "cc", n_workers=4, engine="sharded")
    got, _ = eng.run(
        np.arange(300, dtype=np.int64), lambda s: {}, lambda d: d == 0.0, 10_000,
        range_csr=rcsr,
    )
    assert np.array_equal(got, connected_components(csr, engine="actors"))


def test_sharded_engine_groups_ranges_to_worker_count(tmp_path):
    """More fragment ranges than workers: contiguous nnz-balanced
    grouping (each worker concatenates several fragment files) must
    stay bit-identical to the broadcast-arrays path for PR and CC."""
    import pyarrow as pa
    import ray.data as rd

    from pgd_ray.graph.block_csr import build_range_csr
    from pgd_ray.graph.iterative import IterativeEngine

    edges = sorted(random_graph(400, 0.03, seed=11))
    src = np.array([a for a, b in edges], dtype=np.int64)
    dst = np.array([b for a, b in edges], dtype=np.int64)
    rcsr, _ = build_range_csr(
        rd.from_arrow(pa.table({"src": src, "dst": dst})),
        n=400, num_ranges=7, out_dir=tmp_path,
    )
    csr = rcsr.to_csr()
    for prog, init in (
        ("pagerank", np.full(400, 1.0 / 400)),
        ("cc", np.arange(400, dtype=np.int64)),
    ):
        eng = IterativeEngine(csr, prog, n_workers=3, engine="sharded")
        got, _ = eng.run(init.copy(), lambda s: {"alpha": 0.85, "base": 0.15 / 400}
                         if prog == "pagerank" else {},
                         lambda d: d == 0.0, 50, range_csr=rcsr)
        eng2 = IterativeEngine(csr, prog, n_workers=3, engine="sharded")
        want, _ = eng2.run(init.copy(), lambda s: {"alpha": 0.85, "base": 0.15 / 400}
                           if prog == "pagerank" else {},
                           lambda d: d == 0.0, 50)
        assert np.array_equal(got, want), prog


def test_sharded_pool_reuse_across_runs():
    """One ShardedPool driven by several engine runs (PR then CC then
    a second PR) gives results identical to pool-per-run — the spawn
    amortization API the bench and repeated analytics rely on."""
    from pgd_ray.graph.iterative import IterativeEngine, sharded_pool

    edges = sorted(random_graph(250, 0.05, seed=9))
    src = np.array([a for a, b in edges], dtype=np.int64)
    dst = np.array([b for a, b in edges], dtype=np.int64)
    csr = csr_from_edge_arrays(src, dst, n=250)
    pool = sharded_pool(csr, 4)
    try:
        n = csr.n
        deg = csr.degrees()
        dang = deg == 0

        def extras(state):
            d = float(state[dang].sum()) if dang.any() else 0.0
            return {"alpha": 0.85, "base": 0.15 / n + 0.85 * d / n}

        prs = []
        for _ in range(2):
            eng = IterativeEngine(csr, "pagerank", n_workers=4, engine="sharded")
            s, _ = eng.run(np.full(n, 1.0 / n), extras, lambda d: d < 1e-12, 200,
                           pool=pool)
            prs.append(s)
        eng = IterativeEngine(csr, "cc", n_workers=4, engine="sharded")
        cc, _ = eng.run(np.arange(n, dtype=np.int64), lambda s: {},
                        lambda d: d == 0.0, 10_000, pool=pool)
        # pool actors must survive the runs (engine does not kill a
        # caller-owned pool)
        ray.get([w.meta.remote() for w in pool.workers])
    finally:
        pool.kill()
    np.testing.assert_array_equal(prs[0], prs[1])
    np.testing.assert_allclose(prs[0], pagerank(csr, engine="actors", tol=1e-12),
                               atol=1e-15)
    assert np.array_equal(cc, connected_components(csr, engine="actors"))


def _eig_ref(csr, iters=64):
    n = csr.n
    A = np.zeros((n, n))
    src = np.repeat(np.arange(n), csr.degrees())
    A[src, csr.indices] = 1.0
    x = np.full(n, 1.0 / np.sqrt(n))
    for _ in range(iters):
        y = A @ x
        nrm = np.linalg.norm(y)
        x = y / nrm if nrm > 0 else y
    return x


@pytest.mark.parametrize("seed", [5, 6])
def test_eigenvector_centrality_matches_dense(seed):
    from pgd_ray.graph.iterative import eigenvector_centrality

    csr = _csr(40, 0.15, seed)
    got = eigenvector_centrality(csr, iters=64, n_workers=3)
    assert np.allclose(got, _eig_ref(csr, 64), atol=1e-9)
    assert abs(np.linalg.norm(got) - 1.0) < 1e-12


def test_eigenvector_centrality_engine_parity():
    from pgd_ray.graph.iterative import eigenvector_centrality

    csr = _csr(60, 0.1, 9)
    a = eigenvector_centrality(csr, iters=32, n_workers=3, engine="actors")
    d = eigenvector_centrality(csr, iters=32, n_workers=3, engine="dataset")
    s = eigenvector_centrality(csr, iters=32, n_workers=3, engine="sharded")
    # inv_norm summation order differs per engine: allclose, not bitwise
    assert np.allclose(a, d, atol=1e-12)
    assert np.allclose(a, s, atol=1e-12)


def test_eigenvector_centrality_edgeless_and_empty():
    from pgd_ray.graph.iterative import eigenvector_centrality

    assert len(eigenvector_centrality(csr_from_edge_arrays(
        np.array([], np.int64), np.array([], np.int64), n=0))) == 0
    # edgeless n=3: y_1 = 0 -> zeros stay (inv_norm guard), output zeros
    z = eigenvector_centrality(csr_from_edge_arrays(
        np.array([], np.int64), np.array([], np.int64), n=3), iters=4)
    assert np.array_equal(z, np.zeros(3))


def _katz_ref(csr, alpha, beta, iters):
    n = csr.n
    A = np.zeros((n, n))
    src = np.repeat(np.arange(n), csr.degrees())
    A[src, csr.indices] = 1.0
    x = np.full(n, beta)
    for _ in range(iters):
        x = beta + alpha * (A @ x)
    return x


@pytest.mark.parametrize("seed", [3, 4])
def test_katz_matches_dense(seed):
    from pgd_ray.graph.iterative import katz_centrality

    csr = _csr(40, 0.15, seed)
    alpha = 0.5 / max(1, int(csr.degrees().max()))
    got = katz_centrality(csr, alpha=alpha, beta=1.0, iters=32, n_workers=3)
    assert np.allclose(got, _katz_ref(csr, alpha, 1.0, 32), atol=1e-9)


def test_katz_engine_parity_and_empty():
    from pgd_ray.graph.iterative import katz_centrality

    csr = _csr(60, 0.1, 13)
    alpha = 0.5 / max(1, int(csr.degrees().max()))
    a = katz_centrality(csr, alpha=alpha, iters=16, n_workers=3,
                        engine="actors")
    d = katz_centrality(csr, alpha=alpha, iters=16, n_workers=3,
                        engine="dataset")
    s = katz_centrality(csr, alpha=alpha, iters=16, n_workers=3,
                        engine="sharded")
    # per-range float gather order is identical across executors
    assert np.array_equal(a, d)
    assert np.array_equal(a, s)
    assert len(katz_centrality(csr_from_edge_arrays(
        np.array([], np.int64), np.array([], np.int64), n=0))) == 0
    # edgeless n=3: x stays at beta + alpha*0 = beta
    z = katz_centrality(csr_from_edge_arrays(
        np.array([], np.int64), np.array([], np.int64), n=3),
        alpha=0.1, beta=2.0, iters=4)
    assert np.array_equal(z, np.full(3, 2.0))


@pytest.mark.parametrize("seed", [11, 12])
def test_mis_independent_maximal_engine_parity(seed):
    from pgd_ray.graph.iterative import maximal_independent_set

    edges = sorted(random_graph(60, 0.1, seed))
    csr = _csr(60, 0.1, seed)
    m = maximal_independent_set(csr, n_workers=3)
    adj = [set() for _ in range(60)]
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    assert not any(m[a] and m[b] for a, b in edges)          # independent
    assert all(m[v] or any(m[u] for u in adj[v]) for v in range(60))  # maximal
    s = maximal_independent_set(csr, n_workers=3, engine="sharded")
    d = maximal_independent_set(csr, n_workers=3, engine="dataset")
    assert np.array_equal(m, s) and np.array_equal(m, d)


def test_mis_isolated_and_empty():
    from pgd_ray.graph.iterative import maximal_independent_set

    m = maximal_independent_set(
        csr_from_edge_arrays(np.array([0]), np.array([1]), n=3))
    assert bool(m[2]) and m[:2].sum() == 1  # isolated joins; one endpoint
    assert len(maximal_independent_set(
        csr_from_edge_arrays(np.array([], np.int64), np.array([], np.int64), n=0))) == 0


def test_anf_registers_equal_brute_ball_sketches():
    from pgd_ray.graph.iterative import (_bit_length_u64_local,
                                         anf_registers, neighborhood_sizes)
    from pgd_ray.text.hashing import splitmix64

    csr = _csr(40, 0.08, 7)
    regs = anf_registers(csr, rounds=40, n_workers=3)
    # brute: per-vertex ball = its connected component (rounds >> diam)
    comp = _cc_ref(csr)
    h = splitmix64(np.arange(40, dtype=np.int64).astype(np.uint64))
    bucket = (h >> np.uint64(61)).astype(np.int64)
    w = h & np.uint64((1 << 61) - 1)
    rho = np.where(w == 0, 62, 61 - _bit_length_u64_local(w) + 1)
    exp = np.zeros(40, dtype=np.int64)
    for v in range(40):
        lanes = np.zeros(8, dtype=np.int64)
        for u in range(40):
            if comp[u] == comp[v]:
                lanes[bucket[u]] = max(lanes[bucket[u]], rho[u])
        exp[v] = int((lanes << (6 * np.arange(8))).sum())
    assert np.array_equal(regs, exp)
    est = neighborhood_sizes(regs)
    # estimates are positive and constant within a component
    assert (est > 0).all()
    for c in np.unique(comp):
        assert np.allclose(est[comp == c], est[comp == c][0])


def test_anf_engine_parity_and_empty():
    from pgd_ray.graph.iterative import anf_registers

    csr = _csr(50, 0.1, 8)
    a = anf_registers(csr, rounds=16, n_workers=3, engine="actors")
    s = anf_registers(csr, rounds=16, n_workers=3, engine="sharded")
    assert np.array_equal(a, s)
    assert len(anf_registers(csr_from_edge_arrays(
        np.array([], np.int64), np.array([], np.int64), n=0))) == 0


@pytest.mark.parametrize("seed", [21, 22])
def test_coloring_proper_and_engine_parity(seed):
    from pgd_ray.graph.iterative import greedy_coloring

    edges = sorted(random_graph(60, 0.12, seed))
    csr = _csr(60, 0.12, seed)
    c = greedy_coloring(csr, n_workers=3)
    assert all(c[a] != c[b] for a, b in edges)               # proper
    assert c.max() <= np.diff(csr.indptr).max()              # <= Δ+1 colors
    assert (c >= 0).all()
    s = greedy_coloring(csr, n_workers=3, engine="sharded")
    d = greedy_coloring(csr, n_workers=3, engine="dataset")
    assert np.array_equal(c, s) and np.array_equal(c, d)


def test_coloring_star_and_empty():
    from pgd_ray.graph.iterative import greedy_coloring

    # star: hub one color, leaves share the other -> 2 colors
    edges = [(0, i) for i in range(1, 8)]
    src = np.array([a for a, b in edges])
    dst = np.array([b for a, b in edges])
    c = greedy_coloring(csr_from_edge_arrays(src, dst, n=8))
    assert c.max() == 1
    assert all(c[0] != c[i] for i in range(1, 8))
    assert len(greedy_coloring(csr_from_edge_arrays(
        np.array([], np.int64), np.array([], np.int64), n=0))) == 0


# (single-source BFS reference: use the module-level multi-source
# _bfs_ref defined above — a duplicate definition here once shadowed
# it and broke the multi-source test.)
def _bfs_ref1(csr, s0):
    return _bfs_ref(csr, [s0])


@pytest.mark.parametrize("seed", [31, 32])
def test_harmonic_centrality_matches_brute(seed):
    from pgd_ray.graph.centrality import harmonic_centrality

    csr = _csr(50, 0.08, seed)
    seeds = [0, 3, 7]
    h = harmonic_centrality(csr, seeds, n_workers=3)
    ref = np.zeros(csr.n)
    for s in seeds:
        d = _bfs_ref1(csr, s)
        m = (d > 0) & (d < csr.n)
        ref[m] += 1.0 / d[m]
    ref *= (csr.n - 1) / len(seeds)
    assert np.allclose(h, ref, atol=1e-12)


def test_harmonic_centrality_dedups_seeds_and_empty():
    from pgd_ray.graph.centrality import harmonic_centrality

    csr = _csr(30, 0.1, 33)
    a = harmonic_centrality(csr, [2, 2, 5], n_workers=2)
    b = harmonic_centrality(csr, [5, 2], n_workers=2)
    assert np.allclose(a, b)
    empty = csr_from_edge_arrays(
        np.array([], np.int64), np.array([], np.int64), n=0)
    assert len(harmonic_centrality(empty, [0])) == 0


def _brandes_ref(csr, seeds):
    """Textbook Brandes (2001) with Python dicts/stacks — the slow
    reference the packed dist+sigma engine programs must match."""
    n = csr.n
    bc = np.zeros(n)
    adj = [csr.indices[csr.indptr[v]:csr.indptr[v + 1]] for v in range(n)]
    for s in seeds:
        sigma = np.zeros(n)
        sigma[s] = 1
        dist = np.full(n, -1)
        dist[s] = 0
        order = [s]
        head = 0
        while head < len(order):
            v = order[head]
            head += 1
            for w in adj[v]:
                if dist[w] < 0:
                    dist[w] = dist[v] + 1
                    order.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
        delta = np.zeros(n)
        for w in reversed(order):
            for v in adj[w]:
                if dist[v] == dist[w] + 1:
                    delta[w] += sigma[w] / sigma[v] * (1 + delta[v])
            if w != s:
                bc[w] += delta[w]
    return bc / 2.0


@pytest.mark.parametrize("seed", [3, 11])
def test_betweenness_matches_brandes(seed):
    from pgd_ray.graph.centrality import betweenness_centrality

    csr = _csr(40, 0.09, seed)
    seeds = [0, 5, 9, 9]
    bc = betweenness_centrality(csr, seeds, n_workers=3)
    ref = _brandes_ref(csr, sorted(set(seeds)))
    assert np.allclose(bc, ref, atol=1e-9)


def test_betweenness_disconnected_and_validation():
    from pgd_ray.graph.centrality import betweenness_centrality

    # two components: a path 0-1-2 and an isolated edge 3-4
    src = np.array([0, 1, 3], np.int64)
    dst = np.array([1, 2, 4], np.int64)
    csr = csr_from_edge_arrays(src, dst, n=5)
    bc = betweenness_centrality(csr, [0], n_workers=2)
    ref = _brandes_ref(csr, [0])
    assert np.allclose(bc, ref)
    assert bc[3] == 0 and bc[4] == 0  # unreached
    with pytest.raises(ValueError):
        betweenness_centrality(csr, [])
    with pytest.raises(ValueError):
        betweenness_centrality(csr, [7])


def test_modularity_by_label_matches_brute():
    import ray.data

    from pgd_ray.graph.community import modularity, modularity_by_label

    edges = sorted(random_graph(40, 0.12, 41))
    src = np.array([a for a, b in edges])
    dst = np.array([b for a, b in edges])
    csr = csr_from_edge_arrays(src, dst, n=40)
    eds = ray.data.from_arrow(
        __import__("pyarrow").table({"src": src, "dst": dst}))
    labels = np.arange(40) % 3  # arbitrary 3-way partition
    tab = modularity_by_label(eds, csr, labels)
    m = len(edges)
    deg = csr.degrees()
    for _, row in tab.iterrows():
        c = row["label"]
        m_in = sum(1 for a, b in edges if labels[a] == c and labels[b] == c)
        dsum = int(deg[labels == c].sum())
        assert row["m_in"] == m_in and row["deg_sum"] == dsum
        assert abs(row["q"] - (m_in / m - (dsum / (2 * m)) ** 2)) < 1e-9
    # scalar Q: all-one-community labeling has Q = 0 exactly
    assert abs(modularity(eds, csr, np.zeros(40, np.int64))) < 1e-12


def test_modularity_empty_graph():
    import ray.data

    from pgd_ray.graph.community import modularity_by_label

    empty = csr_from_edge_arrays(
        np.array([], np.int64), np.array([], np.int64), n=0)
    eds = ray.data.from_items([])
    assert len(modularity_by_label(eds, empty, np.array([], np.int64))) == 0


def test_closeness_centrality_matches_brute():
    from pgd_ray.graph.centrality import closeness_centrality

    csr = _csr(50, 0.08, seed=4)
    seeds = [0, 3, 7]
    c = closeness_centrality(csr, seeds, n_workers=3)
    ssum = np.zeros(csr.n)
    r = np.zeros(csr.n)
    for s in seeds:
        d = _bfs_ref1(csr, s)
        m = (d > 0) & (d < csr.n)
        ssum[m] += d[m]
        r[m] += 1
    ref = np.where(r > 0, np.divide(r, ssum, out=np.zeros(csr.n),
                                    where=r > 0) * (r / 3.0), 0.0)
    assert np.allclose(c, ref, atol=1e-12)
    # disconnected vertex stays 0
    path = csr_from_edge_arrays(np.array([0, 2]), np.array([1, 3]), n=5)
    cc = closeness_centrality(path, [0], n_workers=1)
    assert cc[2] == 0 and cc[3] == 0 and cc[4] == 0 and cc[1] > 0


def test_neighborhood_function_monotone_and_exact_on_path():
    from pgd_ray.graph.iterative import neighborhood_function

    # path 0-1-2-3: exact ball sizes are known; the HLL estimate is
    # deterministic, so only structure is asserted: N monotone
    # nondecreasing, fixpoint pad beyond the diameter, eff flag sane
    csr = csr_from_edge_arrays(np.array([0, 1, 2]), np.array([1, 2, 3]), n=4)
    hs, nf, eff = neighborhood_function(csr, rounds=6, n_workers=2)
    assert list(hs) == list(range(7))
    assert (np.diff(nf) >= -1e-9).all()
    assert nf[3] == nf[4] == nf[5] == nf[6]  # diameter 3 -> padded
    assert 0 <= eff <= 3
    assert nf[eff] >= 0.9 * nf[-1]
    if eff > 0:
        assert nf[eff - 1] < 0.9 * nf[-1]


def test_double_sweep_diameter_on_path_graph():
    from pgd_ray.graph.iterative import bfs_distances

    # path 0-1-2-...-9: double sweep from the middle finds the true
    # diameter 9
    n = 10
    src = np.arange(n - 1, dtype=np.int64)
    dst = src + 1
    csr = csr_from_edge_arrays(src, dst, n=n)
    d1 = bfs_distances(csr, [4])
    far = int(np.argmax(d1))
    d2 = bfs_distances(csr, [far])
    assert int(d2[d2 < n].max()) == n - 1
