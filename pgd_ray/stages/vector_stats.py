"""Per-dimension moments over an embedding (``list<float>``) column.

The standard first look at an embedding table (feature drift, dead
dimensions, normalization checks) — computed as distributed partial
moments: each batch stacks its vectors into one (rows × d) float64
matrix and emits d rows of (dim, n, sum, sumsq, min, max); a
``groupby(dim)`` reduces #batches × d tiny rows; a final vectorized
pass turns them into mean/std.  Nothing proportional to the table
ever leaves the workers.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Max, Min, Sum


def embedding_dim_stats(
    ds: ray.data.Dataset, col: str = "embedding"
) -> ray.data.Dataset:
    """Columns (dim, n, mean, std, vmin, vmax), one row per vector
    dimension; std is the population std (E[x²] − mean², matching the
    engine's univar convention)."""

    def partial(t: pa.Table) -> pa.Table:
        c = t[col].combine_chunks()
        if len(c) == 0:
            return pa.table({
                "dim": pa.array([], pa.int64()), "n": pa.array([], pa.int64()),
                "s": pa.array([], pa.float64()), "ss": pa.array([], pa.float64()),
                "mn": pa.array([], pa.float64()), "mx": pa.array([], pa.float64()),
            })
        flat = c.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        d = len(c[0])
        m = flat.reshape(-1, d)
        return pa.table(
            {
                "dim": np.arange(d, dtype=np.int64),
                "n": np.full(d, m.shape[0], dtype=np.int64),
                "s": m.sum(axis=0),
                "ss": (m * m).sum(axis=0),
                "mn": m.min(axis=0),
                "mx": m.max(axis=0),
            }
        )

    agg = (
        ds.select_columns([col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("dim")
        .aggregate(
            Sum("n", alias_name="n"), Sum("s", alias_name="s"),
            Sum("ss", alias_name="ss"), Min("mn", alias_name="vmin"),
            Max("mx", alias_name="vmax"),
        )
    )

    def finalize(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        mean = df["s"] / df["n"]
        var = np.maximum(df["ss"] / df["n"] - mean * mean, 0.0)
        return pa.table(
            {
                "dim": df["dim"].astype("int64"),
                "n": df["n"].astype("int64"),
                "mean": mean.round(6),
                "std": np.sqrt(var).round(6),
                "vmin": df["vmin"].round(6),
                "vmax": df["vmax"].round(6),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


def embedding_covariance(
    ds: ray.data.Dataset, col: str = "embedding", round_to: int = 6
) -> pd.DataFrame:
    """Upper-triangle population covariance matrix of the embedding
    dimensions: cov(i,j) = E[x_i x_j] - E[x_i]E[x_j].  Each batch
    emits its d x d gram partial X^T X flattened to d(d+1)/2 rows plus
    per-dim sums — the exchange is O(#batches · d^2), never rows — and
    a ``groupby((i,j))`` reduces.  Columns (i, j, cov), 1-based dims,
    i <= j."""

    def partial(t: pa.Table) -> pa.Table:
        c = t[col].combine_chunks()
        if len(c) == 0:
            return pa.table({"i": pa.array([], pa.int64()),
                             "j": pa.array([], pa.int64()),
                             "sxy": pa.array([], pa.float64())})
        d = len(c[0])
        m = (c.flatten().to_numpy(zero_copy_only=False)
             .astype(np.float64).reshape(-1, d))
        g = m.T @ m
        iu, ju = np.triu_indices(d)
        # per-dim sums ride along as j = 0 rows (dims are 1-based),
        # the row count as (0, 0)
        return pa.table({
            "i": np.concatenate([iu + 1, np.arange(1, d + 1), [0]]),
            "j": np.concatenate([ju + 1, np.zeros(d, np.int64), [0]]),
            "sxy": np.concatenate([g[iu, ju], m.sum(axis=0),
                                   [float(m.shape[0])]]),
        })

    agg = (
        ds.select_columns([col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["i", "j"])
        .aggregate(Sum("sxy", alias_name="sxy"))
        .to_pandas()
    )
    if agg.empty:
        return pd.DataFrame({"i": pd.Series([], dtype=np.int64),
                             "j": pd.Series([], dtype=np.int64),
                             "cov": pd.Series([], dtype=np.float64)})
    n = float(agg.loc[(agg["i"] == 0) & (agg["j"] == 0), "sxy"].iloc[0])
    sums = agg[(agg["j"] == 0) & (agg["i"] > 0)].set_index("i")["sxy"]
    up = agg[agg["j"] > 0].copy()
    mi = up["i"].map(sums).to_numpy(np.float64) / n
    mj = up["j"].map(sums).to_numpy(np.float64) / n
    cov = up["sxy"].to_numpy(np.float64) / n - mi * mj
    return pd.DataFrame({
        "i": up["i"].astype(np.int64), "j": up["j"].astype(np.int64),
        "cov": np.round(cov, round_to),
    }).sort_values(["i", "j"], ignore_index=True)


def _cov_agg(ds: ray.data.Dataset, col: str) -> pd.DataFrame:
    """The gram/sum/count partial aggregate embedding_covariance uses,
    returned unrounded for numeric consumers (PCA)."""

    def partial(t: pa.Table) -> pa.Table:
        c = t[col].combine_chunks()
        if len(c) == 0:
            return pa.table({"i": pa.array([], pa.int64()),
                             "j": pa.array([], pa.int64()),
                             "sxy": pa.array([], pa.float64())})
        d = len(c[0])
        m = (c.flatten().to_numpy(zero_copy_only=False)
             .astype(np.float64).reshape(-1, d))
        g = m.T @ m
        iu, ju = np.triu_indices(d)
        return pa.table({
            "i": np.concatenate([iu + 1, np.arange(1, d + 1), [0]]),
            "j": np.concatenate([ju + 1, np.zeros(d, np.int64), [0]]),
            "sxy": np.concatenate([g[iu, ju], m.sum(axis=0),
                                   [float(m.shape[0])]]),
        })

    return (
        ds.select_columns([col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["i", "j"])
        .aggregate(Sum("sxy", alias_name="sxy"))
        .to_pandas()
    )


def pca_top_component(
    ds: ray.data.Dataset, col: str = "embedding", iters: int = 64,
) -> tuple[np.ndarray, np.ndarray, float]:
    """Top principal component of the embedding cloud by fixed-horizon
    power iteration on the population covariance.

    One distributed pass builds the d x d covariance (the same
    O(#batches * d^2) gram-partial exchange as embedding_covariance);
    the d x d iteration runs on the driver (the thin-side-iteration
    pattern: heavy aggregate distributed, tiny dense solve local).
    Fixed ``iters`` rounds from the uniform unit start — a pure
    function of the data, so the recursive-CTE SQL oracle replays it;
    the returned sign is whatever the deterministic iteration yields.
    Returns (mu, v, lam): per-dim mean, unit component, its variance.
    """
    agg = _cov_agg(ds, col)
    if agg.empty:
        raise ValueError("pca_top_component: empty input")
    n = float(agg.loc[(agg["i"] == 0) & (agg["j"] == 0), "sxy"].iloc[0])
    sums = agg[(agg["j"] == 0) & (agg["i"] > 0)].set_index("i")["sxy"]
    d = len(sums)
    mu = sums.sort_index().to_numpy(np.float64) / n
    C = np.zeros((d, d), dtype=np.float64)
    up = agg[agg["j"] > 0]
    ii = up["i"].to_numpy(np.int64) - 1
    jj = up["j"].to_numpy(np.int64) - 1
    cv = up["sxy"].to_numpy(np.float64) / n - mu[ii] * mu[jj]
    C[ii, jj] = cv
    C[jj, ii] = cv
    x = np.full(d, 1.0 / np.sqrt(d))
    for _ in range(iters):
        y = C @ x
        x = y / np.sqrt((y * y).sum())
    lam = float(x @ (C @ x))
    return mu, x, lam


def pca_project(
    ds: ray.data.Dataset, mu: np.ndarray, v: np.ndarray,
    col: str = "embedding", id_col: str = "vec_id", round_to: int = 6,
) -> ray.data.Dataset:
    """Per-vector projection onto a (centered) component: one
    stateless vectorized map — (id_col, pc1)."""

    def proj(t: pa.Table) -> pa.Table:
        c = t[col].combine_chunks()
        if len(c) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "pc1": pa.array([], pa.float64())})
        d = len(v)
        m = (c.flatten().to_numpy(zero_copy_only=False)
             .astype(np.float64).reshape(-1, d))
        p = (m - mu) @ v
        return pa.table({id_col: t[id_col],
                         "pc1": pa.array(np.round(p, round_to))})

    return ds.select_columns([id_col, col]).map_batches(
        proj, batch_format="pyarrow")


def jl_norm_ratios(
    ds: ray.data.Dataset, col: str = "embedding", id_col: str = "vec_id",
    p: int = 16, round_to: int = 6,
) -> ray.data.Dataset:
    """Johnson-Lindenstrauss sketch quality per vector: project each
    d-dim embedding to p dims with the deterministic Rademacher matrix
    R[i, j] = ±1/√p (sign = low bit of splitmix64(i<<32 | j) — the
    engine's standard content-hash coin, so the SQL oracle rebuilds
    the identical matrix) and report ||Rx||²/||x||² — the norm
    distortion the JL lemma bounds.  One stateless vectorized map; R
    is built once per actor from (d, p) alone, nothing is broadcast.
    Columns (id_col, norm_ratio)."""

    class Proj:
        def __init__(self):
            self.R = None

        def _build(self, d):
            from pgd_ray.text.hashing import splitmix64

            i = np.repeat(np.arange(d, dtype=np.uint64), p)
            j = np.tile(np.arange(p, dtype=np.uint64), d)
            bit = splitmix64((i << np.uint64(32)) | j) & np.uint64(1)
            self.R = np.where(bit.reshape(d, p) == 1, 1.0, -1.0) / np.sqrt(p)

        def __call__(self, t: pa.Table) -> pa.Table:
            c = t[col].combine_chunks()
            if len(c) == 0:
                return pa.table({id_col: pa.array([], pa.int64()),
                                 "norm_ratio": pa.array([], pa.float64())})
            d = len(c[0])
            if self.R is None:
                self._build(d)
            m = (c.flatten().to_numpy(zero_copy_only=False)
                 .astype(np.float64).reshape(-1, d))
            y = m @ self.R
            ratio = (y * y).sum(axis=1) / (m * m).sum(axis=1)
            return pa.table({id_col: t[id_col],
                             "norm_ratio": pa.array(np.round(ratio, round_to))})

    return ds.select_columns([id_col, col]).map_batches(
        Proj, batch_format="pyarrow", concurrency=(1, 8))


def intrinsic_dimension(
    ds: ray.data.Dataset, col: str = "embedding", id_col: str = "vec_id",
    batch_size: int = 4096,
) -> pd.DataFrame:
    """TwoNN intrinsic-dimension MLE (Facco et al. 2017): per vector
    the euclidean distances r1 <= r2 to its two nearest neighbors
    (ties -> smaller vec_id), d̂ = n / Σ ln(r2/r1) over vectors with
    r1 > 0.  The corpus matrix is broadcast once; each batch emits a
    2-float partial (Σ ln μ, count) — nothing proportional to n²
    leaves the workers.  Returns one row (n_used, id_mle)."""
    corpus = ds.select_columns([id_col, col]).to_pandas()
    vid_all = corpus[id_col].to_numpy(np.int64)
    m_all = np.stack(corpus[col].to_numpy()).astype(np.float64)
    ref = ray.put((vid_all, m_all))

    def partial(t: pa.Table) -> pa.Table:
        vid, m = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        q = t[col].combine_chunks()
        if len(q) == 0:
            return pa.table({"s": pa.array([], pa.float64()),
                             "c": pa.array([], pa.int64())})
        qm = (q.flatten().to_numpy(zero_copy_only=False)
              .astype(np.float64).reshape(-1, m.shape[1]))
        qid = t[id_col].to_numpy(zero_copy_only=False)
        d2 = (np.maximum(
            (qm * qm).sum(1)[:, None] + (m * m).sum(1)[None, :]
            - 2.0 * (qm @ m.T), 0.0))
        s = 0.0
        c = 0
        for i in range(len(qid)):
            row = d2[i].copy()
            row[vid == qid[i]] = np.inf  # exclude self
            # two smallest by (distance, vec_id)
            order = np.lexsort((vid, row))[:2]
            r1 = float(np.sqrt(row[order[0]]))
            r2 = float(np.sqrt(row[order[1]]))
            if r1 > 0.0:
                s += float(np.log(r2 / r1))
                c += 1
        return pa.table({"s": pa.array([s]), "c": pa.array([c], pa.int64())})

    agg = ds.select_columns([id_col, col]).map_batches(
        partial, batch_format="pyarrow", batch_size=batch_size).to_pandas()
    total_s = float(agg["s"].sum())
    n_used = int(agg["c"].sum())
    mle = n_used / total_s if total_s > 0 else float("nan")
    return pd.DataFrame({"n_used": [np.int64(n_used)],
                         "id_mle": [np.round(mle, 6)]})


def hopkins_statistic(
    ds: ray.data.Dataset,
    m: int = 20,
    col: str = "embedding",
    id_col: str = "vec_id",
) -> pd.DataFrame:
    """Hopkins clusterability statistic H = Σu / (Σu + Σw) over the
    embedding table (H → 1 clustered, ≈ 0.5 uniform, → 0 regular).

    Deterministic and SQL-mirrorable end to end:
    * the m REAL probes are the rows with the smallest
      (splitmix64(vec_id), vec_id) — a reproducible uniform draw,
      the ``sample_by_hash`` convention;
    * the m SYNTHETIC probes are uniform in the per-dimension
      [min, max] box with coordinate j,k drawn as
      u = ((splitmix64(j·1000003 + k) >> 11) + 1) · 2⁻⁵³ —
      the weighted_sample_topk u-draw;
    * w_i = min distance from real probe i to any OTHER row (by id),
      u_j = min distance from synthetic probe j to any row.

    Distribution: dim bounds come from the existing d-row partial
    moments; the 2m probes are broadcast; each batch emits one
    (probe, local min distance) partial (2m rows per batch) and the
    driver min-combines #batches × 2m rows — the topk_cosine shape,
    nothing ∝ corpus size on the driver.  One row
    (m, sum_u, sum_w, hopkins), distances rounded to 9 before the
    sums."""
    import ray as _ray

    from pgd_ray.text.hashing import splitmix64

    # exact per-dim bounds (embedding_dim_stats rounds vmin/vmax to 6
    # for its own oracle — the box here must be bit-exact)
    def bounds_part(t: pa.Table) -> pa.Table:
        c = t[col].combine_chunks()
        if len(c) == 0:
            return pa.table({"k": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64()),
                             "mn": pa.array([], pa.float64()),
                             "mx": pa.array([], pa.float64())})
        flat = c.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        dd = len(c[0])
        mtx = flat.reshape(-1, dd)
        return pa.table({"k": pa.array(np.arange(dd), pa.int64()),
                         "cnt": pa.array(
                             np.full(dd, len(mtx)), pa.int64()),
                         "mn": pa.array(mtx.min(0), pa.float64()),
                         "mx": pa.array(mtx.max(0), pa.float64())})

    stats = (ds.select_columns([col])
             .map_batches(bounds_part, batch_format="pyarrow")
             .groupby("k")
             .aggregate(Sum("cnt", alias_name="n"),
                        Min("mn", alias_name="vmin"),
                        Max("mx", alias_name="vmax"))
             .to_pandas().sort_values("k"))
    if stats.empty or int(stats["n"].iloc[0]) <= m:
        return pd.DataFrame({"m": [np.int64(0)],
                             "sum_u": [np.nan], "sum_w": [np.nan],
                             "hopkins": [np.nan]})
    lo = stats["vmin"].to_numpy(np.float64)
    hi = stats["vmax"].to_numpy(np.float64)
    d = len(lo)

    # real probe ids: smallest m by (splitmix64(id), id)
    parts = []
    for b in ds.select_columns([id_col]).iter_batches(
            batch_size=1 << 20, batch_format="pyarrow"):
        if b.num_rows:
            ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            h = splitmix64(ids)
            k = min(m, len(ids))
            top = np.lexsort((ids, h))[:k]
            parts.append(np.stack([h[top].astype(np.int64), ids[top]], 1))
    cand = np.concatenate(parts)
    cand = cand[np.lexsort((cand[:, 1], cand[:, 0].astype(np.uint64)))][:m]
    probe_ids = cand[:, 1]

    # synthetic probes: uniform in the per-dim box
    j = np.arange(m, dtype=np.int64)
    jk = (j[:, None] * np.int64(1000003)) + np.arange(d, dtype=np.int64)[None, :]
    u01 = ((splitmix64(jk.ravel()) >> np.uint64(11)).astype(np.float64) + 1.0) \
        * 2.0 ** -53
    synth = lo + u01.reshape(m, d) * (hi - lo)

    # real probe vectors
    id_set = set(int(i) for i in probe_ids)
    vecs = {}
    for b in ds.select_columns([id_col, col]).iter_batches(
            batch_size=1 << 18, batch_format="pyarrow"):
        ids = b[id_col].to_numpy(zero_copy_only=False)
        hitm = np.isin(ids, probe_ids)
        if hitm.any():
            c = b[col].combine_chunks()
            flat = c.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
            mtx = flat.reshape(-1, d)
            for i in np.flatnonzero(hitm):
                vecs[int(ids[i])] = mtx[i]
    real = np.stack([vecs[int(i)] for i in probe_ids])

    probes_ref = _ray.put((synth, real, probe_ids))

    def local_min(t: pa.Table, probes_ref) -> pa.Table:
        synth, real, probe_ids = _HOPKINS_CACHE_GET(probes_ref)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        c = t[col].combine_chunks()
        flat = c.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        x = flat.reshape(len(ids), -1)
        out_kind, out_idx, out_d = [], [], []
        for kind, probes in ((0, synth), (1, real)):
            # direct (x - p)² per probe: the a²-2ab+b² BLAS form loses
            # precision by cancellation exactly at SMALL distances —
            # the minima this statistic keeps
            for i in range(len(probes)):
                d2 = ((x - probes[i]) ** 2).sum(1)
                if kind == 1:
                    d2[ids == probe_ids[i]] = np.inf
                out_kind.append(kind)
                out_idx.append(i)
                out_d.append(float(np.sqrt(d2.min())))
        return pa.table({"kind": pa.array(out_kind, pa.int64()),
                         "idx": pa.array(out_idx, pa.int64()),
                         "dmin": pa.array(out_d, pa.float64())})

    partial = ds.select_columns([id_col, col]).map_batches(
        local_min, batch_format="pyarrow", batch_size=8192,
        fn_kwargs={"probes_ref": probes_ref})
    best = (partial.groupby(["kind", "idx"])
            .aggregate(Min("dmin", alias_name="d"))
            .to_pandas())
    du = np.round(np.sort(best.loc[best["kind"] == 0, "d"].to_numpy()), 9)
    dw = np.round(np.sort(best.loc[best["kind"] == 1, "d"].to_numpy()), 9)
    su, sw = float(du.sum()), float(dw.sum())
    return pd.DataFrame({"m": [np.int64(m)],
                         "sum_u": [round(su, 9)],
                         "sum_w": [round(sw, 9)],
                         "hopkins": [round(su / (su + sw), 9)]})


_HOPKINS_CACHE: dict = {}


def _HOPKINS_CACHE_GET(ref):
    import ray as _ray

    ck = ref.hex() if isinstance(ref, _ray.ObjectRef) else None
    st = _HOPKINS_CACHE.get(ck)
    if st is None:
        st = _ray.get(ref) if ck is not None else ref
        if ck is not None:
            _HOPKINS_CACHE.clear()
            _HOPKINS_CACHE[ck] = st
    return st


def hard_negatives(
    ds: ray.data.Dataset,
    m: int = 10,
    k: int = 5,
    col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
) -> pd.DataFrame:
    """Deterministic hard-negative mining for contrastive training:
    for each of the ``m`` probe vectors (smallest
    (splitmix64(vec_id), vec_id) — the reproducible uniform draw),
    the ``k`` nearest corpus vectors with a DIFFERENT label
    (euclidean, ties → min vec_id).

    Distribution: probes broadcast once; each batch emits its local
    top-k per probe (≤ #batches·m·k driver rows — the topk_cosine
    merge shape); distances use the direct (x−p)² form (the Hopkins
    precision note).  Columns (probe_id, probe_label, rank,
    neighbor_id, neighbor_label, dist), rank 1-based, dist rounded
    to 9, ordered (probe_id, rank)."""
    import ray as _ray

    from pgd_ray.text.hashing import splitmix64

    parts = []
    for b in ds.select_columns([id_col]).iter_batches(
            batch_size=1 << 20, batch_format="pyarrow"):
        if b.num_rows:
            ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            h = splitmix64(ids)
            kk = min(m, len(ids))
            top = np.lexsort((ids, h))[:kk]
            parts.append(np.stack([h[top].astype(np.int64), ids[top]], 1))
    if not parts:
        return pd.DataFrame({
            "probe_id": pd.Series([], dtype=np.int64),
            "probe_label": pd.Series([], dtype=np.int64),
            "rank": pd.Series([], dtype=np.int64),
            "neighbor_id": pd.Series([], dtype=np.int64),
            "neighbor_label": pd.Series([], dtype=np.int64),
            "dist": pd.Series([], dtype=np.float64)})
    cand = np.concatenate(parts)
    cand = cand[np.lexsort((cand[:, 1], cand[:, 0].astype(np.uint64)))][:m]
    probe_ids = cand[:, 1]

    vecs, labs = {}, {}
    for b in ds.select_columns([id_col, col, label_col]).iter_batches(
            batch_size=1 << 18, batch_format="pyarrow"):
        ids = b[id_col].to_numpy(zero_copy_only=False)
        hitm = np.isin(ids, probe_ids)
        if hitm.any():
            c = b[col].combine_chunks()
            flat = c.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
            mtx = flat.reshape(len(ids), -1)
            lab = b[label_col].to_numpy(zero_copy_only=False)
            for i in np.flatnonzero(hitm):
                vecs[int(ids[i])] = mtx[i]
                labs[int(ids[i])] = int(lab[i])
    probes = np.stack([vecs[int(i)] for i in probe_ids])
    plabs = np.array([labs[int(i)] for i in probe_ids], np.int64)
    ref = _ray.put((probes, probe_ids, plabs, k))

    def local_top(t: pa.Table, ref) -> pa.Table:
        probes, pids, plabs, k = _HOPKINS_CACHE_GET(ref)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        lab = t[label_col].to_numpy(zero_copy_only=False).astype(np.int64)
        c = t[col].combine_chunks()
        flat = c.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        x = flat.reshape(len(ids), -1)
        op, on, od, ol = [], [], [], []
        for i in range(len(probes)):
            mask = (lab != plabs[i]) & (ids != pids[i])
            if not mask.any():
                continue
            d2 = ((x[mask] - probes[i]) ** 2).sum(1)
            mi = ids[mask]
            ml = lab[mask]
            kk = min(k, len(d2))
            sel = np.lexsort((mi, d2))[:kk]
            op += [int(pids[i])] * kk
            on += list(mi[sel])
            ol += list(ml[sel])
            od += list(np.sqrt(d2[sel]))
        return pa.table({"pid": pa.array(op, pa.int64()),
                         "nid": pa.array(on, pa.int64()),
                         "nlab": pa.array(ol, pa.int64()),
                         "d": pa.array(od, pa.float64())})

    cands = ds.select_columns([id_col, col, label_col]).map_batches(
        local_top, batch_format="pyarrow", batch_size=8192,
        fn_kwargs={"ref": ref}).to_pandas()
    rows = []
    for i, pid in enumerate(probe_ids):
        sub = cands[cands["pid"] == pid]
        sub = sub.sort_values(["d", "nid"]).head(k)
        for r, (_, row) in enumerate(sub.iterrows(), 1):
            rows.append((int(pid), int(plabs[i]), r, int(row["nid"]),
                         int(row["nlab"]), round(float(row["d"]), 9)))
    return pd.DataFrame(rows, columns=["probe_id", "probe_label", "rank",
                                       "neighbor_id", "neighbor_label",
                                       "dist"]).sort_values(
        ["probe_id", "rank"], ignore_index=True)
