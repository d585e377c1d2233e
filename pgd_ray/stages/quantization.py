"""Int8 scalar quantization of an embedding column.

The standard 4× vector-store compression: per-dimension [min, max] is
mapped onto 256 levels; code = clip(floor((v-mn)/scale + 0.5), 0, 255)
with scale = (mx-mn)/255.  This module trains the per-dim ranges and
reports per-vector reconstruction error — the go/no-go number before
switching an ANN index to int8.

Distribution: pass 1 reuses the ``embedding_dim_stats`` shape (d-row
partials per batch → d-row groupby) for the ranges; pass 2 is one
streamed map_batches against the broadcast (mn, scale) vectors.  Every
arithmetic step (subtract, divide, floor(+0.5), clip, multiply, add)
is elementwise IEEE double — the DuckDB oracle replays it
bit-identically (floor(x+0.5) in BOTH engines; never round(), whose
half-way rule differs between numpy and SQL).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Max, Min


def train_ranges(ds: ray.data.Dataset, col: str = "embedding") -> pd.DataFrame:
    """(dim, mn, mx) per dimension — one streamed pass."""

    def partial(t: pa.Table) -> pa.Table:
        c = t[col].combine_chunks()
        if len(c) == 0:
            return pa.table({"dim": pa.array([], pa.int64()),
                             "mn": pa.array([], pa.float64()),
                             "mx": pa.array([], pa.float64())})
        flat = c.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        m = flat.reshape(len(c), -1)
        d = m.shape[1]
        return pa.table({"dim": np.arange(d, dtype=np.int64),
                         "mn": m.min(axis=0), "mx": m.max(axis=0)})

    out = (
        ds.select_columns([col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("dim")
        .aggregate(Min("mn", alias_name="mn"), Max("mx", alias_name="mx"))
        .to_pandas()
    )
    return out.sort_values("dim", ignore_index=True)


def quantization_error(
    ds: ray.data.Dataset,
    col: str = "embedding",
    id_col: str = "vec_id",
) -> ray.data.Dataset:
    """(vec_id, sse, max_abs_err) of the int8 round-trip per vector.
    Degenerate dimensions (mx == mn) reconstruct exactly."""
    rng = train_ranges(ds, col)
    mn = rng["mn"].to_numpy()
    mx = rng["mx"].to_numpy()
    scale = (mx - mn) / 255.0
    state = ray.put((mn, scale))

    def err(t: pa.Table, state_ref=state) -> pa.Table:
        mn, scale = ray.get(state_ref)
        c = t[col].combine_chunks()
        ids = t[id_col].to_numpy(zero_copy_only=False)
        if len(c) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "sse": pa.array([], pa.float64()),
                             "max_abs_err": pa.array([], pa.float64())})
        flat = c.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        m = flat.reshape(len(c), -1)
        live = scale > 0
        recon = np.broadcast_to(mn, m.shape).copy()
        if live.any():
            q = (m[:, live] - mn[live]) / scale[live]
            code = np.clip(np.floor(q + 0.5), 0.0, 255.0)
            recon[:, live] = mn[live] + code * scale[live]
        e = m - recon
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "sse": pa.array((e * e).sum(axis=1), pa.float64()),
            "max_abs_err": pa.array(np.abs(e).max(axis=1), pa.float64()),
        })

    return ds.select_columns([id_col, col]).map_batches(
        err, batch_format="pyarrow")


def pq_codes(
    emb: ray.data.Dataset,
    m: int = 4,
    k: int = 16,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[ray.data.Dataset, np.ndarray]:
    """Product quantization (the IVF-PQ compression path): the d dims
    are split into ``m`` contiguous subspaces and each subspace gets
    its own ``k``-centroid Lloyd codebook (the engine's bit-stable
    round-6 ``kmeans_fit``, run per subspace over a sliced view of the
    corpus); codes = per-subspace argmin centroid (ties → smallest
    id, the kmeans assignment contract).  Returns (codes Dataset with
    columns [id_col, code_0..code_{m-1}, sqerr], centroid tensor
    (m, k, d/m)); sqerr is the squared reconstruction error, rounded
    to 6.  Storage: d floats → m uint8-sized codes per vector.

    Distribution: m×iters streamed Lloyd passes (partial-sum shuffles
    of k·d/m rows each) + ONE encode pass against the broadcast
    codebooks — nothing ∝ corpus rows ever reaches the driver."""
    from pgd_ray.graph.cache import get_cached
    from pgd_ray.stages.clustering import kmeans_fit

    first = emb.select_columns([vec_col]).limit(1).to_pandas()
    if first.empty:
        raise ValueError("pq_codes: empty embedding table")
    d = len(first[vec_col].iloc[0])
    if d % m != 0:
        raise ValueError(f"pq_codes: dim {d} not divisible by m={m}")
    sub = d // m

    src = emb.select_columns([id_col, vec_col]).materialize()
    cents = []
    for j in range(m):
        lo = j * sub

        def slice_batch(t: pa.Table, lo=lo) -> pa.Table:
            c = t[vec_col].combine_chunks()
            if len(c) == 0:
                return pa.table({id_col: t[id_col], vec_col: c})
            flat = (c.flatten().to_numpy(zero_copy_only=False)
                    .astype(np.float64).reshape(len(c), -1))
            from pgd_ray.util import list_array_2d

            return pa.table({id_col: t[id_col],
                             vec_col: list_array_2d(flat[:, lo:lo + sub])})

        sliced = src.map_batches(slice_batch, batch_format="pyarrow")
        _, cj = kmeans_fit(sliced, k=k, iters=iters,
                           vec_col=vec_col, id_col=id_col)
        cents.append(cj)
    C = np.stack(cents)  # (m, k, sub)
    cref = ray.put(C)

    def encode(t: pa.Table) -> pa.Table:
        Cb = get_cached(cref)
        c = t[vec_col].combine_chunks()
        cols = {id_col: t[id_col]}
        if len(c) == 0:
            for j in range(m):
                cols[f"code_{j}"] = pa.array([], pa.int64())
            cols["sqerr"] = pa.array([], pa.float64())
            return pa.table(cols)
        X = (c.flatten().to_numpy(zero_copy_only=False)
             .astype(np.float64).reshape(len(c), -1))
        err = np.zeros(len(X))
        for j in range(m):
            Xj = X[:, j * sub:(j + 1) * sub]
            d2 = ((Xj[:, None, :] - Cb[j][None, :, :]) ** 2).sum(axis=2)
            a = np.argmin(d2, axis=1)
            cols[f"code_{j}"] = pa.array(a.astype(np.int64))
            err += d2[np.arange(len(X)), a]
        cols["sqerr"] = pa.array(np.round(err, 6))
        return pa.table(cols)

    return src.map_batches(encode, batch_format="pyarrow"), C
