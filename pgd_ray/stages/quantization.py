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
