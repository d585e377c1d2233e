"""Rich-club coefficients and the s-metric.

phi(k) = 2·E_k / (N_k·(N_k−1)): the edge density among vertices with
degree > k — how tightly the hubs interconnect (Colizza et al. 2006,
unnormalized).  The s-metric (Li et al. 2005) is Σ_{(u,v)∈E}
deg(u)·deg(v), the scalar the rich-club curve integrates.

Ray shape: ONE pass over the edge Dataset with the degree vector
broadcast (`ray.put` once, zero-copy per worker) emitting, per batch,
a |ks|-vector of partial E_k counts plus a partial s — reduced
driver-side to |ks|+1 numbers.  N_k comes from the same broadcast
degrees (an O(n) driver count, already resident for the CSR).  No
shuffle at any size; the degree broadcast is the CSR's existing
ceiling, not a new one.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def rich_club(
    eds: ray.data.Dataset,
    degrees: np.ndarray,
    ks: list[int],
    batch_size: int = 1 << 18,
) -> pd.DataFrame:
    """(k, n_k, e_k, phi) per threshold — phi = 0 when n_k < 2."""
    ks = sorted(ks)
    deg_ref = ray.put(degrees.astype(np.int64))
    kv = np.asarray(ks, np.int64)

    def part(t: pa.Table, deg_ref=deg_ref, kv=kv) -> pa.Table:
        deg = ray.get(deg_ref)
        s = t["src"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)
        ds_, dd = deg[s], deg[d]
        mn = np.minimum(ds_, dd)
        # edge counts toward E_k for every k < min(deg(u), deg(v));
        # one sorted-insertion per edge instead of |ks| passes
        e_k = np.array([(mn > k).sum() for k in kv], np.int64)
        smetric = int((ds_ * dd).sum())
        return pa.table({"i": pa.array(np.arange(len(kv) + 1), pa.int64()),
                         "val": pa.array(np.append(e_k, smetric), pa.int64())})

    tot = np.zeros(len(kv) + 1, np.int64)
    for b in eds.map_batches(part, batch_format="pyarrow",
                             batch_size=batch_size).iter_batches(
            batch_size=None, batch_format="pyarrow"):
        i = b["i"].to_numpy(zero_copy_only=False)
        v = b["val"].to_numpy(zero_copy_only=False)
        np.add.at(tot, i, v)
    n_k = np.array([(degrees > k).sum() for k in kv], np.int64)
    e_k = tot[:len(kv)]
    phi = np.where(n_k >= 2, 2.0 * e_k / np.maximum(n_k * (n_k - 1), 1), 0.0)
    out = pd.DataFrame({"k": kv, "n_k": n_k, "e_k": e_k,
                        "phi": np.round(phi, 9)})
    out.attrs["s_metric"] = int(tot[-1])
    return out


def s_metric(eds: ray.data.Dataset, degrees: np.ndarray) -> int:
    """Σ_{(u,v)∈E} deg(u)·deg(v) over canonical edges."""
    return int(rich_club(eds, degrees, ks=[0]).attrs["s_metric"])
