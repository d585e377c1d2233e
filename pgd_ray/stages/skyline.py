"""Skyline (Pareto-frontier) query: the classic multi-criteria
operator relational engines bolt on — here over ``part`` with
(minimize p_retailprice, maximize p_size): a part survives iff no
other part is at-least-as-cheap AND at-least-as-big with one strict.

Distribution: the skyline of a union is the skyline of the per-block
skylines, so one vectorized per-block filter (sort by (price asc,
size desc); dominated iff a strictly-cheaper row reaches your size,
or your price group's max size beats you) prunes each block to its
local frontier, and the driver applies the SAME exact rule to the
O(Σ local frontier) candidates.  Equal (price, size) duplicates are
mutually non-dominating and all survive (the NOT EXISTS semantics).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def _frontier(price: np.ndarray, size: np.ndarray) -> np.ndarray:
    """Boolean keep-mask under (min price, max size) dominance."""
    n = len(price)
    if n == 0:
        return np.zeros(0, dtype=bool)
    order = np.lexsort((-size, price))
    p, s = price[order], size[order]
    # best size among STRICTLY cheaper rows (prefix max shifted past
    # each price group)
    grp_start = np.concatenate(([True], p[1:] != p[:-1]))
    # running max of size up to the previous price group
    run = np.maximum.accumulate(s)
    prev_group_best = np.full(n, -np.inf)
    idx_start = np.flatnonzero(grp_start)
    for gi in range(1, len(idx_start)):
        a = idx_start[gi]
        prev_group_best[a:(idx_start[gi + 1] if gi + 1 < len(idx_start)
                           else n)] = run[a - 1]
    dominated = prev_group_best >= s
    # equal-price dominators with strictly larger size
    grp_id = np.cumsum(grp_start) - 1
    grp_max = np.zeros(len(idx_start))
    np.maximum.at(grp_max, grp_id, s)
    dominated |= s < grp_max[grp_id]
    keep = np.zeros(n, dtype=bool)
    keep[order] = ~dominated
    return keep


def skyline_parts(sf_dir: str) -> pd.DataFrame:
    """Columns (p_partkey, p_retailprice, p_size): the Pareto
    frontier, ordered by p_partkey."""
    from pgd_ray.util import read_parquet_clean

    ds = read_parquet_clean(f"{sf_dir}/part.parquet",
                            columns=["p_partkey", "p_retailprice",
                                     "p_size"])

    def block(t: pa.Table) -> pa.Table:
        pr = t["p_retailprice"].to_numpy(zero_copy_only=False)
        sz = t["p_size"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.filter(pa.array(_frontier(pr.astype(np.float64), sz)))

    cand = ds.map_batches(block, batch_format="pyarrow").to_pandas()
    if cand.empty:
        return pd.DataFrame({"p_partkey": pd.Series([], dtype=np.int64),
                             "p_retailprice": pd.Series([], dtype=float),
                             "p_size": pd.Series([], dtype=np.int64)})
    keep = _frontier(cand["p_retailprice"].to_numpy(np.float64),
                     cand["p_size"].to_numpy(np.int64))
    out = cand[keep].sort_values("p_partkey", ignore_index=True)
    out["p_partkey"] = out["p_partkey"].astype(np.int64)
    out["p_size"] = out["p_size"].astype(np.int64)
    return out[["p_partkey", "p_retailprice", "p_size"]]
