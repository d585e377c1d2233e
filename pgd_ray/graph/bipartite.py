"""Bipartite user x event_type graph analytics: HITS and butterflies.

The bipartite graphs this engine meets (user x tool, user x event
type, doc x shard) are extremely skewed: one side is web-scale (users)
and the other is a small vocabulary (T event types / tools).  Both
operators here exploit that asymmetry so NOTHING quadratic in the
large side is ever formed:

* the **type co-occurrence matrix** M = B^T B (T x T) is built with
  one hash-partitioned self-join on ``user_id`` — per user the blowup
  is at most T^2 rows, so the exchange is O(|pairs| * T) worst case
  and the result is a <= T^2-row table;
* **HITS** (Kleinberg 1999) then collapses to a T-dimensional power
  iteration a <- normalize(M a) on the driver (T x T matmul — the
  classic "iterate on the gram matrix of the thin side" trick),
  followed by ONE distributed pass h = normalize(B a) for the
  user-side hub scores;
* **butterflies** (2x2 bicliques, Wang et al. 2014 "butterfly
  counting") come straight off M's off-diagonal: the pair (t1, t2)
  contributes C(codeg(t1,t2), 2) butterflies — codegree counting via
  wedge self-join is the standard distributed algorithm, done here
  from the side that makes the wedge count small.

Scale note: if BOTH sides were web-scale the self-join would need the
usual wedge mitigation (hash the smaller-degree endpoint, cap/sample
hub wedges); the vocabulary-side assumption is asserted by callers.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
from ray.data.aggregate import Count, Sum

from pgd_ray.util import read_parquet_clean


def bipartite_pairs(sf_dir: str) -> ray.data.Dataset:
    """Distinct (user_id, event_type) incidence pairs of the events
    table — a pruned 2-column read, deduplicated by hash aggregation
    (never a per-group Python call)."""
    ev = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )
    return (
        ev.groupby(["user_id", "event_type"])
        .aggregate(Count())
        .select_columns(["user_id", "event_type"])
    )


def type_comatrix(pairs: ray.data.Dataset, num_partitions: int = 8) -> pd.DataFrame:
    """Codegree matrix of the type side: rows (ta, tb, c) with
    c = |{users incident to both ta and tb}|, ta/tb over ALL ordered
    pairs incl. the diagonal (c(ta,ta) = type degree).  One
    hash-partitioned self-join on user_id, then a tiny groupby — the
    result has <= T^2 rows, which is what makes driver-side HITS on it
    legitimate."""

    def rn(t: pa.Table) -> pa.Table:
        return t.rename_columns(["uid", "tb"])

    left = pairs.materialize().repartition(num_partitions).materialize()
    right = left.map_batches(rn, batch_format="pyarrow").materialize()
    j = left.join(
        right, "inner", num_partitions,
        on=("user_id",), right_on=("uid",),
        aggregator_ray_remote_args={"num_cpus": 0.25},
    )
    out = (
        j.map_batches(
            lambda t: t.select(["event_type", "tb"]).rename_columns(["ta", "tb"]),
            batch_format="pyarrow",
        )
        .groupby(["ta", "tb"])
        .aggregate(Count(alias_name="c"))
        .to_pandas()
    )
    return out.sort_values(["ta", "tb"], ignore_index=True)


def _dense_comatrix(com: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
    types = np.sort(pd.unique(pd.concat([com["ta"], com["tb"]])))
    tid = {t: i for i, t in enumerate(types)}
    M = np.zeros((len(types), len(types)), dtype=np.float64)
    M[com["ta"].map(tid).to_numpy(), com["tb"].map(tid).to_numpy()] = (
        com["c"].to_numpy(np.float64)
    )
    return types, M


def hits_scores(
    sf_dir: str, iters: int = 32, num_partitions: int = 8
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """HITS hubs & authorities on the user x event_type incidence
    graph, as a FIXED number of power-iteration rounds (pure function
    of (graph, iters) — recursive-CTE-mirrorable).  Authorities:
    a_0 = uniform unit, a_k = M a_{k-1} / ||.||; hubs: one distributed
    pass h = B a_K / ||B a_K|| (groupby-sum over the pair table with
    the T-entry authority vector shipped by value).  Returns
    (authorities[event_type, authority], hubs[user_id, hub])."""
    pairs = bipartite_pairs(sf_dir).materialize()
    types, M = _dense_comatrix(type_comatrix(pairs, num_partitions))
    a = np.full(len(types), 1.0 / np.sqrt(len(types)))
    for _ in range(iters):
        a = M @ a
        nrm = np.linalg.norm(a)
        if nrm > 0:
            a = a / nrm
    amap = {t: float(v) for t, v in zip(types, a)}

    def score(t: pa.Table) -> pa.Table:
        et = t["event_type"].to_pandas()
        return pa.table({
            "user_id": t["user_id"],
            "s": et.map(amap).to_numpy(np.float64),
        })

    hubs_raw = (
        pairs.map_batches(score, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("s", alias_name="raw"))
        .to_pandas()
    )
    nrm = float(np.sqrt((hubs_raw["raw"].to_numpy() ** 2).sum()))
    hubs = pd.DataFrame({
        "user_id": hubs_raw["user_id"],
        "hub": np.round(hubs_raw["raw"].to_numpy() / nrm if nrm > 0
                        else hubs_raw["raw"].to_numpy(), 9),
    }).sort_values("user_id", ignore_index=True)
    auth = pd.DataFrame({"event_type": types, "authority": np.round(a, 9)})
    return auth, hubs


def butterflies_per_type(sf_dir: str, num_partitions: int = 8) -> pd.DataFrame:
    """Per-type butterfly (2x2-biclique) participation: for each type
    pair ta < tb with codegree c, each of the two types gains
    C(c, 2) butterflies.  Exact, integer."""
    pairs = bipartite_pairs(sf_dir)
    com = type_comatrix(pairs, num_partitions)
    off = com[com["ta"] < com["tb"]]
    cnt = (off["c"].to_numpy(np.int64) * (off["c"].to_numpy(np.int64) - 1)) // 2
    part = pd.concat([
        pd.DataFrame({"event_type": off["ta"], "butterflies": cnt}),
        pd.DataFrame({"event_type": off["tb"], "butterflies": cnt}),
    ])
    out = part.groupby("event_type", as_index=False)["butterflies"].sum()
    out["butterflies"] = out["butterflies"].astype(np.int64)
    return out.sort_values("event_type", ignore_index=True)
