"""Market-basket co-occurrence mining over (order, part) incidences.

The pair-generation step is the standard distributed wedge expansion:
one hash-partitioned self-join on the basket key.  Per-basket blowup
is C(items, 2) — bounded here by TPC-H-style basket sizes (~7); a
corpus with mega-baskets needs the usual hub mitigation (cap or
sample items per basket) before the join, same note as
``graph.bipartite``.

``basket_lift`` then scores each frequent pair with the association
lift  P(a,b) / (P(a)·P(b)) = n_both · N / (n_a · n_b).  Only pairs
with ``n_both >= min_both`` ever reach the driver, and the item-count
side is filtered to the parts those pairs mention (broadcast set), so
driver memory is O(#frequent pairs), not O(#parts).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count

from pgd_ray.util import read_parquet_clean


def order_part_incidence(sf_dir: str) -> ray.data.Dataset:
    """Distinct (l_orderkey, l_partkey) pairs — hash-dedup, pruned
    2-column read."""
    li = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )
    return (
        li.groupby(["l_orderkey", "l_partkey"])
        .aggregate(Count())
        .select_columns(["l_orderkey", "l_partkey"])
    )


def pair_counts(sf_dir: str, num_partitions: int = 8) -> ray.data.Dataset:
    """Per-pair basket co-occurrence counts (part_a < part_b, n_both)."""

    def rn(t: pa.Table) -> pa.Table:
        return t.rename_columns(["okey", "part_b"])

    po = (
        order_part_incidence(sf_dir)
        .materialize()
        .repartition(num_partitions)
        .materialize()
    )
    right = po.map_batches(rn, batch_format="pyarrow").materialize()
    j = po.join(
        right, "inner", num_partitions,
        on=("l_orderkey",), right_on=("okey",),
        aggregator_ray_remote_args={"num_cpus": 0.25},
    )

    def orient(t: pa.Table) -> pa.Table:
        a = t["l_partkey"].to_numpy(zero_copy_only=False)
        b = t["part_b"].to_numpy(zero_copy_only=False)
        m = a < b
        return pa.table({"part_a": a[m], "part_b": b[m]})

    # per-pair count on the SORT path, not a hash aggregate: the pair
    # key's cardinality approaches the row count, exactly the regime
    # where Ray's hash groupby measured ~60× slower than sort +
    # run-length (638 s vs ~10 s at 30M rows — BASELINE.md session-6;
    # VERDICT r4 item 4)
    from pgd_ray.stages.distinct import count_sorted_blocks

    srt = (j.map_batches(orient, batch_format="pyarrow")
           .sort(["part_a", "part_b"]).materialize())
    return count_sorted_blocks(srt, ["part_a", "part_b"], alias="n_both")


def basket_lift(
    sf_dir: str, min_both: int = 3, num_partitions: int = 8
) -> pd.DataFrame:
    """Frequent pairs with association lift — columns
    (part_a, part_b, n_both, lift)."""
    po = order_part_incidence(sf_dir).materialize()
    n_orders = float(
        po.select_columns(["l_orderkey"])
        .groupby("l_orderkey").aggregate(Count()).count()
    )
    pairs = (
        pair_counts(sf_dir, num_partitions)
        .map_batches(
            lambda t: t.filter(pc.greater_equal(t["n_both"], min_both)),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    if pairs.empty:
        return pd.DataFrame({"part_a": pd.Series([], dtype=np.int64),
                             "part_b": pd.Series([], dtype=np.int64),
                             "n_both": pd.Series([], dtype=np.int64),
                             "lift": pd.Series([], dtype=np.float64)})
    needed = np.unique(np.concatenate([pairs["part_a"].to_numpy(),
                                       pairs["part_b"].to_numpy()]))
    needed_ref = ray.put(needed)

    def in_needed(t: pa.Table, needed_ref) -> pa.Table:
        nd = ray.get(needed_ref) if isinstance(needed_ref, ray.ObjectRef) \
            else needed_ref
        k = t["l_partkey"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(np.isin(k, nd)))

    ic = (
        po.groupby("l_partkey").aggregate(Count(alias_name="c"))
        .map_batches(in_needed, fn_kwargs={"needed_ref": needed_ref},
                     batch_format="pyarrow")
        .to_pandas()
        .set_index("l_partkey")["c"]
    )
    ca = pairs["part_a"].map(ic).to_numpy(np.int64)
    cb = pairs["part_b"].map(ic).to_numpy(np.int64)
    nb = pairs["n_both"].to_numpy(np.int64)
    lift = (nb.astype(np.float64) * n_orders) / (ca * cb).astype(np.float64)
    return pd.DataFrame({
        "part_a": pairs["part_a"].astype(np.int64),
        "part_b": pairs["part_b"].astype(np.int64),
        "n_both": nb,
        "lift": np.round(lift, 6),
    }).sort_values(["part_a", "part_b"], ignore_index=True)


# past this vocabulary size the mask path's int64 bit (1 << i) nears
# overflow (hard limit 63) and the driver's T²-pair fold over the mask
# histogram stops being cheap — switch to the pairwise aggregation
MASK_VOCAB_LIMIT = 32


def mask_overlap_counts(
    pairs: ray.data.Dataset, key_col: str, item_col: str, items: list
) -> tuple[pd.DataFrame, dict, int]:
    """Pairwise distinct-key overlap counts between every two items.

    ``pairs`` must be the DISTINCT ``(key_col, item_col)`` Dataset.
    Returns ``(pair_df[item_a, item_b, n_both], n_item dict,
    n_keys)`` with only co-occurring (n_both > 0) pairs, item_a <
    item_b in ``items`` order.

    Two shapes behind one contract (ADVICE r3):

    - ``T <= MASK_VOCAB_LIMIT``: per-key item bitmask (Sum of distinct
      bits = exact OR) → mask histogram via ``np.unique`` (∝ observed
      masks, NOT 2^T — the old ``np.bincount(minlength=2**T)``
      allocated 8·2^T bytes per batch) → driver fold.
    - larger vocabularies: per-key sorted item list via ``map_groups``
      emitting within-key pairs, then one pair-count hash aggregation
      — no bitmask, no 2^T anywhere, overflow-free.
    """
    from ray.data.aggregate import Count, Sum

    idx = {t: i for i, t in enumerate(items)}
    T = len(items)
    if T <= MASK_VOCAB_LIMIT:
        bit = {t: np.int64(1) << np.int64(i) for t, i in idx.items()}

        def to_bits(t: pa.Table) -> pa.Table:
            et = pd.Series(t[item_col].to_numpy(zero_copy_only=False))
            return pa.table({
                "k": t[key_col],
                "b": et.map(bit).to_numpy(np.int64),
            })

        masks = (pairs.map_batches(to_bits, batch_format="pyarrow")
                 .groupby("k").aggregate(Sum("b", alias_name="mask")))

        def hist(t: pa.Table) -> pa.Table:
            m = t["mask"].to_numpy(zero_copy_only=False)
            u, c = np.unique(m, return_counts=True)
            return pa.table({"mask": u.astype(np.int64),
                             "cnt": c.astype(np.int64)})

        h = (masks.map_batches(hist, batch_format="pyarrow")
             .groupby("mask").aggregate(Sum("cnt", alias_name="cnt"))
             .to_pandas())
        mask_arr = h["mask"].to_numpy(np.int64)
        cnt_arr = h["cnt"].to_numpy(np.int64)
        n_keys = int(cnt_arr.sum())
        n_item = {t: int(cnt_arr[(mask_arr >> i) & 1 > 0].sum())
                  for t, i in idx.items()}
        rows = []
        for i, ta in enumerate(items):
            ai = (mask_arr >> i) & 1 > 0
            for j in range(i + 1, T):
                both = int(cnt_arr[ai & ((mask_arr >> j) & 1 > 0)].sum())
                if both:
                    rows.append((ta, items[j], both))
        pair_df = pd.DataFrame(rows,
                               columns=["item_a", "item_b", "n_both"])
        return pair_df, n_item, n_keys

    # ---- large-vocabulary fallback: pairwise aggregation ----
    n_item = {r[item_col]: int(r["n"]) for r in
              pairs.groupby(item_col).aggregate(Count(alias_name="n"))
              .to_pandas().to_dict("records")}
    n_keys = int(pairs.groupby(key_col).aggregate(Count()).count())

    def key_pairs(g: pa.Table) -> pa.Table:
        it = sorted(g[item_col].to_pylist(), key=lambda x: idx[x])
        a, b = [], []
        for i in range(len(it)):
            for j in range(i + 1, len(it)):
                a.append(it[i])
                b.append(it[j])
        return pa.table({"item_a": pa.array(a, pa.string()),
                         "item_b": pa.array(b, pa.string())})

    pcnt = (pairs.groupby(key_col)
            .map_groups(key_pairs, batch_format="pyarrow")
            .groupby(["item_a", "item_b"])
            .aggregate(Count(alias_name="n_both"))
            .to_pandas()
            .sort_values(["item_a", "item_b"], ignore_index=True))
    return pcnt[["item_a", "item_b", "n_both"]], n_item, n_keys


def type_user_jaccard(sf_dir: str) -> pd.DataFrame:
    """Jaccard similarity between event types' DISTINCT-user sets —
    the audience-overlap affinity matrix.  Scale shape: one distinct
    (type, user) hash aggregation, then ``mask_overlap_counts`` (mask
    histogram for small vocabularies, pairwise aggregation beyond
    ``MASK_VOCAB_LIMIT``).  Nothing ∝ users reaches the driver.
    Columns (type_a, type_b, n_both, n_a, n_b, jaccard) for
    intersecting pairs, type_a < type_b."""
    from ray.data.aggregate import Count

    from pgd_ray.util import read_parquet_clean

    ev = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["event_type", "user_id"])
    pairs = (ev.groupby(["event_type", "user_id"])
             .aggregate(Count()).select_columns(["event_type", "user_id"])
             .materialize())
    types = sorted(pairs.groupby("event_type").aggregate(Count())
                   .to_pandas()["event_type"])
    pair_df, n_item, _ = mask_overlap_counts(
        pairs, "user_id", "event_type", types)
    rows = []
    for ta, tb, both in pair_df.itertuples(index=False):
        na, nb = n_item[ta], n_item[tb]
        rows.append((ta, tb, int(both), na, nb,
                     round(float(both) / (na + nb - both), 9)))
    return pd.DataFrame(rows, columns=["type_a", "type_b", "n_both",
                                       "n_a", "n_b", "jaccard"])
