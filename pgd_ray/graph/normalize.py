"""Edge-table normalization: the Ray-Data re-expression of the
reference's edge-list ETL semantics (self-loop removal, undirected
symmetrization, exact dedup, dense vertex relabeling).

Reference semantics being reproduced (see SURVEY.md §1.2/§2.2):
  - self-loop removal          graphlet_core.cpp:391,423
  - undirected symmetrization  graphlet_core.cpp:404-405,437-438
  - exact duplicate removal    graphlet_core.cpp:530-556
  - dense vertex relabel       graphlet_core.cpp:393-403,425-435
    (the reference relabels in first-seen file order; file order is
    meaningless under a distributed shuffle, so we relabel in sorted-id
    order — a deterministic, order-independent choice.  All counts are
    invariant to the relabeling.)

All transforms are vectorized ``map_batches`` over zero-copy Arrow
batches; the only shuffles are the ``groupby`` for exact dedup and the
distinct-vertex pass for dense ids.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

EDGE_SCHEMA = pa.schema([("src", pa.int64()), ("dst", pa.int64())])


def _edge_table(src, dst) -> pa.Table:
    return pa.table({"src": src, "dst": dst})


def drop_self_loops(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Remove rows with src == dst (graphlet_core.cpp:391)."""

    def fn(t: pa.Table) -> pa.Table:
        return t.filter(pc.not_equal(t["src"], t["dst"]))

    return ds.map_batches(fn, batch_format="pyarrow")


def canonicalize(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Orient every edge as (min, max) and drop self-loops.

    The reference additionally stores the lower-DEGREE endpoint first
    (graphlet_core.cpp:938-946) as a skew optimization; that swap is
    applied inside the graphlet kernel (which has the degree array),
    not in the stored table — the stored canonical form is (lo, hi) by
    vertex id so that exact dedup has a stable key.
    """

    def fn(t: pa.Table) -> pa.Table:
        s, d = t["src"], t["dst"]
        lo = pc.min_element_wise(s, d)
        hi = pc.max_element_wise(s, d)
        out = _edge_table(pc.cast(lo, pa.int64()), pc.cast(hi, pa.int64()))
        return out.filter(pc.not_equal(out["src"], out["dst"]))

    return ds.map_batches(fn, batch_format="pyarrow")


def _batch_distinct(t: pa.Table) -> pa.Table:
    """Per-batch combiner: local exact dedup before the shuffle."""
    if t.num_rows == 0:
        return t.select(["src", "dst"])
    src = t["src"].to_numpy(zero_copy_only=False)
    dst = t["dst"].to_numpy(zero_copy_only=False)
    arr = np.stack([src, dst], axis=1)
    arr = np.unique(arr, axis=0)
    return _edge_table(arr[:, 0], arr[:, 1])


def dedup_edges(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Exact duplicate-edge removal (graphlet_core.cpp:530-556).

    Per-batch ``np.unique`` combiner first (shrinks the shuffle), then
    a hash-partitioned ``groupby(["src","dst"])`` keeps one row per
    canonical edge.  Scales as an all-to-all on the (already reduced)
    edge key space.
    """
    ds = ds.map_batches(_batch_distinct, batch_format="pyarrow")
    return (
        ds.groupby(["src", "dst"])
        .count()
        .select_columns(["src", "dst"])
    )


def symmetrize(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Emit both (v,u) and (u,v) per row (graphlet_core.cpp:404-405)."""

    def fn(t: pa.Table) -> pa.Table:
        src = pa.concat_arrays([t["src"].combine_chunks(), t["dst"].combine_chunks()])
        dst = pa.concat_arrays([t["dst"].combine_chunks(), t["src"].combine_chunks()])
        return _edge_table(src, dst)

    return ds.map_batches(fn, batch_format="pyarrow")


def vertex_ids(ds: ray.data.Dataset) -> np.ndarray:
    """Sorted distinct vertex ids of an edge Dataset.

    Per-batch sorted-unique combiner in ``map_batches``, merged with
    one ``np.unique`` on the driver.  The driver-side input is
    O(#batches × distinct-per-batch), and the RESULT is the O(n) id
    table the caller holds anyway — so a distributed distinct
    (groupby) would only re-shuffle rows the driver must collect
    regardless (measured: the groupby variant was 80× slower on a
    20 M-edge table).  Scale path for >1e9 vertices: a per-node
    second-level unique combiner before the driver merge, or keep the
    distinct table as a Dataset and zip with per-block offsets.
    """

    def to_v(t: pa.Table) -> pa.Table:
        vals = np.concatenate(
            [
                t["src"].to_numpy(zero_copy_only=False),
                t["dst"].to_numpy(zero_copy_only=False),
            ]
        )
        return pa.table({"v": np.unique(vals)})

    parts = [
        b["v"].to_numpy(zero_copy_only=False)
        for b in ds.map_batches(to_v, batch_format="pyarrow").iter_batches(
            batch_size=1 << 20, batch_format="pyarrow"
        )
        if b.num_rows
    ]
    if not parts:
        return np.array([], dtype=np.int64)
    return np.unique(np.concatenate(parts)).astype(np.int64)


def densify(ds: ray.data.Dataset, vids: np.ndarray) -> ray.data.Dataset:
    """Remap raw vertex ids to dense [0, n) via the sorted id table.

    The mapping array is broadcast once with ``ray.put`` and looked up
    with ``np.searchsorted`` inside each batch — a broadcast join, no
    shuffle (SURVEY.md §2.8).
    """
    from pgd_ray.graph.cache import get_cached

    vids = np.ascontiguousarray(vids)
    use_lut = False
    if len(vids):
        span = int(vids[-1]) - int(vids[0]) + 1
        use_lut = span <= max(16 * len(vids), 1 << 22)
        if use_lut:
            lut = np.zeros(span, dtype=np.int64)
            lut[vids - vids[0]] = np.arange(len(vids))
            ref = ray.put((int(vids[0]), lut))
        else:
            ref = ray.put(vids)
    else:
        ref = ray.put(vids)

    def remap(t: pa.Table) -> pa.Table:
        obj = get_cached(ref)
        s = t["src"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)
        if use_lut:
            base, lu = obj
            src, dst = lu[s - base], lu[d - base]
        else:
            src, dst = np.searchsorted(obj, s), np.searchsorted(obj, d)
        return _edge_table(src.astype(np.int64), dst.astype(np.int64))

    return ds.map_batches(remap, batch_format="pyarrow")


def normalize_edges(
    ds: ray.data.Dataset, dense: bool = True
) -> tuple[ray.data.Dataset, np.ndarray | None]:
    """Full pipeline: canonicalize → dedup → (optional) dense relabel.

    Returns ``(canonical_edge_ds, vids)`` where ``vids[new_id] = old_id``
    (None when ``dense=False``).  The returned Dataset has one row per
    undirected edge with ``src < dst`` in dense id space.
    """
    ds = dedup_edges(canonicalize(ds))
    if not dense:
        return ds, None
    vids = vertex_ids(ds)
    return densify(ds, vids), vids
