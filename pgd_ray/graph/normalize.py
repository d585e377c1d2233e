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


def vertex_id_map(ds: ray.data.Dataset) -> tuple[ray.data.Dataset, int]:
    """DISTRIBUTED dense-id assignment (the >1e9-vertex path the
    broadcast ``vertex_ids`` can't serve — reference counterpart:
    the id remap at graphlet_core.cpp:372-444).

    Per-batch sorted-unique combiner → one global sort on ``v`` →
    position-keyed block dedup (``dedup_sorted_blocks``) → per-block
    dense ranks from O(#blocks) driver-held prefix offsets.  The
    driver never pulls a row of the vertex table: block row counts
    travel as scalars, rank assignment happens in one Ray task per
    block.  Returns ``(vmap, n)`` where ``vmap`` has columns
    ``(v, new_id)`` with ``new_id`` dense in sorted-``v`` order
    (identical to ``np.searchsorted(vertex_ids(ds), v)``)."""
    from pgd_ray.stages.distinct import dedup_sorted_blocks

    def to_v(t: pa.Table) -> pa.Table:
        vals = np.concatenate(
            [
                t["src"].to_numpy(zero_copy_only=False),
                t["dst"].to_numpy(zero_copy_only=False),
            ]
        )
        return pa.table({"v": np.unique(vals).astype(np.int64)})

    srt = (ds.map_batches(to_v, batch_format="pyarrow")
           .sort("v").materialize())
    dd = dedup_sorted_blocks(srt, ["v"]).materialize()
    refs = dd.to_arrow_refs()

    @ray.remote
    def _nrows(t) -> int:
        return t.num_rows

    counts = ray.get([_nrows.remote(r) for r in refs])
    offs = np.concatenate(([0], np.cumsum(counts, dtype=np.int64)))

    @ray.remote
    def _assign(t, off: int):
        if t.num_rows == 0:  # zero-row sort blocks may be schema-less
            return pa.table({"v": pa.array([], pa.int64()),
                             "new_id": pa.array([], pa.int64())})
        return pa.table({
            "v": pc.cast(t["v"], pa.int64()),
            "new_id": np.arange(off, off + t.num_rows, dtype=np.int64),
        })

    out = [_assign.remote(r, int(o)) for r, o in zip(refs, offs[:-1])]
    return ray.data.from_arrow_refs(out), int(offs[-1])


def densify_distributed(
    ds: ray.data.Dataset,
    vmap: ray.data.Dataset,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Remap an edge Dataset through a DISTRIBUTED ``(v, new_id)``
    map (``vertex_id_map``) with two hash joins — the shuffle-based
    alternative to ``densify`` for id tables too large to broadcast.
    The assignment is monotone in ``v``, so canonical ``src < dst``
    orientation survives the remap (same invariant as ``densify``)."""

    def keep_src(t: pa.Table) -> pa.Table:
        return pa.table({"dst": t["dst"], "nsrc": t["new_id"]})

    def finish(t: pa.Table) -> pa.Table:
        return _edge_table(t["nsrc"], t["new_id"])

    # the join aggregator pool needs num_partitions × 0.25 CPUs *up
    # front*: clamp partitions so the pool fits in at most half the
    # cluster (at 4 CPUs an unclamped 32-partition join demands 8
    # CPUs and hangs outright — observed), and materialize between
    # the two joins so both pools are never alive at once — same
    # discipline as graph/temporal.py
    cpus = int(ray.cluster_resources().get("CPU", 4))
    num_partitions = max(2, min(num_partitions, 2 * cpus))
    j = ds.join(vmap, "inner", num_partitions,
                on=("src",), right_on=("v",),
                aggregator_ray_remote_args={"num_cpus": 0.25})
    j = j.map_batches(keep_src, batch_format="pyarrow").materialize()
    j = j.join(vmap, "inner", num_partitions,
               on=("dst",), right_on=("v",),
               aggregator_ray_remote_args={"num_cpus": 0.25})
    return j.map_batches(finish, batch_format="pyarrow")


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
    ds: ray.data.Dataset,
    dense: bool = True,
    id_strategy: str = "broadcast",
    num_partitions: int = 32,
) -> tuple[ray.data.Dataset, np.ndarray | ray.data.Dataset | None]:
    """Full pipeline: canonicalize → dedup → (optional) dense relabel.

    ``id_strategy='broadcast'`` (default): returns ``(edge_ds, vids)``
    with ``vids`` a driver numpy array, ``vids[new_id] = old_id`` —
    right whenever the id table fits one node (it is the same O(n)
    array the caller holds for CSR anyway).

    ``id_strategy='distributed'``: the >1e9-vertex path — dense ids
    assigned by ``vertex_id_map`` (sort + position-keyed block dedup +
    O(#blocks) driver offsets) and applied by two hash joins
    (``densify_distributed``); returns ``(edge_ds, vmap)`` where
    ``vmap`` is the ``(v, new_id)`` DATASET.  The driver never holds a
    row of either table.  Both strategies produce identical edges
    (dense rank in sorted-id order).

    The returned Dataset has one row per undirected edge with
    ``src < dst`` in dense id space (None id table if ``dense=False``).
    """
    ds = dedup_edges(canonicalize(ds))
    if not dense:
        return ds, None
    if id_strategy == "distributed":
        # materialize the deduped edges: they are consumed twice (id
        # scan + remap joins), and leaving the dedup groupby lazy puts
        # its aggregator pool inside the join pipeline — two actor
        # pools contending is a deadlock on small CPU budgets
        ds = ds.materialize()
        vmap, _n = vertex_id_map(ds)
        return densify_distributed(ds, vmap, num_partitions), vmap
    vids = vertex_ids(ds)
    return densify(ds, vids), vids
