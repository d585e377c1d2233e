"""Block-structured (vertex-range-partitioned) CSR build.

This is the scale path that replaces the round-1 driver-side assembly
(`pipelines/graph_build.py` streamed the whole sorted edge list to the
driver — O(2m) driver state, a scale-killer at 10^10+ edges).  Model:

  raw pairs ──canonicalize──symmetrize──(+range_id)──groupby(range_id)
      └─ ONE all-to-all; each reduce group is one contiguous vertex
         range [v_lo, v_hi) holding EVERY symmetrized row whose src is
         in the range, so the per-range (indptr, indices) fragment —
         including exact dedup, which is local because duplicates of a
         directed row always share a src — is built entirely inside
         the ``map_groups`` task, persisted as one parquet file per
         range (the ``CSRGraph.write`` layout), and summarized to the
         driver as ONE manifest row.

The driver therefore holds only O(#ranges) state.  The contiguous
adjacency the graphlet kernels broadcast-consume is concatenated by a
REMOTE task (``RangeCSR.assemble``) whose return arrays live in the
object store; the driver keeps ObjectRefs (and, when a caller needs a
materialized ``CSRGraph``, zero-copy plasma-backed views — never a
driver-heap copy of the edge stream).

Reference model being re-expressed: the CSC built once and shared by
every OpenMP thread (graphlet_core.h:84-86); the per-range layout is
SURVEY.md §1.3's "per-partition CSR blocks as Arrow tensors".
"""

from __future__ import annotations

import tempfile
from dataclasses import dataclass, field
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

from pgd_ray.graph.csr import CSRGraph
from pgd_ray.graph.normalize import canonicalize, densify, symmetrize, vertex_ids
from pgd_ray.util import default_blocks


def _fragment_path(out_dir: Path, rid: int) -> Path:
    return out_dir / f"range={rid:05d}.parquet"


def _write_fragment(
    out_dir: Path, rid: int, v_lo: int, v_hi: int, indptr: np.ndarray, indices: np.ndarray
) -> str:
    t = pa.table(
        {
            "range_id": pa.array([rid], pa.int64()),
            "v_lo": pa.array([v_lo], pa.int64()),
            "v_hi": pa.array([v_hi], pa.int64()),
            "indptr": pa.array([indptr], pa.large_list(pa.int64())),
            "indices": pa.array([indices], pa.large_list(pa.int64())),
        }
    )
    path = _fragment_path(out_dir, rid)
    tmp = path.with_suffix(".tmp")
    pq.write_table(t, tmp)
    tmp.rename(path)  # atomic: a resumed run never sees a partial file
    return str(path)


def _read_fragment(path: str | Path) -> tuple[int, int, np.ndarray, np.ndarray]:
    t = pq.read_table(path)
    return (
        t["v_lo"][0].as_py(),
        t["v_hi"][0].as_py(),
        np.asarray(t["indptr"][0].values),
        np.asarray(t["indices"][0].values),
    )


@ray.remote
def _read_fragment_task(path: str) -> tuple[np.ndarray, np.ndarray]:
    _, _, frag_ptr, frag_idx = _read_fragment(path)
    return frag_ptr, frag_idx


@ray.remote(num_returns=2)
def _assemble_remote(bounds: np.ndarray, paths: dict):
    """Concatenate per-range fragments into the contiguous broadcast
    arrays — runs in a worker; the returned arrays are owned by the
    caller and live in the object store (the driver only sees refs).
    Fragment parquet decode is the dominant cost (~100 ms × #ranges),
    so the reads fan out as nested tasks; only the O(nnz) memcpy
    concatenation is serial here."""
    n = int(bounds[-1])
    indptr = np.zeros(n + 1, dtype=np.int64)
    rids = [r for r in range(len(bounds) - 1) if paths.get(r) is not None]
    frags = ray.get([_read_fragment_task.remote(paths[r]) for r in rids])
    by_rid = dict(zip(rids, frags))
    parts = []
    nnz = 0
    for rid in range(len(bounds) - 1):
        v_lo, v_hi = int(bounds[rid]), int(bounds[rid + 1])
        if rid not in by_rid:
            indptr[v_lo + 1 : v_hi + 1] = nnz
            continue
        frag_ptr, frag_idx = by_rid[rid]
        indptr[v_lo + 1 : v_hi + 1] = frag_ptr[1:] + nnz
        nnz += len(frag_idx)
        parts.append(frag_idx)
    indices = np.concatenate(parts) if parts else np.empty(0, dtype=np.int64)
    return indptr, indices


@dataclass
class RangeCSR:
    """Manifest of a range-partitioned CSR: the driver-side handle is
    O(#ranges) — bounds, per-range paths and nnz — never the arrays."""

    n: int
    m: int  # undirected edge count (sum nnz / 2)
    bounds: np.ndarray  # int64 [P+1] vertex-range boundaries
    paths: dict  # range_id -> fragment parquet path (missing = empty range)
    nnz: dict  # range_id -> fragment entry count
    _asm: tuple | None = field(default=None, repr=False, compare=False)
    _frag_refs: dict | None = field(default=None, repr=False, compare=False)

    @property
    def num_ranges(self) -> int:
        return len(self.bounds) - 1

    def fragment_refs(self) -> dict:
        """{range_id: ObjectRef((indptr, indices))} — each fragment
        decoded ONCE by a remote task and pinned in plasma (the driver
        owns the refs, holds none of the arrays).  Workers attach the
        fragments they need zero-copy; this is the kernel-side
        'distributed shared adjacency' handle that replaces the
        whole-graph broadcast pair (no process ever needs the full
        (indptr, indices) concatenation)."""
        if self._frag_refs is None:
            self._frag_refs = {
                r: _read_fragment_task.remote(p) for r, p in self.paths.items()
            }
        return self._frag_refs

    def degrees(self) -> np.ndarray:
        """Per-vertex degree array (O(n) driver state — same footprint
        as any per-vertex state vector), read from fragment indptr
        columns only (indices never touch the driver)."""
        deg = np.zeros(self.n, dtype=np.int64)
        for rid, p in self.paths.items():
            t = pq.read_table(p, columns=["v_lo", "indptr"])
            v_lo = t["v_lo"][0].as_py()
            ptr = np.asarray(t["indptr"][0].values)
            deg[v_lo : v_lo + len(ptr) - 1] = np.diff(ptr)
        return deg

    def fragment(self, rid: int) -> tuple[int, int, np.ndarray, np.ndarray]:
        """(v_lo, v_hi, indptr, indices) of one range, loaded on demand."""
        p = self.paths.get(rid)
        v_lo, v_hi = int(self.bounds[rid]), int(self.bounds[rid + 1])
        if p is None:
            return v_lo, v_hi, np.zeros(v_hi - v_lo + 1, np.int64), np.empty(0, np.int64)
        return _read_fragment(p)

    def assemble(self) -> tuple:
        """(indptr_ref, indices_ref) of the contiguous adjacency,
        concatenated by a remote task; cached."""
        if self._asm is None:
            self._asm = _assemble_remote.remote(self.bounds, self.paths)
        return self._asm

    def to_csr(self) -> CSRGraph:
        """Materialized ``CSRGraph`` whose arrays are zero-copy
        plasma-backed views (read-only) — the driver heap never holds
        a private copy of the adjacency."""
        indptr_ref, indices_ref = self.assemble()
        return CSRGraph(
            n=self.n,
            m=self.m,
            indptr=ray.get(indptr_ref),
            indices=ray.get(indices_ref),
            _refs=(indptr_ref, indices_ref),
            range_csr=self,
        )

    def canonical_edges(self) -> ray.data.Dataset:
        """The canonical (src<dst, deduped) edge table as a Dataset of
        WORK-BALANCED blocks: one dynamic-generator task per range file
        expands its upper-triangular entries and yields chunks cut by
        cumulative src-degree volume, so a hub-heavy range becomes many
        blocks (one straggler kernel task otherwise dominates the whole
        stage on power-law graphs).  The driver collects only the chunk
        ObjectRefs (which it owns — task returns), never rows."""
        files = [self.paths[r] for r in sorted(self.paths)]
        if not files:
            return ray.data.from_arrow(
                pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
            )
        gens = [_expand_fragment.remote(f) for f in files]
        refs = [r for g in gens for r in ray.get(g)]
        return ray.data.from_arrow_refs(refs)


@ray.remote(num_returns="dynamic")
def _expand_fragment(path: str):
    """One fragment file → canonical (src<dst) edge chunks, cut by
    cumulative src-degree volume (the kernel's work driver) with a row
    cap.  Dynamic returns: each chunk is its own object, owned by the
    caller; the Dataset built from the refs has one block per chunk —
    measured fix for the 34 s hub-block straggler on power-law
    graphs."""
    _, _, indptr, indices = _read_fragment(path)
    v_lo_arr = pq.read_table(path, columns=["v_lo"])
    v_lo = v_lo_arr["v_lo"][0].as_py()
    deg = np.diff(indptr)
    src = np.repeat(np.arange(v_lo, v_lo + len(deg), dtype=np.int64), deg)
    up = indices > src
    src, dst = src[up], indices[up]
    if not len(src):
        yield pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
        return
    w = deg[src - v_lo]
    # monotone combined counter: a new chunk starts when EITHER the
    # volume or the row cap is crossed.  Caps sized so a typical graph
    # yields a few hundred kernel tasks — small enough to split hub
    # fragments, large enough that per-task fixed costs amortize.
    grp = np.cumsum(w) // 32_000_000 + np.arange(len(w)) // 131_072
    cuts = np.flatnonzero(np.diff(grp)) + 1
    for lo, hi in zip([0, *cuts.tolist()], [*cuts.tolist(), len(src)]):
        if hi > lo:
            yield pa.table({"src": src[lo:hi], "dst": dst[lo:hi]})


def _write_manifest(out_dir: Path, rcsr: "RangeCSR", vids: np.ndarray | None) -> None:
    """Atomic build manifest: with it, a re-run pointed at the same
    ``out_dir`` resumes instantly (skips the whole shuffle).  The
    manifest is written LAST, so a crashed build never leaves one."""
    import json

    if vids is not None:
        vp = out_dir / "vertex_ids.parquet"
        tmp = vp.with_suffix(".tmp")
        pq.write_table(pa.table({"vid": pa.array(np.asarray(vids), pa.int64())}), tmp)
        tmp.rename(vp)
    doc = {
        "n": rcsr.n,
        "m": rcsr.m,
        "bounds": [int(b) for b in rcsr.bounds],
        "ranges": {str(r): {"path": rcsr.paths[r], "nnz": int(rcsr.nnz[r])}
                   for r in rcsr.paths},
        "has_vids": vids is not None,
    }
    mp = out_dir / "manifest.json"
    tmp = mp.with_suffix(".tmp")
    tmp.write_text(json.dumps(doc))
    tmp.rename(mp)


def _load_manifest(out_dir: Path) -> tuple["RangeCSR", np.ndarray | None] | None:
    """Completed-build manifest → (RangeCSR, vids), or None if absent
    or any fragment file is missing (fall through to a fresh build)."""
    import json

    mp = out_dir / "manifest.json"
    if not mp.exists():
        return None
    doc = json.loads(mp.read_text())
    paths = {int(r): v["path"] for r, v in doc["ranges"].items()}
    if not all(Path(p).exists() for p in paths.values()):
        return None
    vids = None
    if doc.get("has_vids"):
        vp = out_dir / "vertex_ids.parquet"
        if not vp.exists():
            return None
        vids = pq.read_table(vp)["vid"].to_numpy(zero_copy_only=False)
    rcsr = RangeCSR(
        n=int(doc["n"]), m=int(doc["m"]),
        bounds=np.asarray(doc["bounds"], dtype=np.int64),
        paths=paths,
        nnz={int(r): int(v["nnz"]) for r, v in doc["ranges"].items()},
    )
    return rcsr, vids


def _balanced_bounds(canon: ray.data.Dataset, n: int, P: int) -> np.ndarray:
    """Degree-balanced range bounds (2-pass): a cheap histogram pass
    bins BOTH endpoints of every canonical edge into K uniform vertex
    buckets (= symmetrized rows per bucket, the reduce task's work
    driver), then cuts bucket edges at 1/P quantiles of the cumulative
    mass.  On power-law graphs uniform bounds give the hub range many
    times the median range's rows — one straggler reduce task; balanced
    bounds equalize the lexsort+dedup work.  Driver state: O(K)."""
    K = int(min(max(n, 1), max(1024, 16 * P)))
    width = -(-n // K)  # ceil: bucket b covers vertices [b*width, (b+1)*width)
    nb = -(-n // width)

    def hist(t: pa.Table) -> pa.Table:
        h = np.zeros(nb, np.int64)
        for col in ("src", "dst"):
            v = t[col].to_numpy(zero_copy_only=False)
            if len(v):
                h += np.bincount(v // width, minlength=nb)
        return pa.table({"h": pa.array([h], pa.large_list(pa.int64()))})

    rows = canon.map_batches(hist, batch_format="pyarrow").take_all()
    H = np.zeros(nb, np.int64)
    for r in rows:
        H += np.asarray(r["h"], dtype=np.int64)
    c = np.cumsum(H)
    total = int(c[-1]) if len(c) else 0
    if total == 0:
        return np.unique(np.linspace(0, n, P + 1).astype(np.int64))
    targets = np.arange(1, P) * (total / P)
    idx = np.searchsorted(c, targets)  # first bucket whose cum mass >= target
    edges = np.minimum((idx + 1) * width, n)
    return np.unique(np.concatenate([[0], edges, [n]])).astype(np.int64)


def build_range_csr(
    pairs: ray.data.Dataset,
    n: int | None = None,
    dense: bool = False,
    num_ranges: int | None = None,
    out_dir: str | Path | None = None,
    balance: bool = True,
    dedup: bool = True,
) -> tuple[RangeCSR, np.ndarray | None]:
    """Distributed CSR build with NO driver-side edge pass.

    ``pairs`` may be raw (dups / self-loops / either orientation ok).
    ``dedup=False`` KEEPS duplicate rows — the multigraph path: an
    integer-weighted graph enters as w parallel edges and every
    gather kernel then sums a neighbor w times, which is exactly the
    weighted message sum (weights stay in the data plane; no kernel
    changes).
    ``dense=True`` relabels vertices to dense [0, n) first (distinct +
    broadcast searchsorted remap) and returns the id table.  ``n``
    overrides the vertex-count inference (isolated trailing vertices).

    One all-to-all: ``groupby(range_id)``.  Dedup is free inside each
    range task (duplicates of a directed row share a src, hence a
    range).  Fragments are parquet files under ``out_dir`` (a fresh
    /tmp dir by default) in the resumable one-file-per-range layout;
    a completed build writes ``manifest.json`` LAST, and a re-run
    with the same ``out_dir`` resumes from it without re-reading the
    input (fragments are written atomically, so a crashed build is
    simply rebuilt — the manifest is the commit point).
    """
    if out_dir is not None:
        loaded = _load_manifest(Path(out_dir))
        if loaded is not None:
            return loaded
    canon = canonicalize(pairs)
    vids = None
    if dense:
        vids = vertex_ids(canon)
        canon = densify(canon, vids)
        n = len(vids)
    elif n is None:
        agg = canon.aggregate(
            ray.data.aggregate.Max("src", alias_name="ms"),
            ray.data.aggregate.Max("dst", alias_name="md"),
        )
        ms = agg.get("ms") if agg else None
        md = agg.get("md") if agg else None
        n = int(max(ms if ms is not None else -1, md if md is not None else -1) + 1)

    out_dir = Path(out_dir) if out_dir else Path(tempfile.mkdtemp(prefix="pgd_csr_", dir="/tmp"))
    out_dir.mkdir(parents=True, exist_ok=True)

    if n == 0:
        return RangeCSR(0, 0, np.array([0, 0], np.int64), {}, {}), vids

    # One materialization: the bounds pass, symmetrize and the shuffle
    # all read these blocks — without it each would re-run the
    # canonicalize(+densify) chain from the source.
    canon = canon.materialize()

    P = max(1, min(num_ranges or default_blocks(factor=4), max(n, 1)))
    if balance and n > P:
        bounds = _balanced_bounds(canon, n, P)
    else:
        bounds = np.unique(np.linspace(0, n, P + 1).astype(np.int64))
    if len(bounds) < 2:
        bounds = np.array([0, max(n, 0)], dtype=np.int64)

    sym = symmetrize(canon)

    def add_range(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy(zero_copy_only=False)
        rid = np.searchsorted(bounds, src, side="right") - 1
        return t.append_column("range_id", pa.array(rid.astype(np.int64)))

    def build_fragment(t: pa.Table) -> pa.Table:
        rid = int(t["range_id"][0].as_py())
        v_lo, v_hi = int(bounds[rid]), int(bounds[rid + 1])
        src = t["src"].to_numpy(zero_copy_only=False)
        dst = t["dst"].to_numpy(zero_copy_only=False)
        order = np.lexsort((dst, src))
        src, dst = src[order], dst[order]
        if dedup and len(src):  # exact dedup, local to the range
            keep = np.empty(len(src), dtype=bool)
            keep[0] = True
            keep[1:] = (src[1:] != src[:-1]) | (dst[1:] != dst[:-1])
            src, dst = src[keep], dst[keep]
        counts = np.bincount(src - v_lo, minlength=v_hi - v_lo)
        indptr = np.zeros(v_hi - v_lo + 1, dtype=np.int64)
        indptr[1:] = np.cumsum(counts)
        path = _write_fragment(out_dir, rid, v_lo, v_hi, indptr, dst)
        return pa.table(
            {
                "range_id": pa.array([rid], pa.int64()),
                "nnz": pa.array([len(dst)], pa.int64()),
                "path": pa.array([path], pa.string()),
            }
        )

    manifest = (
        sym.map_batches(add_range, batch_format="pyarrow")
        .groupby("range_id")
        .map_groups(build_fragment, batch_format="pyarrow")
        .take_all()
    )  # O(#ranges) rows — the ONLY thing the driver materializes
    paths = {r["range_id"]: r["path"] for r in manifest}
    nnz = {r["range_id"]: r["nnz"] for r in manifest}
    m = sum(nnz.values()) // 2
    rcsr = RangeCSR(n=n, m=m, bounds=bounds, paths=paths, nnz=nnz)
    _write_manifest(out_dir, rcsr, vids)
    return rcsr, vids
