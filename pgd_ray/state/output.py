"""Resumable partitioned-parquet output (north rule: per-partition
lineage + metrics; SURVEY.md §4.1 "resumable output layout").

``write_partitioned`` writes a Dataset as one parquet directory per
key-range/shard with an atomic manifest recording completed partitions
and row counts; ``completed_partitions`` lets a re-run skip finished
shards.  Never one giant file."""

from __future__ import annotations

import json
import time
from pathlib import Path

import ray.data


def write_partitioned(
    ds: ray.data.Dataset,
    out_dir: str | Path,
    partition_id: str = "part0",
    min_rows_per_file: int = 500_000,
) -> dict:
    """Write one logical partition; returns its manifest entry.

    A pipeline that processes input shard-by-shard calls this once per
    shard with a distinct ``partition_id``; a rerun consults
    ``completed_partitions`` first and skips finished ones."""
    out_dir = Path(out_dir)
    pdir = out_dir / f"partition={partition_id}"
    if (pdir / "_SUCCESS").exists():
        return json.loads((pdir / "_SUCCESS").read_text())
    t0 = time.perf_counter()
    ds.write_parquet(str(pdir), min_rows_per_file=min_rows_per_file)
    # Count what was actually written (parquet footer metadata — no
    # data read) instead of ds.count(), which would re-execute the
    # whole lazy upstream pipeline a second time.
    import pyarrow.parquet as pq

    rows = sum(
        pq.ParquetFile(f).metadata.num_rows for f in pdir.glob("*.parquet")
    )
    entry = {
        "partition": partition_id,
        "rows": rows,
        "sec": round(time.perf_counter() - t0, 3),
    }
    tmp = pdir / "._SUCCESS.tmp"
    tmp.write_text(json.dumps(entry))
    tmp.rename(pdir / "_SUCCESS")
    _update_manifest(out_dir, entry)
    return entry


def _update_manifest(out_dir: Path, entry: dict) -> None:
    mpath = out_dir / "manifest.json"
    manifest = {"partitions": {}}
    if mpath.exists():
        manifest = json.loads(mpath.read_text())
    manifest["partitions"][entry["partition"]] = entry
    tmp = out_dir / ".manifest.json.tmp"
    tmp.write_text(json.dumps(manifest, indent=1))
    tmp.rename(mpath)


def completed_partitions(out_dir: str | Path) -> set[str]:
    mpath = Path(out_dir) / "manifest.json"
    if not mpath.exists():
        return set()
    return set(json.loads(mpath.read_text())["partitions"])
