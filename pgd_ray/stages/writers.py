"""Sinks (SURVEY.md §2.7): macro stats file, micro per-edge CSV in the
reference's golden format, and partitioned-parquet results layout.

The canonical sink for per-edge counts is partitioned Parquet
(``write_parquet`` on the micro Dataset — resumable, scalable); the
CSV writer exists for byte-level compatibility with the reference's
committed goldens (``sample_graph.csv``)."""

from __future__ import annotations

from pathlib import Path

import ray.data

from pgd_ray.graph.graphlets import MACRO_KEYS, MacroCounts

# header of write_micro_stats (graphlet_core.cpp:1668-1761)
MICRO_HEADER = (
    "% src,dst,triangle,2-star,4-clique,4-chordal-cycle,"
    "4-tailed-triangle,4-cycle,3-star,4-path"
)
_MICRO_COLS = [
    "triangle",
    "star2",
    "clique4",
    "chordal4",
    "tailed4",
    "cycle4",
    "star3",
    "path4",
]


def write_macro_stats(mac: MacroCounts, path: str | Path) -> None:
    """``name = value`` lines, 17 counters (graphlet_core.cpp:2138-2162)."""
    lines = [f"{k} = {mac[k]}" for k in MACRO_KEYS]
    p = Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    tmp = p.with_suffix(p.suffix + ".tmp")
    tmp.write_text("\n".join(lines) + "\n")
    tmp.rename(p)


def write_micro_csv(
    micro_ds: ray.data.Dataset,
    path: str | Path,
    one_based: bool = True,
    sort_degree_desc: bool = True,
    degree_vec=None,
) -> None:
    """PGD-compatible micro CSV (graphlet_core.cpp:1668-1761): ids
    emitted 1-based regardless of input base (SURVEY.md Q7); rows in
    degree-descending E_ordered order when ``sort_degree_desc`` (the
    reference default).  Compat mode only — use ``write_parquet`` on
    the micro Dataset for real pipelines."""
    df = micro_ds.to_pandas()
    if sort_degree_desc and degree_vec is not None:
        key = degree_vec[df["src"].to_numpy()] + degree_vec[df["dst"].to_numpy()]
        df = df.assign(_k=key).sort_values(
            ["_k", "src", "dst"], ascending=[False, False, False]
        ).drop(columns="_k")
    if one_based:
        df = df.assign(src=df["src"] + 1, dst=df["dst"] + 1)
    p = Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    with open(p, "w") as f:
        f.write(MICRO_HEADER + "\n")
        df[["src", "dst", *_MICRO_COLS]].to_csv(f, header=False, index=False)


def write_micro_parquet(micro_ds: ray.data.Dataset, out_dir: str | Path) -> None:
    """Canonical sink: a directory of part files (resumable layout)."""
    micro_ds.write_parquet(str(out_dir))


def counts_csv_line(mac: MacroCounts, delim: str = ",") -> str:
    """One-line names/values writers (graphlet_core.cpp:2086-2136)."""
    names = delim.join(MACRO_KEYS)
    vals = delim.join(str(mac[k]) for k in MACRO_KEYS)
    return names + "\n" + vals + "\n"
