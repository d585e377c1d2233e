"""CLI entry point — the Ray-native analogue of the reference's ``pgd``
driver (graphlet_driver.cpp:53-92, flags graphlet_params.h:216-287).

    python -m pgd_ray -f graph.mtx --macro out_macro.txt
    python -m pgd_ray -f edges.csv --micro out_micro.csv -w 16 -o degree
    python -m pgd_ray -f transcripts_dir --transcripts --pagerank pr.parquet

Designed for ``ray job submit -- python -m pgd_ray ...`` on a cluster;
standalone it initialises a local Ray session itself.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="pgd_ray", description=__doc__)
    p.add_argument("-f", "--file", required=True,
                   help="edge list (.csv/.txt/.edges), .mtx, or a directory of transcript parquet")
    p.add_argument("--transcripts", action="store_true",
                   help="treat input as transcript parquet (events-derived schema)")
    p.add_argument("-w", "--workers", type=int, default=8)
    p.add_argument("-o", "--ordering", default="degree",
                   help="edge ordering strategy (scheduling only; see functions.ordering)")
    p.add_argument("--neigh-ordering", default="natural",
                   help="per-vertex neighbor ordering (O4; scheduling only)")
    p.add_argument("--s2l-neigh", action="store_true",
                   help="ascending neighbor ordering (reference --s2l_neigh)")
    p.add_argument("--macro", metavar="PATH", help="write macro counts (name = value lines)")
    p.add_argument("--micro", metavar="PATH", help="write per-edge micro CSV (PGD format)")
    p.add_argument("--micro-parquet", metavar="DIR", help="write per-edge micro parquet")
    p.add_argument("--pagerank", metavar="PATH", help="write PageRank parquet")
    p.add_argument("--components", metavar="PATH", help="write component-id parquet")
    p.add_argument("--kcore", metavar="PATH", help="write core-number parquet")
    p.add_argument("--checkpoint-dir", metavar="DIR", help="iterative-engine checkpoints")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--gfd", action="store_true", help="print graphlet frequency distributions")
    p.add_argument("--verbose", action="store_true")
    args = p.parse_args(argv)

    import ray

    owns_ray = not ray.is_initialized()
    if owns_ray:
        # honor RAY_ADDRESS so the same command attaches to a running
        # cluster head (the `ray job submit` posture) or starts a
        # local session; num_cpus is only legal when starting locally
        import os

        addr = os.environ.get("RAY_ADDRESS", "local")
        kw = {"num_cpus": args.workers} if addr == "local" else {}
        ray.init(address=addr, include_dashboard=False,
                 logging_level="ERROR", **kw)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import numpy as np
    import pandas as pd

    from pgd_ray.graph.csr import build_csr
    from pgd_ray.graph.graphlets import gfd, graphlet_macro, graphlet_micro
    from pgd_ray.graph.iterative import connected_components, kcore, pagerank
    from pgd_ray.stages.writers import write_macro_stats, write_micro_csv

    try:
        if args.transcripts:
            from pgd_ray.sources.edges import edges_from_transcripts
            from pgd_ray.util import read_parquet_clean

            tds = read_parquet_clean(args.file)
            eds = edges_from_transcripts(tds).materialize()
            vids = None
        else:
            from pgd_ray.sources.io import read_graph

            eds, vids = read_graph(args.file)
            eds = eds.materialize()
        csr = build_csr(eds, n=(len(vids) if vids is not None else None))
        print(f"graph: n={csr.n} m={csr.m} d_max={csr.max_degree}", file=sys.stderr)

        if args.neigh_ordering != "natural":
            from pgd_ray.functions.ordering import order_vertex_neighbors

            csr = order_vertex_neighbors(
                csr, args.neigh_ordering, descending=not args.s2l_neigh
            )

        # Apply the edge-ordering strategy before decomposition, as the
        # reference driver does (graphlet_driver.cpp:70): scheduling /
        # micro-CSV row order only — counts are order-invariant.
        if args.ordering != "natural":
            from pgd_ray.functions.ordering import sort_edges

            eds = sort_edges(eds, csr, strategy=args.ordering).drop_columns(["key"]).materialize()

        if args.macro or args.gfd or not (args.micro or args.micro_parquet or args.pagerank
                                          or args.components or args.kcore):
            mac = graphlet_macro(eds, csr, concurrency=(1, args.workers))
            print(json.dumps({k: int(v) if isinstance(v, int) else v
                              for k, v in mac.as_dict().items()}))
            if args.macro:
                write_macro_stats(mac, args.macro)
            if args.gfd:
                for kind in ("connected", "disconnected", "all"):
                    print(kind, [round(float(x), 6) for x in gfd(mac, kind)])
        if args.micro or args.micro_parquet:
            micro = graphlet_micro(eds, csr, concurrency=(1, args.workers)).materialize()
            if args.micro_parquet:
                micro.write_parquet(args.micro_parquet)
            if args.micro:
                write_micro_csv(micro, args.micro, degree_vec=csr.degrees())
            if args.verbose:
                # console parity with the reference's print_micro_stats
                # (graphlet_core.cpp:1627-1654): per-column summaries
                from pgd_ray.stages.univar import univar_stats

                for col in ("triangle", "clique4", "chordal4", "cycle4",
                            "star3", "path4"):
                    st = univar_stats(micro, col)
                    print(f"{col}: mean={st['mean']:.4f} median={st['median']:.1f} "
                          f"max={st['max']:.0f} std={st['std']:.4f}")
        for flag, fn, col in (
            (args.pagerank, lambda: pagerank(csr, n_workers=args.workers,
                                             checkpoint_dir=args.checkpoint_dir,
                                             resume=args.resume), "pagerank"),
            (args.components, lambda: connected_components(csr, n_workers=args.workers), "component"),
            (args.kcore, lambda: kcore(csr, n_workers=args.workers), "core"),
        ):
            if flag:
                vals = fn()
                out = pd.DataFrame({"v": np.arange(csr.n, dtype=np.int64), col: vals})
                if vids is not None:
                    out["v"] = vids[out["v"].to_numpy()]
                out.to_parquet(flag)
    finally:
        if owns_ray:
            ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
