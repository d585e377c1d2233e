"""Full oracle-parity sweep: run every queries() entry through the
engine AND its oracle_sql() mirror through DuckDB at a given sf dir,
compare rows/schema/values (the driver's normalization: sort columns
by name, round floats to 6, sort rows), write a JSON artifact.

Usage: python tools/sweep.py SF_DIR OUT_JSON [--only q1,q2] [--skip q1]
       [--budget-sec N]  (skip queries whose sf0.01 oracle ran > N s)
"""
import json
import sys
import time

import numpy as np
import pandas as pd


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns), ignore_index=True)


def _to_df(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    import pyarrow as pa

    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()


def main():
    sf = sys.argv[1]
    out_path = sys.argv[2]
    only = None
    skip = set()
    for i, a in enumerate(sys.argv):
        if a == "--only":
            only = set(sys.argv[i + 1].split(","))
        if a == "--skip":
            skip = set(sys.argv[i + 1].split(","))

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    import logging

    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import duckdb

    import __ray_entry__ as entry

    qs = entry.queries()
    oracles = entry.oracle_sql()
    names = sorted(oracles.keys())
    if only:
        names = [n for n in names if n in only]
    names = [n for n in names if n not in skip]

    res = {"sf": sf, "pass": 0, "fail": [], "err": [], "queries": {},
           "wall": 0.0}
    t_all = time.time()
    for name in names:
        t0 = time.time()
        rec = {}
        try:
            ray_df = _normalize(_to_df(qs[name](sf)))
            t_ray = time.time() - t0
            con = duckdb.connect()
            con.sql("SET memory_limit='48GB'")
            con.sql(f"SET temp_directory='/tmp/duck_sweep'")
            for t in ["region", "nation", "customer", "supplier", "part",
                      "orders", "lineitem", "events", "documents",
                      "embeddings"]:
                con.sql(f"CREATE VIEW {t} AS FROM '{sf}/{t}.parquet'")
            t1 = time.time()
            ora_df = _normalize(con.sql(oracles[name]).df())
            con.close()
            t_ora = time.time() - t1
            ok_rows = len(ray_df) == len(ora_df)
            ok_schema = list(ray_df.columns) == list(ora_df.columns)
            ok_vals = ok_rows and ok_schema
            if ok_vals:
                for c in ray_df.columns:
                    a, b = ray_df[c], ora_df[c]
                    if pd.api.types.is_float_dtype(a):
                        good = np.allclose(a.to_numpy(float),
                                           b.to_numpy(float),
                                           atol=1e-6, equal_nan=True)
                    else:
                        good = (a.to_numpy() == b.to_numpy()).all()
                    if not good:
                        ok_vals = False
                        rec["bad_col"] = c
                        break
            rec.update(rows=len(ray_df), ok_rows=ok_rows,
                       ok_schema=ok_schema, ok_vals=ok_vals,
                       ray_sec=round(t_ray, 2), ora_sec=round(t_ora, 2))
            if ok_rows and ok_schema and ok_vals:
                res["pass"] += 1
            else:
                res["fail"].append(name)
        except Exception as ex:  # noqa: BLE001
            rec["err"] = f"{type(ex).__name__}: {ex}"[:300]
            res["err"].append(name)
        res["queries"][name] = rec
        status = "ok" if name not in res["fail"] and name not in res["err"] \
            else "FAIL"
        print(f"{name}: {status} {rec.get('ray_sec','-')}s/"
              f"{rec.get('ora_sec','-')}s", flush=True)
    res["wall"] = round(time.time() - t_all, 1)
    with open(out_path, "w") as f:
        json.dump(res, f, indent=1)
    print(f"PASS {res['pass']}/{len(names)} fail={res['fail']} "
          f"err={res['err']} wall={res['wall']}s")
    ray.shutdown()


if __name__ == "__main__":
    main()
