"""Full driver-replica dress rehearsal as a command — the loop form of the
single-query recipe in .claude/skills/verify/SKILL.md:

    python -m osmwaterwayextractor_ray.tools.oracle_replica \
        [--sf /root/testdata/sf0.01] [--cpus 8] [--out /tmp/replica.json]

Runs EVERY `queries()` entry, compares those with an `oracle_sql()` entry
against DuckDB on the same parquet views (rows + schema + value equality
with rtol=1e-9 float tolerance — slightly STRICTER than the driver's
sorted-column value hash), records rows-only results for the rest, then
smoke-runs `entry()`. Exits non-zero on any FAIL/ERROR.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import traceback


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="oracle_replica")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--out", default="/tmp/oracle_replica.json")
    ap.add_argument(
        "--only",
        default="",
        help="comma-separated query names to run (default: all); "
        "'first50' = the driver's window (first 50 registry entries)",
    )
    args = ap.parse_args(argv)

    import duckdb
    import numpy as np
    import pandas as pd
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.cpus,
            include_dashboard=False,
            log_to_driver=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, ".")
    import __ray_entry__ as em

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )
    qs, sqls = em.queries(), em.oracle_sql()

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        df = df[sorted(df.columns)].copy()
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    def values_match(g: pd.DataFrame, w: pd.DataFrame) -> bool:
        if g.equals(w):
            return True
        for c in g.columns:
            a, b = g[c], w[c]
            if a.dtype.kind in "fc" or b.dtype.kind in "fc":
                if not np.allclose(
                    a.astype(float), b.astype(float), rtol=1e-9, equal_nan=True
                ):
                    return False
            elif not (a.astype(object) == b.astype(object)).all():
                return False
        return True

    if args.only == "first50":
        names = list(qs)[:50]
    elif args.only:
        names = [n.strip() for n in args.only.split(",") if n.strip()]
        unknown = [n for n in names if n not in qs]
        if unknown:
            print(f"unknown queries: {unknown}", file=sys.stderr)
            return 2
    else:
        names = sorted(qs)

    results: dict[str, dict] = {}
    for name in names:
        t0 = time.time()
        try:
            r = qs[name](args.sf)
            got = r if isinstance(r, pd.DataFrame) else r.to_pandas()
            if name in sqls:
                want = con.execute(sqls[name]).fetchdf()
                g, w = canon(got), canon(want)
                ok_rows = len(g) == len(w)
                ok_schema = list(g.columns) == list(w.columns)
                ok_vals = ok_rows and ok_schema and values_match(g, w)
                status = "PASS" if (ok_rows and ok_schema and ok_vals) else "FAIL"
                results[name] = {
                    "status": status, "rows": len(got), "oracle_rows": len(want),
                    "rows_match": ok_rows, "schema_match": ok_schema,
                    "vals_match": ok_vals, "sec": round(time.time() - t0, 2),
                }
            else:
                results[name] = {
                    "status": "NO_ORACLE_ROWS_ONLY", "rows": len(got),
                    "sec": round(time.time() - t0, 2),
                }
        except Exception as e:  # noqa: BLE001 — report, don't crash the sweep
            results[name] = {
                "status": "ERROR", "err": f"{type(e).__name__}: {e}",
                "tb": traceback.format_exc()[-600:],
            }
        print(f"{name}: {results[name]['status']} "
              f"rows={results[name].get('rows')} "
              f"({results[name].get('sec', '?')}s)", flush=True)

    if not args.only:  # full sweep also smoke-runs entry()
        res = em.entry()
        n = len(res) if isinstance(res, pd.DataFrame) else res.count()
        print(f"entry(): {n} rows", flush=True)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    fails = {k: v for k, v in results.items() if v["status"] in ("FAIL", "ERROR")}
    n_pass = sum(1 for v in results.values() if v["status"] == "PASS")
    n_rows = sum(1 for v in results.values() if v["status"] == "NO_ORACLE_ROWS_ONLY")
    print(f"== {n_pass} pass / {n_rows} rows-only / {len(fails)} fail-or-error ==")
    if fails:
        print(json.dumps(fails, indent=1)[:4000])
    ray.shutdown()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
