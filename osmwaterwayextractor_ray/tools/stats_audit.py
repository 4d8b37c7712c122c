"""Per-stage wall-time audit for any registered query — the
"measure, don't guess" loop as a command:

    python -m osmwaterwayextractor_ray.tools.stats_audit minhash_neardup \
        [--sf /root/testdata/sf0.01] [--cpus 8]

Runs the query once (consuming the stream), then prints Ray Data's
``ds.stats()`` — per-operator wall times, block counts, memory — plus
the total wall clock. Use it before believing any perf idea (CLAUDE.md:
two plausible fixed-cost cuts measured slower and were reverted).
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="stats_audit")
    ap.add_argument("query", help="name from __ray_entry__.queries()")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.cpus,
            include_dashboard=False,
            logging_level="ERROR",
            log_to_driver=False,
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, ".")
    import __ray_entry__ as em

    qs = em.queries()
    if args.query not in qs:
        print(f"unknown query {args.query!r}; known: {', '.join(sorted(qs))}")
        return 2
    t0 = time.time()
    res = qs[args.query](args.sf)
    import ray.data

    if isinstance(res, ray.data.Dataset):
        n = res.count()
        dt = time.time() - t0
        print(res.stats())
    else:
        n = len(res)
        dt = time.time() - t0
        print("(driver-side result — no Dataset stats)")
    print(f"\n== {args.query}: {n} rows in {dt:.2f}s at {args.cpus} cpus ==")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
