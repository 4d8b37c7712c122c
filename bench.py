#!/usr/bin/env python
"""Benchmark harness.

Plain run: executes the headline pipeline (flagship waterway-graph
assembly over GRAFT_SF_DIR-derived waterways) plus a representative query
set, and prints ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
   "throughput": {"ways_per_s": ..., "edges_per_s": ...}}

--scaling: runs the headline pipeline in FRESH processes at N and 4N
CPUs (default N=2, override SCALE_LO/SCALE_HI) on the same input and
reports both throughputs plus scaling efficiency (t_N/t_4N)/(4N/N).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _init_ray():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False


WAYS_REPEAT = int(os.environ.get("BENCH_WAYS_REPEAT", "16"))


def headline() -> dict:
    """Flagship: waterway graph assembly end-to-end (counts consume the
    streams; nothing large is pulled to the driver).

    One full untimed warm-up run first: it warms the OS page cache AND
    spins up Ray's worker/actor pools, so the timed run measures
    steady-state compute + shuffle throughput rather than process
    cold-start (the per-worker cold start otherwise dominates at high
    num_cpus and small inputs, inverting the scaling signal)."""
    from osmwaterwayextractor_ray.config import Config
    from osmwaterwayextractor_ray.pipelines.waterway_graph import build_graph
    from osmwaterwayextractor_ray.sources.waterways import waterways_from_events

    def run(repeat):
        result = build_graph(
            waterways_from_events(SF_DIR, repeat=repeat), Config()
        )
        return result.edges.count(), result.nodes.count()

    run(max(1, WAYS_REPEAT // 8))  # warm-up (untimed, reduced size)
    # min over BENCH_HEADLINE_REPS timed runs: ambient host load on this
    # box swings identical runs 2x (see NOTES_r2.md), and min-of-k is the
    # least-noise estimator of steady-state throughput
    reps = int(os.environ.get("BENCH_HEADLINE_REPS", "3"))
    dt = float("inf")
    for _ in range(max(1, reps)):
        t0 = time.time()
        n_edges, n_nodes = run(WAYS_REPEAT)
        dt = min(dt, time.time() - t0)
    n_ways = waterways_from_events(SF_DIR, repeat=WAYS_REPEAT).count()
    return {
        "sec": dt,
        "n_ways": n_ways,
        "n_edges": n_edges,
        "n_nodes": n_nodes,
        "ways_per_s": n_ways / dt,
        "edges_per_s": n_edges / dt,
    }


QUERY_SET = [
    "q1_pricing_summary",
    "q3_top_revenue",
    "q5_local_supplier_volume",
    "q6_revenue",
    "events_props_sum",
    "top_tokens",
    "orders_monthly",
    "urgent_lineitems",
    "purchase_attribution",
    "filter_revenue",
    "customer_order_stats",
    "events_window",
    "user_sessions",
    "customers_no_orders",
    "events_top3_per_user",
    "orders_rollup",
    "events_pivot",
    "events_unpivot",
    "events_lag_gaps",
    "orders_running_total",
    "signup_error_window_join",
    "nation_trade_fulljoin",
    "distinct_counts_hll",
    "orders_cube",
    "events_value_ntile",
    "value_percentiles_sketch",
    "user_set_ops",
    "orders_above_cust_avg",
    "heavy_users_mg",
    "geo_cell_counts",
    "geo_pip_join",
    "geo_knn",
    "geo_cell_knn",
    "geo_cell_knn_halo",
    "geo_s2_cells",
    "geo_s2_rollup",
    "geo_extract",
    "geo_extract_cells",
    "dedup_exact",
    "incremental_dedup",
    "doc_quality",
    "token_totals",
    "doc_repetition",
    "contamination_check",
    "bpe_token_stats",
    "ngram_jaccard_neardup",
    "tfidf_cosine_neardup",
    "token_pmi",
    "minhash_neardup",
    "dedup_clusters",
    "neardup_triangles",
    "curate_corpus",
    "stratified_sample",
    "quality_percentiles",
    "embed_topk",
    "embed_topk_pq",
    "kmeans_embeddings",
    "label_centroid_sums",
    "embed_neardup",
    "simhash_fingerprints",
    "simhash_neardup",
    "media_byte_stats",
    "media_resize",
    "media_frame_sample",
    "pii_scrub",
    "dup_span_stats",
    "bm25_search",
    "phrase_search",
    "weighted_sample",
    "page_links",
    "link_stats",
    "pagerank",
    "latest_snapshot",
    "domain_stats",
    "anchor_text",
    "host_graph",
    "url_dedup",
    "snapshot_diff",
    "pack_sequences",
    "pack_chunks",
    "lm_quality",
    "line_dedup",
    "link_components",
    "host_quota",
    "doc_length_hist",
    "dsir_weights",
    "cluster_label_mix",
    "source_temperature_mix",
    "host_blocklist",
    "curate_web_corpus",
    "bpe_train",
    "bpe_encode",
    "semdedup",
    "train_shards",
    "gopher_filter",
    "dedup_spans",
    "perplexity_buckets",
    "source_epochs",
    "hits_scores",
    "label_prop_communities",
    "adamic_adar",
    "k_core",
    "clustering_coeff",
    "crawl_depth",
    "random_walks",
    "data_split",
    "sentence_stats",
    "parse_quarantine",
    "corpus_datasheet",
    "rank_agreement",
    "host_keywords",
    "community_modularity",
    "readability",
    "token_balanced_shards",
    "normalize_text",
    "embed_topk_ivfpq",
    "containment_neardup",
    "edit_dedup",
    "proto_prune",
    "inverted_index",
    "crawl_anomaly",
    "hyperanf",
    "scc",
    "nb_langid",
    # bowtie is excluded: it re-runs scc + two more full fixpoints (~25 s
    # at sf0.1/32) and scc already represents the FW-BW family here
    "price_model",
    "proximity_search",
    "co_citation",
    "embed_gram",
    "funnel_conversion",
    "retention_cohorts",
    "doc_entropy",
    "bigram_lm_quality",
    "zipf_fit",
    "basket_pairs",
    "media_dedup",
    "effective_diameter",
    "events_percent_rank",
    "fk_violations",
    "vocab_drift",
    "hourly_active_users",
    "dedup_numnorm",
    "grouped_percentiles",
    "vocab_coverage",
    "prefix_index",
    "event_transitions",
    "lang_source_pmi",
    "degree_assortativity",
    "source_lang_entropy",
    "trade_flows",
    "cdc_upsert",
    "scd2_history",
    "table_profile",
    "fd_audit",
    "k_anonymity",
    "key_skew_audit",
    "source_jaccard",
    "cumulative_distinct_users",
    "skyline_parts",
    "pca_project",
    "rfm_segments",
    "rrf_search",
    "peak_concurrency",
    "robust_outliers",
    "column_correlations",
    "grouped_mode",
    "events_moving_avg",
    "ship_lag_hist",
    "customer_best_order",
    "brand_revenue_share",
    "watermark_audit",
    "table_fingerprint",
    "rolling_active_users",
    "revenue_wow",
    "media_phash_neardup",
    "rebalance_audit",
    "view_maintenance",
]


def run_queries() -> dict[str, float]:
    """Min-of-k per query (BENCH_QUERY_REPS, default 2): host ambient load
    swings identical runs 2-3x (NOTES_r2/r4), and single-shot per-query
    numbers produced spurious 'regressions' in past rounds. Reps run as
    full passes over the suite (A/B-style interleaving), not back-to-back
    per query, so a noise burst hits one PASS, not one query."""
    import __ray_entry__ as entrymod

    import ray.data

    qs = entrymod.queries()
    reps = max(1, int(os.environ.get("BENCH_QUERY_REPS", "2")))
    out: dict[str, float] = {}
    for _ in range(reps):
        for name in QUERY_SET:
            t0 = time.time()
            res = qs[name](SF_DIR)
            if isinstance(res, ray.data.Dataset):
                res.count()  # consume the stream; results stay distributed
            dt = round(time.time() - t0, 3)
            out[name] = min(out.get(name, dt), dt)
    return out


# representative queries kept in the FINAL (driver-parsed) JSON line —
# the driver records only the last ~2000 bytes of stdout, so the full
# 170-query table cannot fit there (BENCH_r04.parsed was null for exactly
# this reason); the full table goes to the first stdout line AND to
# BENCH_FULL_OUT (default /tmp/bench_full.json)
COMPACT_QUERIES = [
    "q1_pricing_summary", "q5_local_supplier_volume", "events_window",
    "purchase_attribution", "heavy_users_mg", "geo_pip_join", "geo_knn",
    "geo_cell_knn_halo", "geo_extract", "dedup_exact", "minhash_neardup",
    "dedup_clusters", "curate_corpus", "semdedup", "embed_topk",
    "kmeans_embeddings", "lm_quality", "dedup_spans", "gopher_filter",
    "pagerank", "scc", "rank_agreement", "curate_web_corpus",
    "label_prop_communities", "bpe_train", "pack_sequences",
    "fk_violations", "rfm_segments", "media_dedup", "view_maintenance",
]


def main_plain():
    _init_ray()
    import ray

    h = headline()
    queries = run_queries()
    full = {
        "metric": "waterway-graph assembly + query suite wall time",
        "value": round(h["sec"], 3),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "throughput": {
            "ways_per_s": round(h["ways_per_s"], 1),
            "edges_per_s": round(h["edges_per_s"], 1),
            "n_ways": h["n_ways"],
            "n_edges": h["n_edges"],
            "n_nodes": h["n_nodes"],
        },
    }
    # full record: first stdout line + a file (survives the tail window)
    print(json.dumps(full, separators=(",", ":")), flush=True)
    out_path = os.environ.get("BENCH_FULL_OUT", "/tmp/bench_full.json")
    try:
        with open(out_path, "w") as f:
            json.dump(full, f, indent=1)
    except OSError:
        pass
    # compact FINAL line (must stay well under the driver's 2000-byte
    # stdout tail so it parses): headline + representative queries +
    # suite-wide roll-ups
    compact = dict(full)
    compact["queries"] = {
        k: queries[k] for k in COMPACT_QUERIES if k in queries
    }
    compact["queries_sum_sec"] = round(sum(queries.values()), 2)
    compact["n_queries"] = len(queries)
    compact["full_table"] = out_path
    line = json.dumps(compact, separators=(",", ":"))
    assert len(line) < 1900, f"compact bench line too long: {len(line)}"
    print(line, flush=True)
    ray.shutdown()


def _run_headline_subprocess(ncpu: int) -> dict:
    env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
    # scaling runs use a LARGER workload (repeat=24 unless the caller
    # pinned one): the fixed per-execution floor shrinks relative to the
    # scalable work, so the measurement reflects throughput scaling rather
    # than executor-launch latency (measured: repeat=12 -> 0.76,
    # repeat=16 -> 0.80-0.89, repeat=24 -> ~0.85+)
    env.setdefault("BENCH_WAYS_REPEAT", "24")
    # scaling repetition is handled by SCALE_REPS at this level
    env.setdefault("BENCH_HEADLINE_REPS", "1")
    out = subprocess.run(
        [sys.executable, __file__, "--headline-only"],
        env=env,
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    return json.loads(out.strip().splitlines()[-1])


def main_scaling():
    # N and 4N parallelism levels in fresh processes on the same input.
    # Default N=2 (so 4N=8): on this single 32-core box both levels run
    # uncontended and the comparison measures how the pipeline's work
    # scales with parallelism; SCALE_LO/SCALE_HI env vars override (e.g.
    # 8/32, which additionally exposes the per-execution barrier floor a
    # real multi-node cluster would amortize across much larger inputs —
    # both pairs are recorded in BASELINE.md).
    lo = int(os.environ.get("SCALE_LO", "2"))
    hi = int(os.environ.get("SCALE_HI", str(lo * 4)))
    reps = int(os.environ.get("SCALE_REPS", "1"))

    # INTERLEAVED reps (lo, hi, lo, hi, ...): ambient load on this box
    # drifts on the minutes scale, so running all-lo-then-all-hi biases
    # whichever level lands in the quieter phase; alternating puts both
    # levels through the same noise window, min per level afterwards
    runs_lo, runs_hi = [], []
    for _ in range(reps):
        runs_lo.append(_run_headline_subprocess(lo))
        runs_hi.append(_run_headline_subprocess(hi))
    r_lo = min(runs_lo, key=lambda r: r["sec"])
    r_hi = min(runs_hi, key=lambda r: r["sec"])
    eff = (r_lo["sec"] / r_hi["sec"]) / (hi / lo)
    print(
        json.dumps(
            {
                "metric": f"scaling efficiency (N={lo} vs 4N={hi} cpus, fresh processes)",
                f"sec_{lo}": round(r_lo["sec"], 3),
                f"sec_{hi}": round(r_hi["sec"], 3),
                f"ways_per_s_{lo}": round(r_lo["ways_per_s"], 1),
                f"ways_per_s_{hi}": round(r_hi["ways_per_s"], 1),
                f"edges_per_s_{lo}": round(r_lo["edges_per_s"], 1),
                f"edges_per_s_{hi}": round(r_hi["edges_per_s"], 1),
                "scaling_efficiency": round(eff, 3),
                "sf": SF_DIR,
            }
        )
    )


def main_headline_only():
    _init_ray()
    import ray

    h = headline()
    print(json.dumps(h))
    ray.shutdown()


def _ep_burn(batch):
    """CPU-bound numpy kernel (xorshift-style LCG sweeps): no I/O, no
    shuffle, ~250 MB/s of pure register/vector work per task."""
    import numpy as np

    x = np.arange(1_000_000, dtype=np.uint64)
    acc = np.uint64(0)
    for _ in range(60):
        x = x * np.uint64(6364136223846793005) + np.uint64(1442695040888963407)
        acc ^= x.sum()
    return {"id": batch["id"], "acc": [int(acc)] * len(batch["id"])}


def main_ep_probe():
    """Host scaling ceiling probe: 256 INDEPENDENT CPU-bound numpy tasks
    via map_batches — zero shuffles, zero barriers beyond the single map.
    Whatever efficiency this measures between SCALE_LO and SCALE_HI is the
    HOST's ceiling (hypervisor sharing / ambient tenancy), not the
    engine's: no data-processing pipeline on this box can scale better
    than an embarrassingly-parallel map. Run it in the same window as
    --scaling to normalize the engine's ratio (BASELINE.md §3)."""
    lo = int(os.environ.get("SCALE_LO", "8"))
    hi = int(os.environ.get("SCALE_HI", str(lo * 4)))
    reps = int(os.environ.get("SCALE_REPS", "3"))
    code = (
        "import sys, time, json, ray\n"
        "import bench\n"
        "C = int(sys.argv[1])\n"
        "ray.init(address='local', num_cpus=C, include_dashboard=False,"
        " logging_level='ERROR')\n"
        "import ray.data\n"
        "ds = ray.data.range(256, override_num_blocks=256)\n"
        "ds.map_batches(bench._ep_burn, batch_size=1).count()\n"
        "best = float('inf')\n"
        "for _ in range(2):\n"
        "    t0 = time.time()\n"
        "    ds.map_batches(bench._ep_burn, batch_size=1).count()\n"
        "    best = min(best, time.time() - t0)\n"
        "print(json.dumps({'cpus': C, 'sec': round(best, 2)}))\n"
        "ray.shutdown()\n"
    )

    def run(ncpu: int) -> float:
        out = subprocess.run(
            [sys.executable, "-c", code, str(ncpu)],
            capture_output=True,
            text=True,
            check=True,
            cwd=str(Path(__file__).resolve().parent),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])["sec"]

    lo_secs, hi_secs = [], []
    for _ in range(reps):  # interleaved, same reasoning as main_scaling
        lo_secs.append(run(lo))
        hi_secs.append(run(hi))
    eff = (min(lo_secs) / min(hi_secs)) / (hi / lo)
    print(
        json.dumps(
            {
                "metric": f"host EP ceiling (zero-shuffle map, {lo} vs {hi} cpus)",
                f"sec_{lo}": lo_secs,
                f"sec_{hi}": hi_secs,
                "ep_efficiency": round(eff, 3),
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        main_scaling()
    elif "--headline-only" in sys.argv:
        main_headline_only()
    elif "--ep" in sys.argv:
        main_ep_probe()
    else:
        main_plain()
