"""Block-structure invariance: identical results when the same sf0.001
tables are re-written with 97-row parquet row groups (CLAUDE.md: results
must be invariant to block structure / num_cpus — past bugs all came
from batch-local state leaking into outputs).

Covers the wave 46-60 operators plus (r5, VERDICT r4 #3/#5) the
highest-risk earlier families: the near-dup pair pipelines (float
scores + pair-role assignment), the iterative graph ops, the windowed
funnel, and the four ANN top-k paths — embed_topk_pq's per-batch ADC
shortlist merge is exactly the device this harness was asked to pin."""

from __future__ import annotations

import pandas as pd
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

OPS = [
    "cdc_upsert", "scd2_history", "table_profile", "fd_audit",
    "k_anonymity", "key_skew_audit", "source_jaccard",
    "cumulative_distinct_users", "skyline_parts", "rfm_segments",
    "rrf_search", "peak_concurrency", "robust_outliers",
    "column_correlations", "grouped_mode", "events_moving_avg",
    "ship_lag_hist", "customer_best_order", "brand_revenue_share",
    "watermark_audit", "table_fingerprint", "rolling_active_users",
    "revenue_wow", "rebalance_audit", "view_maintenance",
    "media_phash_neardup",
    # r5 backward extension (VERDICT r4 #5): float / order-sensitive
    # kernels from the earlier waves
    "minhash_neardup", "tfidf_cosine_neardup", "simhash_neardup",
    "dedup_spans", "dup_span_stats", "dedup_clusters",
    "pagerank", "label_prop_communities", "funnel_conversion",
    "semdedup", "kmeans_embeddings",
    # the four ANN top-k paths (VERDICT r4 #3: embed_topk_pq's ADC
    # shortlist must survive re-batching)
    "embed_topk", "embed_topk_ivf", "embed_topk_pq", "embed_topk_ivfpq",
]


@pytest.fixture(scope="module")
def regrouped_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sf0001_rg97")
    for t in TABLES:
        pq.write_table(
            pq.read_table(f"{SF}/{t}.parquet"),
            d / f"{t}.parquet",
            row_group_size=97,
        )
    return str(d)


def _canon(res) -> pd.DataFrame:
    df = res.to_pandas() if not isinstance(res, pd.DataFrame) else res
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("qname", OPS)
def test_block_invariance(qname, regrouped_dir, ray_session):
    import __ray_entry__ as em

    qs = em.queries()
    a = _canon(qs[qname](SF))
    b = _canon(qs[qname](regrouped_dir))
    pd.testing.assert_frame_equal(a, b)
