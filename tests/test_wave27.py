"""Wave 27: HyperANF neighborhood function + crawl-rate anomaly screen."""

import duckdb
import numpy as np
import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def hyperanf_result(ray_session):
    from osmwaterwayextractor_ray.pipelines.webgraph import hyperanf

    return hyperanf(SF_DIR).to_pandas()


def test_hyperanf_tracks_exact_bfs(hyperanf_result):
    """Each hop's estimate is within HLL error of the exact neighborhood
    function (256 registers -> ~6.5% per node; the 500-node sum averages
    most of it out, so 15% is a generous bound)."""
    from osmwaterwayextractor_ray.pipelines.webgraph import _EDGES_CTE

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    edges = con.execute(
        f"WITH {_EDGES_CTE} SELECT src_page, dst_page FROM edges"
    ).fetchdf()
    n = 500
    A = np.zeros((n, n), dtype=bool)
    A[edges.src_page, edges.dst_page] = True
    R = np.eye(n, dtype=bool)
    exact = [float(R.sum())]
    for _ in range(4):
        R = R | (A @ R)
        exact.append(float(R.sum()))
    assert len(hyperanf_result) == 5
    for t in range(5):
        err = abs(hyperanf_result.nf_est[t] - exact[t]) / exact[t]
        assert err < 0.15, (t, hyperanf_result.nf_est[t], exact[t])


def test_hyperanf_deterministic(ray_session, hyperanf_result):
    """Register max-merge is associative/commutative and the hash is
    fixed, so a rerun is bit-identical (the invariance rule)."""
    from osmwaterwayextractor_ray.pipelines.webgraph import hyperanf

    again = hyperanf(SF_DIR).to_pandas()
    assert hyperanf_result.equals(again)


def test_crawl_anomaly_flags_planted_traps(ray_session):
    """Exactly the planted crawler-trap rows (hosts whose docs hit
    doc_id % 50 == 0: site0/site10, hour 9) are flagged at sf0.001."""
    from osmwaterwayextractor_ray.pipelines.webgraph import crawl_anomaly

    df = crawl_anomaly(SF_DIR).to_pandas()
    flagged = df[df.anomalous == 1]
    assert set(zip(flagged.host, flagged.hour)) == {
        ("site0.test", 9),
        ("site10.test", 9),
    }
    assert (flagged.n_fetches == 100).all()
