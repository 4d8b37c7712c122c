"""The corpus-pin strategy switch (stages/pin.py) must not change any
pipeline output: materialize (bench default) vs parquet spill (the 100 TB
setting) are byte-equal after canonical sorting."""

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _canon(res) -> pd.DataFrame:
    df = res.to_pandas() if not isinstance(res, pd.DataFrame) else res
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize(
    "qname",
    ["minhash_neardup", "simhash_neardup", "curate_corpus", "neardup_triangles",
     "embed_neardup",
     # the per-iteration-re-pin graph family (waves 18-19): parquet mode is
     # their between-iteration checkpoint story at 100 TB
     "k_core", "crawl_depth", "random_walks", "clustering_coeff",
     "corpus_datasheet",
     # waves 28-37 pin users: the FW-BW fixpoints, the near-dup-family
     # additions, and the rank devices
     "scc", "bowtie", "trustrank", "hyperanf", "zipf_fit", "retention_cohorts",
     # wave 46-58 pin users: the rank/offset devices, the skew profiler,
     # the FK batch plan, and the media fingerprint near-dup
     "rfm_segments", "grouped_percentiles", "watermark_audit",
     "key_skew_audit", "source_jaccard", "fk_violations",
     "media_phash_neardup"],
)
def test_pin_mode_invariance(qname, monkeypatch, tmp_path):
    import __ray_entry__ as em

    qs = em.queries()
    monkeypatch.setenv("WWX_PIN_DIR", str(tmp_path))
    monkeypatch.setenv("WWX_PIN_MODE", "materialize")
    want = _canon(qs[qname](SF))
    monkeypatch.setenv("WWX_PIN_MODE", "parquet")
    got = _canon(qs[qname](SF))
    pd.testing.assert_frame_equal(got, want)


def test_pin_auto_spills_over_budget(monkeypatch, tmp_path):
    import ray.data as rd

    from osmwaterwayextractor_ray.stages.pin import pin

    monkeypatch.setenv("WWX_PIN_DIR", str(tmp_path))
    monkeypatch.setenv("WWX_PIN_MODE", "auto")
    monkeypatch.setenv("WWX_PIN_BUDGET_BYTES", "1")  # force the spill
    ds = rd.range(1000)
    out = pin(ds, "auto_test")
    assert sorted(r["id"] for r in out.take_all()) == list(range(1000))
    assert any(tmp_path.glob("auto_test-*/*.parquet"))
    # under budget: stays an in-memory MaterializedDataset (no new spill dir)
    monkeypatch.setenv("WWX_PIN_BUDGET_BYTES", str(1 << 40))
    out2 = pin(rd.range(10), "auto_small")
    assert not any(tmp_path.glob("auto_small-*"))
    assert out2.count() == 10
