"""Wave 26: prototypicality pruning + inverted-index export.

Oracle equality runs via test_oracle.py (auto-parametrized); here we pin
the semantic invariants the oracles can't see."""

import numpy as np
import pytest

SF_DIR = "/root/testdata/sf0.001"


def test_proto_prune_per_cluster_fractions(ray_session):
    """Exactly floor(n_c * PP_NUM / PP_DEN) vectors are dropped per
    cluster, and every kept vector is at least as far from its centroid
    as every dropped one (ties broken toward lower vec_id kept last)."""
    from osmwaterwayextractor_ray.pipelines.embeddings import (
        PP_DEN,
        PP_NUM,
        proto_prune,
    )

    df = proto_prune(SF_DIR).to_pandas()
    assert set(df.keep.unique()) <= {0, 1}
    for cl, g in df.groupby("cluster"):
        nc = len(g)
        assert (g.keep == 0).sum() == nc * PP_NUM // PP_DEN, cl
        if (g.keep == 0).any() and (g.keep == 1).any():
            # the keep set is the top block of the (d2q DESC, vec_id ASC) order
            kept = g[g.keep == 1].sort_values(["d2q", "vec_id"], ascending=[False, True])
            dropped = g[g.keep == 0].sort_values(["d2q", "vec_id"], ascending=[False, True])
            kmin = kept.iloc[-1]
            dmax = dropped.iloc[0]
            assert kmin.d2q > dmax.d2q or (
                kmin.d2q == dmax.d2q and kmin.vec_id < dmax.vec_id
            )


def test_proto_prune_block_invariance(ray_session):
    """Bit-identical output regardless of input block structure: the
    integer-score + total-order contract (CLAUDE.md invariance rule)."""
    import ray.data  # noqa: F401

    from osmwaterwayextractor_ray.pipelines import embeddings as emb

    base = emb.proto_prune(SF_DIR).to_pandas().sort_values("vec_id").reset_index(drop=True)

    orig = emb._read_pq

    def shredded(path, columns=None, **kw):
        return orig(path, columns=columns, **kw).repartition(13)

    emb._read_pq = shredded
    try:
        alt = emb.proto_prune(SF_DIR).to_pandas().sort_values("vec_id").reset_index(drop=True)
    finally:
        emb._read_pq = orig
    assert base.equals(alt)


def test_inverted_index_consistency(ray_session):
    """df == postings-entry count for small tokens; cf >= df; postings
    doc ids strictly increasing and tf entries positive."""
    from osmwaterwayextractor_ray.pipelines.webtext import _II_CAP, inverted_index

    df = inverted_index(SF_DIR).to_pandas()
    assert len(df) > 0
    assert (df.cf >= df.df).all()
    for _, row in df.iterrows():
        entries = row.postings.split(",")
        assert len(entries) == min(row.df, _II_CAP)
        ids = [int(e.split(":")[0]) for e in entries]
        tfs = [int(e.split(":")[1]) for e in entries]
        assert ids == sorted(ids) and len(set(ids)) == len(ids)
        assert all(t >= 1 for t in tfs)


def test_inverted_index_matches_token_totals(ray_session):
    """sum(cf) over the index == the corpus token total (same tokenizer)."""
    import duckdb

    from osmwaterwayextractor_ray.pipelines.webtext import inverted_index

    df = inverted_index(SF_DIR).to_pandas()
    want = duckdb.sql(
        r"""SELECT sum(len(list_filter(string_split_regex(text, '[ \t\n\r\f\v]+'),
                       x -> x <> ''))) AS n
            FROM read_parquet('/root/testdata/sf0.001/documents.parquet')"""
    ).fetchone()[0]
    assert int(df.cf.sum()) == int(want)
