"""Wave-10 operators — the behavior the sf0.001 oracle rows can't see.

tests/test_oracle.py already pins semdedup / train_shards / gopher_filter
against their DuckDB oracles on the real tables. This suite pins:

  * semdedup on a PLANTED near-duplicate corpus: every planted near-copy
    (cosine ~0.9999 to its source) must be dropped, every unique base
    vector kept; the keep set equals a brute-force arbitrary-precision
    integer reference (the quantized-grid ground truth, no float
    shortcuts); and the result is invariant to the parquet row-group
    layout (different block structures into the assign pass).
  * train_shards: per-shard positions are exactly 0..n_s-1, the layout is
    a permutation of pack_sequences, multi-chunk docs spread across
    shards, and the SQL twin agrees on a corpus with real multi-chunk
    docs (the stock tables are all single-chunk).
  * gopher_filter on a hand-built boundary fixture: each rule tested at
    its exact integer threshold (19/20/90/91 words, mean word length
    exactly 4.2 / 4.8 and one char off, 1 vs 2 stop hits, empty text),
    against both an explicit expected keep set and the SQL twin.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from osmwaterwayextractor_ray.pipelines import embeddings as emb
from osmwaterwayextractor_ray.pipelines import packing, webtext

SF001 = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# semdedup
# ---------------------------------------------------------------------------

N_BASE = 100
N_PLANT = 25


def _planted_embeddings() -> pa.Table:
    src = pq.read_table(f"{SF001}/embeddings.parquet")
    base = src.slice(0, N_BASE)
    ids = base.column("vec_id").to_numpy(zero_copy_only=False)
    arr = base.column("embedding").combine_chunks()
    mat = (
        arr.values.to_numpy(zero_copy_only=False)
        .astype(np.float64)
        .reshape(N_BASE, emb.DIM)
    )
    # near-copies of the first N_PLANT vectors: +0.002 in every coordinate
    # (cosine ~0.9999, far above any threshold; small vs cluster radii so
    # the copy lands in the same k-means cluster as its source)
    plant = mat[:N_PLANT] + 0.002
    all_ids = np.concatenate([ids, ids[:N_PLANT] + 1000])
    all_mat = np.concatenate([mat, plant]).astype(np.float32)
    off = np.arange(0, (len(all_ids) + 1) * emb.DIM, emb.DIM, dtype=np.int32)
    lists = pa.ListArray.from_arrays(
        pa.array(off), pa.array(all_mat.ravel(), type=pa.float32())
    )
    return pa.table(
        {
            "vec_id": pa.array(all_ids, type=pa.int64()),
            "embedding": lists,
            "label": pa.array(np.zeros(len(all_ids), dtype=np.int32)),
        }
    )


def _brute_semdedup(table: pa.Table, centroids: np.ndarray) -> set[int]:
    """Arbitrary-precision integer reference for the keep set."""
    ids = table.column("vec_id").to_numpy(zero_copy_only=False)
    arr = table.column("embedding").combine_chunks()
    mat = (
        arr.values.to_numpy(zero_copy_only=False)
        .astype(np.float64)
        .reshape(len(ids), emb.DIM)
    )
    cl = emb._km_assign(mat, centroids)
    q = np.floor(mat * emb._KM_Q + 0.5).astype(np.int64)
    order = np.argsort(ids)
    kept: set[int] = set()
    by_cluster: dict[int, list[int]] = {}
    for j in order:
        c = int(cl[j])
        dropped = False
        for u in by_cluster.get(c, []):
            s = int(np.dot(q[u].astype(object), q[j].astype(object)))
            nu = int(np.dot(q[u].astype(object), q[u].astype(object)))
            nv = int(np.dot(q[j].astype(object), q[j].astype(object)))
            if s > 0 and s * s * emb.SD_THR_DEN**2 >= emb.SD_THR_NUM**2 * nu * nv:
                dropped = True
                break
        by_cluster.setdefault(c, []).append(j)  # rule: ANY earlier u, kept or not
        if not dropped:
            kept.add(int(ids[j]))
    return kept


@pytest.fixture(scope="module")
def plant_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("semdedup_plant")
    pq.write_table(_planted_embeddings(), d / "embeddings.parquet")
    return str(d)


def test_semdedup_drops_planted_copies(ray_session, plant_dir):
    res = emb.semdedup(plant_dir).to_pandas()
    kept = set(res["vec_id"].tolist())
    # every planted near-copy dropped, none of their sources lost to them
    for i in range(N_PLANT):
        assert i + 1000 not in kept, f"planted copy {i + 1000} survived"
    # the keep set is exactly the arbitrary-precision reference
    C = emb._kmeans_centroids(plant_dir)
    assert kept == _brute_semdedup(_planted_embeddings(), C)


def test_semdedup_block_structure_invariant(ray_session, plant_dir, tmp_path):
    base = emb.semdedup(plant_dir).to_pandas().sort_values("vec_id").reset_index(drop=True)
    # same rows, 13-row row groups -> many small blocks into assign
    d2 = tmp_path / "rg13"
    d2.mkdir()
    pq.write_table(_planted_embeddings(), d2 / "embeddings.parquet", row_group_size=13)
    alt = emb.semdedup(str(d2)).to_pandas().sort_values("vec_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(base, alt)


def test_semdedup_oracle_on_planted_corpus(ray_session, plant_dir):
    res = (
        emb.semdedup(plant_dir)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
        .astype("int64")
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{plant_dir}/embeddings.parquet')"
    )
    ora = (
        con.execute(emb.SEMDEDUP_SQL)
        .fetchdf()
        .sort_values("vec_id")
        .reset_index(drop=True)
        .astype("int64")
    )
    pd.testing.assert_frame_equal(res, ora[res.columns])


# ---------------------------------------------------------------------------
# train_shards
# ---------------------------------------------------------------------------


def _multichunk_docs() -> pd.DataFrame:
    rows = []
    rng = np.random.default_rng(5)
    for i in range(40):
        n_tok = int(rng.integers(1, 400))  # up to 4 chunks of SEQ_LEN=128
        rows.append((i, " ".join(f"w{j}" for j in range(n_tok))))
    rows.append((40, ""))  # zero-token doc: emits no chunks
    df = pd.DataFrame(rows, columns=["doc_id", "text"])
    df["lang"] = "en"
    df["source"] = "s0"
    df["n_chars"] = df["text"].str.len().astype(np.int64)
    return df


@pytest.fixture(scope="module")
def chunk_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("train_shards_docs")
    _multichunk_docs().to_parquet(d / "documents.parquet", index=False)
    return str(d)


def test_train_shards_positions_and_permutation(ray_session, chunk_dir):
    res = packing.train_shards(chunk_dir).to_pandas()
    chunks = packing.pack_sequences(chunk_dir).to_pandas()
    assert len(res) == len(chunks) > 60  # multi-chunk docs actually present
    # layout is a permutation of the chunk set
    key = ["doc_id", "chunk_idx", "chunk_tokens"]
    pd.testing.assert_frame_equal(
        res[key].sort_values(key).reset_index(drop=True),
        chunks[key].sort_values(key).reset_index(drop=True),
    )
    # per shard: positions are exactly 0..n_s-1
    for shard, g in res.groupby("shard"):
        assert sorted(g["pos"].tolist()) == list(range(len(g)))
    # multi-chunk docs spread over shards (the chunk_idx mixing term works)
    multi = res[res["doc_id"].isin(chunks[chunks["chunk_idx"] > 0]["doc_id"])]
    assert multi.groupby("doc_id")["shard"].nunique().max() > 1


def test_train_shards_oracle_on_multichunk_corpus(ray_session, chunk_dir):
    res = (
        packing.train_shards(chunk_dir)
        .to_pandas()
        .sort_values(["shard", "pos"])
        .reset_index(drop=True)
        .astype("int64")
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{chunk_dir}/documents.parquet')"
    )
    ora = (
        con.execute(packing.TRAIN_SHARDS_SQL)
        .fetchdf()
        .sort_values(["shard", "pos"])
        .reset_index(drop=True)
        .astype("int64")
    )
    pd.testing.assert_frame_equal(res, ora[res.columns])


def test_train_shards_deterministic(ray_session, chunk_dir):
    a = packing.train_shards(chunk_dir).to_pandas().sort_values(["shard", "pos"])
    b = packing.train_shards(chunk_dir).to_pandas().sort_values(["shard", "pos"])
    pd.testing.assert_frame_equal(a.reset_index(drop=True), b.reset_index(drop=True))


# ---------------------------------------------------------------------------
# gopher_filter boundary fixture
# ---------------------------------------------------------------------------


def _gf_doc(n_words: int, word: str, stops: int) -> str:
    """n_words total: `stops` stopword tokens ('the'), rest `word`."""
    toks = ["the"] * stops + [word] * (n_words - stops)
    return " ".join(toks)


# 90 words with mean word length 416/90 ≈ 4.62 (inside [4.2, 4.8])
_GF_90W = " ".join(["the"] * 4 + ["abcde"] * 60 + ["abcd"] * 26)

GF_CASES = [
    # (doc_id, text, expect_keep)
    (0, _gf_doc(19, "abcd", 2), False),  # one word short
    (1, _gf_doc(20, "abcde", 2), True),  # min words; mwl=(2*3+18*5)/20=4.8 exactly
    (2, _GF_90W, True),  # max words (90), mwl in range
    (3, _GF_90W + " abcde", False),  # 91 words: fails ONLY the count rule
    # mean word length exactly 4.2: 21*nw == 5*sl -> keep (inclusive)
    (4, "placeholder", None),  # computed in the fixture
    (5, _gf_doc(20, "abc", 2), False),  # mwl=3.0 < 4.2
    (6, _gf_doc(20, "abcdefgh", 2), False),  # mwl=7.5 > 4.8
    (7, _gf_doc(30, "abcde", 1), False),  # only 1 stop hit
    (8, _gf_doc(30, "abcde", 0), False),  # no stop hits
    (9, "", False),  # empty text
    (10, "   ", False),  # whitespace only
]


def _expect_keep(text: str) -> bool:
    ws = [w for w in text.split() if w]
    nw = len(ws)
    sl = sum(len(w) for w in ws)
    sh = sum(1 for w in ws if w in webtext._GF_STOPWORDS)
    return (
        webtext._GF_MIN_WORDS <= nw <= webtext._GF_MAX_WORDS
        and webtext._GF_MWL_LO_NUM * nw <= webtext._GF_MWL_LO_DEN * sl
        and webtext._GF_MWL_HI_DEN * sl <= webtext._GF_MWL_HI_NUM * nw
        and sh >= webtext._GF_MIN_STOP_HITS
    )


@pytest.fixture(scope="module")
def gf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("gopher_docs")
    # exact-4.2 case: nw=25, need sl=105: 2 stops (3+3) + 23 words, sl
    # must be 105 -> 99 over 23 words: 7 of len 5 + 16 of len 4
    exact42 = " ".join(["the", "the"] + ["abcde"] * 7 + ["abcd"] * 16)
    rows = [(i, t) for i, t, _ in GF_CASES]
    rows[4] = (4, exact42)
    df = pd.DataFrame(rows, columns=["doc_id", "text"])
    df["lang"] = "en"
    df["source"] = "s0"
    df["n_chars"] = df["text"].str.len().astype(np.int64)
    df.to_parquet(d / "documents.parquet", index=False)
    return str(d), {i: t for i, t in rows}


def test_gopher_filter_boundaries(ray_session, gf_dir):
    d, texts = gf_dir
    res = webtext.gopher_filter(d).to_pandas()
    kept = set(res["doc_id"].tolist())
    for did, text in texts.items():
        assert (did in kept) == _expect_keep(text), (did, text)
    # hand-pinned expectations (guards _expect_keep itself)
    assert 1 in kept and 2 in kept and 4 in kept
    assert {0, 3, 5, 6, 7, 8, 9, 10}.isdisjoint(kept)
    # the exact-4.2 row sits ON the lower mean-word-length boundary
    r4 = res[res["doc_id"] == 4].iloc[0]
    assert webtext._GF_MWL_LO_NUM * r4["n_words"] == webtext._GF_MWL_LO_DEN * r4["sum_wordlen"]


def test_gopher_filter_oracle_on_fixture(ray_session, gf_dir):
    d, _ = gf_dir
    res = (
        webtext.gopher_filter(d)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
        .astype("int64")
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
    )
    ora = (
        con.execute(webtext.GOPHER_FILTER_SQL)
        .fetchdf()
        .sort_values("doc_id")
        .reset_index(drop=True)
        .astype("int64")
    )
    pd.testing.assert_frame_equal(res, ora[res.columns])


# ---------------------------------------------------------------------------
# token_balanced_shards (wave 13)
# ---------------------------------------------------------------------------


def test_token_balanced_shards_balance_and_rank(ray_session, chunk_dir):
    res = packing.token_balanced_shards(chunk_dir).to_pandas()
    # exact snake assignment vs an independent single-process reference
    ref = res.sort_values(["n_tokens", "doc_id"], ascending=[False, True]).reset_index(
        drop=True
    )
    w = packing._TB_SHARDS
    r = np.arange(len(ref))
    pos = r % w
    want = np.where((r // w) % 2 == 0, pos, w - 1 - pos)
    assert (ref["shard"].to_numpy() == want).all()
    # balance: per-shard token totals spread bounded by one max doc
    tot = res.groupby("shard")["n_tokens"].sum()
    assert len(tot) == w
    assert tot.max() - tot.min() <= res["n_tokens"].max()


def test_token_balanced_shards_oracle_multichunk(ray_session, chunk_dir):
    res = (
        packing.token_balanced_shards(chunk_dir)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
        .astype("int64")
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{chunk_dir}/documents.parquet')"
    )
    ora = (
        con.execute(packing.TOKEN_BALANCED_SHARDS_SQL)
        .fetchdf()
        .sort_values("doc_id")
        .reset_index(drop=True)
        .astype("int64")
    )
    pd.testing.assert_frame_equal(res, ora[res.columns])


# ---------------------------------------------------------------------------
# normalize_text edge cases (wave 13)
# ---------------------------------------------------------------------------


def test_normalize_text_edge_cases(ray_session, tmp_path):
    from osmwaterwayextractor_ray.pipelines import webtext

    cases = [
        (0, "  Leading And   MIXED\tcase\n\nruns  ", "leading and mixed case runs"),
        (1, "", ""),
        (2, "\t \n", ""),
        (3, "already clean", "already clean"),
        (4, "A\fB\vC", "a b c"),
        (5, None, ""),
    ]
    df = pd.DataFrame(
        [(i, t) for i, t, _ in cases], columns=["doc_id", "text"]
    )
    df["lang"] = "en"
    df["source"] = "s0"
    df["n_chars"] = df["text"].str.len().fillna(0).astype(np.int64)
    d = tmp_path / "norm"
    d.mkdir()
    df.to_parquet(d / "documents.parquet", index=False)
    got = (
        webtext.normalize_text(str(d))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for i, _, want in cases:
        row = got[got["doc_id"] == i].iloc[0]
        assert row["norm_text"] == want, (i, row["norm_text"])
        assert row["n_chars_norm"] == len(want)
    # SQL twin agrees on the same edge cases
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
    )
    ora = (
        con.execute(webtext.NORMALIZE_TEXT_SQL)
        .fetchdf()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, ora[got.columns], check_dtype=False)
