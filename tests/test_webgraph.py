"""Web-graph operators (pipelines/webgraph.py) — brute-force references +
block invariance. tests/test_oracle.py pins the SQL oracles; here the
reference is an independent pure-Python implementation (dict/set loops),
so the Ray pipeline and the SQL can't share a bug."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from osmwaterwayextractor_ray.pipelines import webgraph

N_DOCS = 60


def _make_docs(n=N_DOCS):
    texts = [" ".join(["w"] * (1 + i % 5)) for i in range(n)]
    return pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": texts,
            "lang": "en",
            "source": [f"s{i % 3}" for i in range(n)],
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    )


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("webgraph_docs")
    _make_docs().to_parquet(d / "documents.parquet", index=False)
    return str(d)


def _brute_edges(n=N_DOCS) -> set[tuple[int, int]]:
    out = set()
    for did in range(n):
        for m, a in webgraph._LINK_RULES:
            t = (did * m + a) % n
            if t != did:
                out.add((did, t))
    return out


def test_page_links_bruteforce(ray_session, corpus_dir):
    got = set(
        map(tuple, webgraph.page_links(corpus_dir).to_pandas().to_numpy().tolist())
    )
    assert got == _brute_edges()


def test_link_stats_bruteforce(ray_session, corpus_dir):
    edges = _brute_edges()
    got = (
        webgraph.link_stats(corpus_dir)
        .to_pandas()
        .sort_values("page_id")
        .reset_index(drop=True)
    )
    assert len(got) == N_DOCS
    for _, row in got.iterrows():
        p = row["page_id"]
        assert row["out_deg"] == sum(1 for s, _ in edges if s == p)
        assert row["in_deg"] == sum(1 for _, d in edges if d == p)


def _brute_pagerank(n=N_DOCS, iters=webgraph._PR_ITERS) -> dict[int, int]:
    edges = _brute_edges()
    outdeg: dict[int, int] = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    pr = {v: webgraph._PR_SCALE // n for v in range(n)}
    base = (15 * webgraph._PR_SCALE) // (100 * n)
    for _ in range(iters):
        sums = {v: 0 for v in range(n)}
        for s, d in edges:
            sums[d] += pr[s] // outdeg[s]
        pr = {v: base + (85 * sums[v]) // 100 for v in range(n)}
    return pr


def test_pagerank_bruteforce(ray_session, corpus_dir):
    got = webgraph.pagerank(corpus_dir).to_pandas()
    want = _brute_pagerank()
    assert len(got) == N_DOCS
    for _, row in got.iterrows():
        assert row["pr"] == want[row["page_id"]], row["page_id"]
    # mass sanity: damped + dangling-drop never exceeds the initial mass
    assert got["pr"].sum() <= webgraph._PR_SCALE


def test_pagerank_zero_iters(ray_session, corpus_dir):
    # iters=0 must return the uniform pr_0 = SCALE // N (regression: the
    # raw-sums fold crashed on sums=None before zero-fill)
    got = webgraph.pagerank(corpus_dir, iters=0).to_pandas()
    assert len(got) == N_DOCS
    assert (got["pr"] == webgraph._PR_SCALE // N_DOCS).all()


@pytest.fixture(scope="module")
def zero_link_dir(tmp_path_factory):
    # n_docs=1: every synthesized link target is (1*m+a) % 1 == 0 == doc_id,
    # all self-links -> the distinct edge list is EMPTY
    d = tmp_path_factory.mktemp("webgraph_nolinks")
    _make_docs(1).to_parquet(d / "documents.parquet", index=False)
    return str(d)


def test_hits_zero_link_corpus(ray_session, zero_link_dir):
    # regression: Max over the empty grouped sums returned None -> TypeError
    got = webgraph.hits_scores(zero_link_dir).to_pandas()
    assert len(got) == 1
    assert got["hub"].iloc[0] == 0 and got["auth"].iloc[0] == 0


def test_pagerank_zero_link_corpus(ray_session, zero_link_dir):
    got = webgraph.pagerank(zero_link_dir).to_pandas()
    # one page, no in-links: pr = base = (15*SCALE)//(100*1)
    assert len(got) == 1
    assert got["pr"].iloc[0] == (15 * webgraph._PR_SCALE) // 100


def _brute_hits(n=N_DOCS, iters=webgraph._HITS_ITERS):
    edges = _brute_edges(n)
    S = webgraph._HITS_SCALE
    h = {v: S for v in range(n)}
    a = {v: 0 for v in range(n)}
    for _ in range(iters):
        a = {v: 0 for v in range(n)}
        for s, d in edges:
            a[d] += h[s]
        m = max(max(a.values()), 1)
        a = {v: (x * S) // m for v, x in a.items()}
        h = {v: 0 for v in range(n)}
        for s, d in edges:
            h[s] += a[d]
        m = max(max(h.values()), 1)
        h = {v: (x * S) // m for v, x in h.items()}
    return h, a


def test_hits_bruteforce(ray_session, corpus_dir):
    got = webgraph.hits_scores(corpus_dir).to_pandas()
    hub, auth = _brute_hits()
    assert len(got) == N_DOCS
    for _, row in got.iterrows():
        p = row["page_id"]
        assert row["hub"] == hub[p] and row["auth"] == auth[p], p
    # max-normalization holds and at least one page hits the cap
    assert got["hub"].max() == webgraph._HITS_SCALE
    assert got["auth"].max() == webgraph._HITS_SCALE


def _brute_lpa(n=N_DOCS, iters=webgraph._LPA_ITERS):
    dir_edges = _brute_edges(n)
    und: dict[int, list[int]] = {v: [] for v in range(n)}
    for s, d in dir_edges | {(b, a) for a, b in dir_edges}:
        und[s].append(d)
    lab = {v: v for v in range(n)}
    for _ in range(iters):
        new = {}
        for v in range(n):
            if not und[v]:
                new[v] = lab[v]
                continue
            cnt: dict[int, int] = {}
            for u in und[v]:
                cnt[lab[u]] = cnt.get(lab[u], 0) + 1
            new[v] = min(cnt, key=lambda l: (-cnt[l], l))
        lab = new
    return lab


def test_label_prop_bruteforce(ray_session, corpus_dir):
    got = webgraph.label_prop_communities(corpus_dir).to_pandas()
    want = _brute_lpa()
    assert len(got) == N_DOCS
    for _, row in got.iterrows():
        assert row["community"] == want[row["page_id"]], row["page_id"]


def test_label_prop_zero_link(ray_session, zero_link_dir):
    # isolated node keeps its own label through every iteration
    got = webgraph.label_prop_communities(zero_link_dir).to_pandas()
    assert len(got) == 1
    assert got["community"].iloc[0] == got["page_id"].iloc[0]


def test_adamic_adar_bruteforce(ray_session, corpus_dir):
    import math

    n = N_DOCS
    dir_edges = _brute_edges(n)
    und = dir_edges | {(b, a) for a, b in dir_edges}
    nbrs: dict[int, set[int]] = {v: set() for v in range(n)}
    for a, b in und:
        nbrs[a].add(b)
    want: dict[tuple[int, int], tuple[int, int]] = {}
    for x in range(n):
        for y in range(x + 1, n):
            if y in nbrs[x]:
                continue
            common = nbrs[x] & nbrs[y]
            if not common:
                continue
            aa = sum(
                math.floor(webgraph.AA_Q / math.log(len(nbrs[z]))) for z in common
            )
            want[(x, y)] = (len(common), aa)
    got = webgraph.adamic_adar(corpus_dir).to_pandas()
    assert len(got) == len(want)
    for _, row in got.iterrows():
        k = (row["id_a"], row["id_b"])
        assert want[k] == (row["n_common"], row["aa_q"]), k


def test_latest_snapshot_bruteforce(ray_session, corpus_dir):
    got = (
        webgraph.latest_snapshot(corpus_dir)
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    docs = _make_docs()
    rows = []
    for did, text in zip(docs["doc_id"], docs["text"]):
        n_caps = 1 + did % 3
        c = n_caps - 1
        t = text if c == 0 else f"{text} rev{c}"
        rows.append(
            (
                f"https://site{did % webgraph._N_HOSTS}.test/p/{did:08d}",
                webgraph._TS_BASE_US + did * 1_000_000 + c * webgraph._HOUR_US,
                n_caps,
                len(t),
            )
        )
    want = pd.DataFrame(
        rows, columns=["url", "latest_ts", "n_captures", "latest_len"]
    ).sort_values("url").reset_index(drop=True)
    got["latest_ts"] = got["latest_ts"].astype("datetime64[us]").astype(np.int64)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_anchor_text_bruteforce(ray_session, corpus_dir):
    n = N_DOCS
    want: dict[int, list[str]] = {}
    for did in range(n):
        for m, a in webgraph._LINK_RULES:
            t = (did * m + a) % n
            if t != did:
                want.setdefault(t, []).append(f"a{(did * 3 + t) % 101}")
    got = webgraph.anchor_text(corpus_dir).to_pandas()
    assert len(got) == len(want)
    for _, row in got.iterrows():
        anchors = want[row["dst_page"]]
        assert row["n_anchors"] == len(anchors)
        assert row["n_unique_anchors"] == len(set(anchors))
        assert row["top_anchor"] == min(anchors)


def test_host_graph_bruteforce(ray_session, corpus_dir):
    counts: dict[tuple[str, str], int] = {}
    for s, d in _brute_edges():
        key = (
            f"site{s % webgraph._N_HOSTS}.test",
            f"site{d % webgraph._N_HOSTS}.test",
        )
        counts[key] = counts.get(key, 0) + 1
    got = webgraph.host_graph(corpus_dir).to_pandas()
    assert len(got) == len(counts)
    for _, row in got.iterrows():
        key = (row["src_host"], row["dst_host"])
        assert row["n_edges"] == counts[key]
        assert row["n_reverse"] == counts.get((key[1], key[0]), 0)


CANON_CASES = [
    # (raw, canonical)
    ("https://site3.test/p/00000001", "https://site3.test/p/00000001"),
    ("HTTP://Site3.test/p/00000001/", "https://site3.test/p/00000001"),
    (
        "https://site3.test/p/00000001?utm_source=s1&utm_campaign=c2#sec5",
        "https://site3.test/p/00000001",
    ),
    # non-utm params survive, utm stripped from the middle
    ("https://a.test/x?utm_x=1&q=2", "https://a.test/x?q=2"),
    ("https://a.test/x?q=2&utm_x=1", "https://a.test/x?q=2"),
    # fragment-only and slash-only tails
    ("https://a.test/#top", "https://a.test"),
    ("https://A.Test///", "https://a.test"),
    # scheme is upgraded only for exactly http
    ("ftp://a.test/f", "ftp://a.test/f"),
    ("httpx://a.test/f", "httpx://a.test/f"),
    # non-URL strings pass through
    ("not a url", "not a url"),
]


def test_canonicalize_urls_cases():
    import pyarrow as pa

    raw = pa.array([r for r, _ in CANON_CASES], type=pa.string())
    got = webgraph.canonicalize_urls(raw).to_pylist()
    assert got == [c for _, c in CANON_CASES]


def test_canonicalize_urls_idempotent_hypothesis():
    """Canonicalization must be a projection: canon(canon(x)) == canon(x)
    for ANY string (canonicalizers classically fail this on inputs where
    one rewrite exposes another)."""
    import pyarrow as pa
    from hypothesis import given, settings
    from hypothesis import strategies as st

    piece = st.sampled_from(
        ["http://", "HTTPS://", "hTTp://", "Site9.TEST", "a.b", "/p/1", "/",
         "//", "?", "&", "#frag", "utm_x=1", "q=2", "utm_", "#", "x y", ""]
    )
    urls = st.lists(piece, min_size=0, max_size=8).map("".join)

    @settings(max_examples=300, deadline=None)
    @given(st.lists(urls, min_size=1, max_size=20))
    def run(batch):
        arr = pa.array(batch, type=pa.string())
        once = webgraph.canonicalize_urls(arr)
        twice = webgraph.canonicalize_urls(once)
        assert once.to_pylist() == twice.to_pylist()

    run()


def test_url_dedup_bruteforce(ray_session, corpus_dir):
    got = webgraph.url_dedup(corpus_dir).to_pandas()
    assert len(got) == N_DOCS
    for _, row in got.iterrows():
        did = int(row["url"].rsplit("/", 1)[1])
        assert row["url"] == f"https://site{did % webgraph._N_HOSTS}.test/p/{did:08d}"
        assert row["n_variants"] == 1 + did % 3


def test_link_components_bruteforce(ray_session, corpus_dir):
    # sequential union-find over the sparse edge slice
    parent = list(range(N_DOCS))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    n_edges = 0
    for s, d in _brute_edges():
        if (s + d) % webgraph._CC_MOD == 0:
            n_edges += 1
            a, b = find(s), find(d)
            if a != b:
                parent[max(a, b)] = min(a, b)
    # min-id labels
    want = {}
    for v in range(N_DOCS):
        r = find(v)
        want.setdefault(r, []).append(v)
    label = {v: min(members) for r, members in want.items() for v in members}
    assert n_edges > 0  # the fixture must exercise real merges
    got = webgraph.link_components(corpus_dir).to_pandas()
    assert len(got) == N_DOCS
    for _, row in got.iterrows():
        assert row["component"] == label[row["page_id"]], row["page_id"]


def test_snapshot_diff_bruteforce(ray_session, corpus_dir):
    docs = _make_docs()
    got = webgraph.snapshot_diff(corpus_dir).to_pandas()
    assert len(got) == N_DOCS
    by_url = {row["url"]: row for _, row in got.iterrows()}
    for did, text in zip(docs["doc_id"], docs["text"]):
        url = f"https://site{did % webgraph._N_HOSTS}.test/p/{did:08d}"
        n_caps = 1 + did % 3
        lens = [len(text if c == 0 else f"{text} rev{c}") for c in range(n_caps)]
        row = by_url[url]
        assert row["n_captures"] == n_caps
        assert row["latest_len"] == lens[-1]
        assert row["prev_len"] == (lens[-2] if n_caps > 1 else 0)
        assert row["status"] == (
            "new" if n_caps == 1 else ("changed" if lens[-1] != lens[-2] else "unchanged")
        )


@pytest.mark.parametrize(
    "op",
    [
        "page_links",
        "link_stats",
        "pagerank",
        "latest_snapshot",
        "domain_stats",
        "anchor_text",
        "host_graph",
        "url_dedup",
        "snapshot_diff",
        "link_components",
        "host_blocklist",
        "curate_web_corpus",
        "hits_scores",
        "label_prop_communities",
        "adamic_adar",
        "k_core",
        "clustering_coeff",
        "crawl_depth",
        "random_walks",
        "scc",
    ],
)
def test_block_invariance(ray_session, corpus_dir, monkeypatch, op):
    fn = getattr(webgraph, op)
    base = fn(corpus_dir).to_pandas()

    real = webgraph._read_documents

    def spread(sf_dir, columns):
        import pyarrow as pa

        ds = real(sf_dir, columns)

        def tag(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            return t.append_column(
                "__blk", pa.array((ids * 2654435761) % 5, type=pa.int64())
            )

        return (
            ds.map_batches(tag, batch_format="pyarrow")
            .sort("__blk")
            .map_batches(lambda t: t.drop_columns(["__blk"]), batch_format="pyarrow")
        )

    monkeypatch.setattr(webgraph, "_read_documents", spread)
    alt = fn(corpus_dir).to_pandas()
    cols = list(base.columns)
    assert list(alt.columns) == cols
    pd.testing.assert_frame_equal(
        alt.sort_values(cols).reset_index(drop=True),
        base.sort_values(cols).reset_index(drop=True),
    )


# ---------------------------------------------------------------------------
# host_blocklist vs brute force + precedence semantics
# ---------------------------------------------------------------------------

def _brute_blocklist(n=N_DOCS):
    rows = []
    for did in range(n):
        host = (
            webgraph._BL_SUBS[(did // webgraph._N_HOSTS) % 4]
            + f"site{did % webgraph._N_HOSTS}.test"
        )
        for e in webgraph.HOST_BLOCKLIST:  # list order = precedence
            if host == e or host.endswith("." + e):
                rows.append((did, host, e))
                break
    return pd.DataFrame(rows, columns=["doc_id", "host", "blocked_by"])


def test_host_blocklist_bruteforce(ray_session, corpus_dir):
    got = (
        webgraph.host_blocklist(corpus_dir)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = _brute_blocklist().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want.astype({"doc_id": got["doc_id"].dtype}))
    # semantics pins: exact match, subdomain suffix match, precedence
    # (N_DOCS=60 -> subdomain tiers '', 'cdn.', 'ads.' occur; 'm.' doesn't)
    by = dict(zip(got["host"], got["blocked_by"]))
    assert by.get("ads.site3.test") == "ads.site3.test"  # exact entry
    assert by.get("site7.test") == "site7.test"  # exact match on a bare entry
    assert by.get("ads.site7.test") == "site7.test"  # subdomain suffix match
    # cdn.site7.test matches BOTH 'site7.test' (ord 1) and its own exact
    # entry (ord 4): the earlier entry must win
    assert by.get("cdn.site7.test") == "site7.test"
    # registrable-domain boundary: site3.test itself is NOT blocked by
    # the 'ads.site3.test' entry, and no 'notsiteX' style superstring is
    assert "site3.test" not in by


# ---------------------------------------------------------------------------
# curate_web_corpus vs an independent staged python reference
# ---------------------------------------------------------------------------

def test_curate_web_corpus_bruteforce(ray_session, tmp_path_factory):
    """Dense corpus (600 docs, 3 sources, skewed lengths) so every stage
    bites: hosts cross the quota cap, sources get distinct mix rates, and
    all four subdomain tiers (incl. blocked ones) occur."""
    import math

    from osmwaterwayextractor_ray.pipelines.webtext import _STM_HASH_MULT

    rng = np.random.default_rng(31)
    n = 3000  # ~37 docs per host pre-mix, so the quota cap binds post-mix
    # skew source masses: source s2 docs are much longer
    lens = np.array(
        [int(rng.integers(5, 30)) * (3 if i % 3 == 2 else 1) for i in range(n)]
    )
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": ["x" * int(v) for v in lens],
            "lang": "en",
            "source": [f"s{i % 3}" for i in range(n)],
            "n_chars": lens.astype(np.int64),
        }
    )
    d = tmp_path_factory.mktemp("cwc_docs")
    df.to_parquet(d / "documents.parquet", index=False)

    got = (
        webgraph.curate_web_corpus(str(d))
        .to_pandas()
        .sort_values(["host", "host_rank"])
        .reset_index(drop=True)
    )

    # staged reference, dict/loop style
    def host(did):
        return (
            webgraph._BL_SUBS[(did // webgraph._N_HOSTS) % 4]
            + f"site{did % webgraph._N_HOSTS}.test"
        )

    def is_blocked(h):
        return any(
            h == e or h.endswith("." + e) for e in webgraph.HOST_BLOCKLIST
        )

    surv = df[[not is_blocked(host(i)) for i in df["doc_id"]]].copy()
    mass = surv.groupby("source")["n_chars"].sum().to_dict()
    m_min = min(mass.values())
    thr = {
        s: math.floor(math.sqrt(m_min / float(m)) * 4294967296)
        for s, m in mass.items()
    }
    mixed = surv[
        [
            (int(r["doc_id"]) * _STM_HASH_MULT) % 4294967296 < thr[r["source"]]
            for _, r in surv.iterrows()
        ]
    ].copy()
    mixed["host"] = [host(int(i)) for i in mixed["doc_id"]]
    mixed = mixed.sort_values(
        ["host", "n_chars", "doc_id"], ascending=[True, False, True]
    )
    mixed["host_rank"] = mixed.groupby("host").cumcount() + 1
    want = (
        mixed[mixed["host_rank"] <= webgraph._CWC_CAP][
            ["doc_id", "host", "source", "n_chars", "host_rank"]
        ]
        .sort_values(["host", "host_rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got, want.astype({c: got[c].dtype for c in want.columns})
    )
    # every stage actually bit on this corpus
    assert len(surv) < len(df)  # blocklist dropped docs
    assert len(mixed) < len(surv)  # mix downsampled
    assert (want["host_rank"] == webgraph._CWC_CAP).any()  # quota hit the cap
    assert len(set(thr.values())) > 1  # distinct mix rates


# ---------------------------------------------------------------------------
# k-core + clustering coefficient (wave 18)
# ---------------------------------------------------------------------------


def _brute_und_nbrs(n) -> dict[int, set[int]]:
    dir_edges = _brute_edges(n)
    und = dir_edges | {(b, a) for a, b in dir_edges}
    nbrs: dict[int, set[int]] = {}
    for a, b in und:
        nbrs.setdefault(a, set()).add(b)
    return nbrs


def _brute_kcore(n: int, k: int, iters: int = 8) -> dict[int, int]:
    """Independent dict/set peel: at most `iters` rounds, early fixpoint."""
    nbrs = _brute_und_nbrs(n)
    act = set(nbrs)
    for _ in range(iters):
        deg = {v: sum(1 for u in nbrs[v] if u in act) for v in act}
        new = {v for v in act if deg[v] >= k}
        if new == act:
            break
        act = new
    out = {}
    for v in act:
        d = sum(1 for u in nbrs[v] if u in act)
        if d > 0:
            out[v] = d
    return out


@pytest.fixture(scope="module")
def corpus77_dir(tmp_path_factory):
    # n=77: the k=6 peel cascades over 2 rounds (77 -> 10 nodes) and the
    # k=5 peel also takes 2 rounds — exercises the iteration, not just
    # the initial degree filter
    d = tmp_path_factory.mktemp("webgraph_docs77")
    _make_docs(77).to_parquet(d / "documents.parquet", index=False)
    return str(d)


@pytest.fixture(scope="module")
def corpus53_dir(tmp_path_factory):
    # n=53: the synthesized circulant graph actually has triangles
    d = tmp_path_factory.mktemp("webgraph_docs53")
    _make_docs(53).to_parquet(d / "documents.parquet", index=False)
    return str(d)


@pytest.mark.parametrize(
    "n,k,fixture",
    [
        (N_DOCS, 3, "corpus_dir"),  # default k: nothing peels (all deg >= 3)
        (77, 5, "corpus77_dir"),  # 2-round cascade, large surviving core
        (77, 6, "corpus77_dir"),  # 2-round cascade, 77 -> 10 nodes
    ],
)
def test_k_core_bruteforce(ray_session, request, n, k, fixture):
    d = request.getfixturevalue(fixture)
    want = _brute_kcore(n, k)
    got = webgraph.k_core(d, k=k).to_pandas()
    assert len(got) == len(want)
    for _, row in got.iterrows():
        assert want[row["page_id"]] == row["deg"], row["page_id"]


def test_k_core_cascade_bites(ray_session, corpus77_dir):
    # the k=6 peel must actually remove nodes across >1 round on n=77
    want = _brute_kcore(77, 6)
    assert 0 < len(want) < 77
    first_round = {
        v for v, nb in _brute_und_nbrs(77).items() if len(nb) >= 6
    }
    assert set(want) < first_round  # round 2+ removed more than round 1


def test_clustering_coeff_bruteforce(ray_session, corpus53_dir):
    nbrs = _brute_und_nbrs(53)
    want = {}
    for v, nb in nbrs.items():
        deg = len(nb)
        nbl = sorted(nb)
        tri = sum(
            1
            for i in range(len(nbl))
            for j in range(i + 1, len(nbl))
            if nbl[j] in nbrs[nbl[i]]
        )
        lcc = (2 * tri * webgraph.LCC_Q) // (deg * (deg - 1)) if deg >= 2 else 0
        want[v] = (deg, tri, lcc)
    assert any(t > 0 for _, t, _ in want.values())  # triangles exist here
    got = webgraph.clustering_coeff(corpus53_dir).to_pandas()
    assert len(got) == len(want)
    for _, row in got.iterrows():
        assert want[row["page_id"]] == (
            row["deg"], row["tri"], row["lcc_q"],
        ), row["page_id"]


def test_clustering_coeff_zero_triangles(ray_session, corpus_dir):
    # n=60 has no triangles: every tri/lcc_q must be exactly 0
    got = webgraph.clustering_coeff(corpus_dir).to_pandas()
    assert len(got) == N_DOCS
    assert (got["tri"] == 0).all() and (got["lcc_q"] == 0).all()
    assert (got["deg"] >= 3).all()


# ---------------------------------------------------------------------------
# crawl depth (multi-source BFS) + deterministic random walks (wave 19)
# ---------------------------------------------------------------------------


def _brute_adj(n) -> dict[int, list[int]]:
    adj: dict[int, list[int]] = {}
    for s, d in _brute_edges(n):
        adj.setdefault(s, []).append(d)
    return {v: sorted(t) for v, t in adj.items()}


def test_crawl_depth_bruteforce(ray_session, corpus_dir):
    n = N_DOCS
    adj = _brute_adj(n)
    seeds = [v for v in range(n) if v % webgraph._CRAWL_SEED_MOD == 0]
    dist = {v: 0 for v in seeds}
    frontier = set(seeds)
    for depth in range(1, webgraph._CRAWL_MAX_DEPTH + 1):
        nxt = {d for s in frontier for d in adj.get(s, [])} - set(dist)
        for v in nxt:
            dist[v] = depth
        frontier = nxt
        if not nxt:
            break
    got = webgraph.crawl_depth(corpus_dir).to_pandas()
    assert len(got) == len(dist)
    for _, row in got.iterrows():
        assert dist[row["page_id"]] == row["depth"], row["page_id"]
    # the BFS really expands over multiple levels on this corpus
    assert got["depth"].max() >= 2
    assert (got["depth"] == 0).sum() == len(seeds)


def test_random_walks_bruteforce_and_dangling_stop(ray_session, corpus53_dir):
    n = 53
    adj = _brute_adj(n)
    # node 44 has 6*44 = 264 = -1 mod 53, so ALL its link targets are
    # itself -> dangling after self-link removal
    assert 44 not in adj
    start_mod = 11  # starts 0,11,22,33,44 — one walk starts dangling
    C1, C2, C3, P = (
        webgraph._WALK_C1, webgraph._WALK_C2, webgraph._WALK_C3, webgraph._WALK_P,
    )
    want = set()
    for w in range(0, n, start_mod):
        cur = w
        want.add((w, 0, w))
        for t in range(1, webgraph._WALK_STEPS + 1):
            outs = adj.get(cur, [])
            if not outs:
                break
            cur = outs[((w * C1 + t * C2 + cur * C3) % P) % len(outs)]
            want.add((w, t, cur))
    got = webgraph.random_walks(corpus53_dir, start_mod=start_mod).to_pandas()
    got_set = set(map(tuple, got[["walk_id", "step", "node"]].to_numpy().tolist()))
    assert got_set == want
    # the dangling walk stopped at step 0; at least one walk ran full length
    per_walk = got.groupby("walk_id")["step"].max()
    assert per_walk[44] == 0
    assert (per_walk == webgraph._WALK_STEPS).any()


def test_k_core_empty_core(ray_session, corpus_dir, zero_link_dir):
    # k above the max degree -> typed empty result, not a schema-less one
    # (ray's to_pandas() drops columns on any empty dataset, so the typed
    # contract is pinned via .schema())
    for ds in (webgraph.k_core(corpus_dir, k=100), webgraph.k_core(zero_link_dir)):
        assert ds.count() == 0
        assert ds.schema().names == ["page_id", "deg"]


def test_rank_agreement_bruteforce(ray_session, corpus_dir):
    k = webgraph._RA_K
    pr = _brute_pagerank()
    hub, auth = _brute_hits()
    top_pr = sorted(pr, key=lambda v: (-pr[v], v))[:k]
    top_ht = sorted(auth, key=lambda v: (-auth[v], v))[:k]
    rp = {v: i + 1 for i, v in enumerate(top_pr)}
    rh = {v: i + 1 for i, v in enumerate(top_ht)}
    common = sorted(set(rp) & set(rh))
    conc = disc = 0
    for i in range(len(common)):
        for j in range(i + 1, len(common)):
            s = (rp[common[i]] - rp[common[j]]) * (rh[common[i]] - rh[common[j]])
            conc += s > 0
            disc += s < 0
    got = webgraph.rank_agreement(corpus_dir).to_pandas().iloc[0]
    assert (got["k"], got["n_overlap"], got["n_concordant"], got["n_discordant"]) \
        == (k, len(common), conc, disc)
    # the metric is non-degenerate on this corpus
    assert got["n_overlap"] > 0 and got["n_concordant"] + got["n_discordant"] > 0


def test_community_modularity_bruteforce(ray_session, corpus_dir):
    n = N_DOCS
    lab = _brute_lpa()
    nbrs = _brute_und_nbrs(n)
    canon = {(a, b) for a, nb in nbrs.items() for b in nb if a < b}
    m = len(canon)
    ec: dict[int, int] = {}
    for a, b in canon:
        if lab[a] == lab[b]:
            ec[lab[a]] = ec.get(lab[a], 0) + 1
    dc: dict[int, int] = {}
    for v, nb in nbrs.items():
        dc[lab[v]] = dc.get(lab[v], 0) + len(nb)
    q_num = sum(4 * m * ec.get(c, 0) - d * d for c, d in dc.items())
    n_comm = len(dc) + sum(1 for v in range(n) if v not in nbrs)
    got = webgraph.community_modularity(corpus_dir).to_pandas().iloc[0]
    assert (got["m"], got["q_num"], got["n_communities"]) == (m, q_num, n_comm)
    assert m > 0 and got["q_num"] != 0  # metric is non-degenerate here


def test_community_modularity_zero_link(ray_session, zero_link_dir):
    got = webgraph.community_modularity(zero_link_dir).to_pandas().iloc[0]
    # no edges: m=0, q_num=0, the single isolated page is its own community
    assert (got["m"], got["q_num"], got["n_communities"]) == (0, 0, 1)


def _brute_trustrank(n=N_DOCS, iters=webgraph._PR_ITERS,
                     seed_mod=webgraph._CRAWL_SEED_MOD) -> dict[int, int]:
    edges = _brute_edges(n)
    outdeg: dict[int, int] = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    seeds = [v for v in range(n) if v % seed_mod == 0]
    S = webgraph._PR_SCALE
    init = S // len(seeds)
    base = (15 * S) // (100 * len(seeds))
    tr = {v: (init if v % seed_mod == 0 else 0) for v in range(n)}
    for _ in range(iters):
        sums = {v: 0 for v in range(n)}
        for s, d in edges:
            sums[d] += tr[s] // outdeg[s]
        tr = {
            v: (base if v % seed_mod == 0 else 0) + (85 * sums[v]) // 100
            for v in range(n)
        }
    return tr


def test_trustrank_bruteforce(ray_session, corpus_dir):
    got = webgraph.trustrank(corpus_dir).to_pandas()
    want = _brute_trustrank()
    assert len(got) == N_DOCS
    for _, row in got.iterrows():
        assert row["tr"] == want[row["page_id"]], row["page_id"]
    # trust actually decays with seed distance: seeds hold the top scores
    seeds = {v for v in range(N_DOCS) if v % webgraph._CRAWL_SEED_MOD == 0}
    by_tr = got.sort_values(["tr", "page_id"], ascending=[False, True])
    assert set(by_tr.head(2)["page_id"]) <= seeds
    # and non-seed pages got nonzero propagated trust (not the degenerate
    # all-mass-stays-on-seeds case)
    assert (got[~got["page_id"].isin(list(seeds))]["tr"] > 0).any()


def test_trustrank_zero_iters(ray_session, corpus_dir):
    got = webgraph.trustrank(corpus_dir, iters=0).to_pandas()
    seeds = {v for v in range(N_DOCS) if v % webgraph._CRAWL_SEED_MOD == 0}
    init = webgraph._PR_SCALE // len(seeds)
    for _, row in got.iterrows():
        want = init if row["page_id"] in seeds else 0
        assert row["tr"] == want, row["page_id"]


# ---------------------------------------------------------------------------
# scc vs an independent Kosaraju reference
# ---------------------------------------------------------------------------

def _brute_scc(n=N_DOCS) -> dict[int, int]:
    """Kosaraju (iterative): page_id -> min member id of its SCC."""
    edges = _brute_edges(n)
    adj = {v: [] for v in range(n)}
    radj = {v: [] for v in range(n)}
    for s, d in edges:
        adj[s].append(d)
        radj[d].append(s)
    order, seen = [], [False] * n
    for v0 in range(n):
        if seen[v0]:
            continue
        seen[v0] = True
        stk = [(v0, iter(adj[v0]))]
        while stk:
            v, it = stk[-1]
            advanced = False
            for w in it:
                if not seen[w]:
                    seen[w] = True
                    stk.append((w, iter(adj[w])))
                    advanced = True
                    break
            if not advanced:
                order.append(v)
                stk.pop()
    comp: dict[int, int] = {}
    for v0 in reversed(order):
        if v0 in comp:
            continue
        members, stk = [v0], [v0]
        comp[v0] = -1
        while stk:
            v = stk.pop()
            for w in radj[v]:
                if w not in comp:
                    comp[w] = -1
                    members.append(w)
                    stk.append(w)
        mn = min(members)
        for v in members:
            comp[v] = mn
    return comp


@pytest.mark.parametrize(
    "n,fixture,n_comps",
    [
        (N_DOCS, "corpus_dir", 2),   # 48 + 12 — one peel round
        (77, "corpus77_dir", 4),     # 60/10/6 + a singleton (node off-cycle)
    ],
)
def test_scc_bruteforce(ray_session, request, n, fixture, n_comps):
    d = request.getfixturevalue(fixture)
    want = _brute_scc(n)
    assert len(set(want.values())) == n_comps  # the fixture has real signal
    got = webgraph.scc(d).to_pandas()
    assert len(got) == n
    for _, row in got.iterrows():
        assert row["scc_id"] == want[row["page_id"]], row["page_id"]


def test_scc_singleton_has_no_cycle(ray_session, corpus77_dir):
    # the n=77 singleton really is acyclic-in-context: its scc_id is itself
    want = _brute_scc(77)
    singletons = {
        v for v in want if sum(1 for u in want.values() if u == want[v]) == 1
    }
    assert singletons  # fixture provides at least one
    got = webgraph.scc(corpus77_dir).to_pandas().set_index("page_id")["scc_id"]
    for v in singletons:
        assert got[v] == v
