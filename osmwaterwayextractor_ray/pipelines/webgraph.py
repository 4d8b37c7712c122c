"""Web-graph operators over the Common-Crawl-style pages surface (wave 6).

The link graph is embedded in synthesized page HTML (same device as
``pipelines/pages.synth_pages``: derived deterministically from the driver
``documents`` table, no RNG, no external data) and then ACTUALLY extracted
from the HTML bytes by a compiled-regex map_batches stage — the oracle
reproduces the targets arithmetically, so the whole extract → edge-list →
graph-analysis chain is exactness-checked end to end.

Operators (all with exact DuckDB SQL oracles in __ray_entry__):

  * page_links      — href extraction from html -> distinct non-self edge
                      list (src_page, dst_page).
  * link_stats      — per-page out/in degree with zero-fill over the full
                      page set (the link-analysis base table).
  * pagerank        — T=5 damped PageRank iterations in FIXED-POINT INT64
                      arithmetic: contributions are pr//out_deg, damping is
                      (85·sum)//100. Integer sums commute, so the result is
                      bit-identical under ANY block structure / num_cpus —
                      the repo's invariance rule — and the oracle is an
                      unrolled-CTE SQL program (the kmeans_embeddings
                      device). Dangling-node mass is dropped (documented
                      standard simplification; total mass therefore decays,
                      which is fine for ranking).
  * latest_snapshot — multi-capture synth (1 + doc_id % 3 captures per
                      url at hourly warc_ts offsets); keep the latest
                      capture per url: the cross-snapshot dedup every
                      Common-Crawl pipeline starts with.
  * domain_stats    — per-host rollup: pages, text bytes, out-links and
                      cross-domain links (hosts partition the page set
                      doc_id % 20).

Scale notes (100 TB bar): extraction and synthesis are stateless
map_batches over pruned reads; the edge list is built by hash-partitioned
``fastagg.distinct`` (one shuffle, no all-pairs); degrees/rollups are
partial-aggregated int sums; PageRank keeps everything distributed — the
per-iteration pr table is re-pinned via ``stages.pin`` (object-store at
bench scale, parquet spill at 100 TB via WWX_PIN_MODE) and each iteration
is one lookup_join (edges ⋈ pr on src) plus one grouped sum by dst; the
driver only ever sees O(1) scalars (the page count).
"""

from __future__ import annotations

import os
import re

import numpy as np
import pyarrow as pa

from osmwaterwayextractor_ray.stages.fastagg import (
    cogroup,
    distinct,
    grouped_agg,
    lookup_join,
)
from osmwaterwayextractor_ray.stages.pin import pin

# --------------------------------------------------------------------------
# deterministic link-graph synthesis (doc_id arithmetic, like pages.synth)
# --------------------------------------------------------------------------

_N_HOSTS = 20
# three outgoing hrefs per page: target_k = (doc_id * m_k + a_k) % n_docs
_LINK_RULES = ((7, 1), (13, 2), (31, 5))

_HREF_RE = re.compile(rb'<a href="https://site(\d+)\.test/p/(\d{8})">')


def _n_docs(sf_dir: str) -> int:
    # O(1) scalar on the driver: row count of the pruned doc_id column
    return _read_documents(sf_dir, ["doc_id"]).count()


def synth_linked_pages(sf_dir: str, n_docs: int):
    """One page per document: host = site{doc_id % 20}.test, html carries
    the page text plus a footer of three <a href> links whose targets are
    pure doc_id arithmetic (dense ids, so every target exists)."""
    ds = _read_documents(sf_dir, ["doc_id", "text", "n_chars"])

    def to_pages(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = ["" if t is None else t for t in batch.column("text").to_pylist()]
        htmls = []
        hosts = []
        for did, text in zip(ids.tolist(), texts):
            host = f"site{did % _N_HOSTS}.test"
            hosts.append(host)
            anchors = "".join(
                f'<a href="https://site{((did * m + a) % n_docs) % _N_HOSTS}.test'
                f'/p/{(did * m + a) % n_docs:08d}">'
                f"a{(did * 3 + (did * m + a) % n_docs) % 101}</a>"
                for m, a in _LINK_RULES
            )
            htmls.append(
                f"<html><body><p>{text}</p><footer>{anchors}</footer></body></html>".encode()
            )
        return pa.table(
            {
                "page_id": pa.array(ids, type=pa.int64()),
                "host": pa.array(hosts, type=pa.string()),
                "html": pa.array(htmls, type=pa.binary()),
                "n_chars": batch["n_chars"],
            }
        )

    return ds.map_batches(to_pages, batch_format="pyarrow", batch_size=1024)


def _extract_links(pages):
    """(src_page, src_host, dst_page, dst_host) rows parsed from html bytes.
    Warm-task map_batches — the only state is one module-level compiled
    regex (CLAUDE.md: actor pools only for real per-actor state)."""

    def parse(batch: pa.Table) -> pa.Table:
        ids = batch.column("page_id").to_numpy(zero_copy_only=False)
        hosts = batch.column("host").to_pylist()
        htmls = batch.column("html").to_pylist()
        src, shost, dst, dhost = [], [], [], []
        for did, h, html in zip(ids.tolist(), hosts, htmls):
            for m in _HREF_RE.finditer(html or b""):
                src.append(did)
                shost.append(h)
                dst.append(int(m.group(2)))
                dhost.append(f"site{int(m.group(1))}.test")
        return pa.table(
            {
                "src_page": pa.array(src, type=pa.int64()),
                "src_host": pa.array(shost, type=pa.string()),
                "dst_page": pa.array(dst, type=pa.int64()),
                "dst_host": pa.array(dhost, type=pa.string()),
            }
        )

    return pages.map_batches(parse, batch_format="pyarrow", batch_size=1024)


def _edge_list(sf_dir: str, n_docs: int):
    """Distinct non-self (src_page, dst_page) edges (hash-partitioned)."""
    import pyarrow.compute as pc

    raw = _extract_links(synth_linked_pages(sf_dir, n_docs))
    nonself = raw.map_batches(
        lambda t: t.filter(pc.not_equal(t["src_page"], t["dst_page"])).select(
            ["src_page", "dst_page"]
        ),
        batch_format="pyarrow",
    )
    return distinct(nonself, ["src_page", "dst_page"], num_parts=16)


# SQL fragments shared by all oracles
_EDGES_CTE = f"""
n AS (SELECT count(*) AS n FROM documents),
raw AS (
  SELECT doc_id AS src_page, (doc_id * r.m + r.a) % n.n AS dst_page
  FROM documents, n,
       (VALUES {", ".join(f"({m}, {a})" for m, a in _LINK_RULES)}) AS r(m, a)
),
edges AS (SELECT DISTINCT src_page, dst_page FROM raw WHERE src_page <> dst_page)
"""


def page_links(sf_dir: str):
    """The extracted, deduplicated web-link edge list."""
    return _edge_list(sf_dir, _n_docs(sf_dir))


PAGE_LINKS_SQL = f"WITH {_EDGES_CTE} SELECT src_page, dst_page FROM edges"


def link_stats(sf_dir: str):
    """Per-page (page_id, out_deg, in_deg), zero-filled over all pages."""
    edges = _edge_list(sf_dir, _n_docs(sf_dir))

    # one pass: each edge contributes (src,1,0) and (dst,0,1)
    def expand(t: pa.Table) -> pa.Table:
        s = t.column("src_page").to_numpy(zero_copy_only=False)
        d = t.column("dst_page").to_numpy(zero_copy_only=False)
        page = np.concatenate([s, d])
        out_d = np.concatenate([np.ones(len(s), np.int64), np.zeros(len(d), np.int64)])
        in_d = np.concatenate([np.zeros(len(s), np.int64), np.ones(len(d), np.int64)])
        return pa.table(
            {
                "page_id": pa.array(page, type=pa.int64()),
                "o": pa.array(out_d, type=pa.int64()),
                "i": pa.array(in_d, type=pa.int64()),
            }
        )

    deg = grouped_agg(
        edges.map_batches(expand, batch_format="pyarrow"),
        ["page_id"],
        {"out_deg": ("o", "sum"), "in_deg": ("i", "sum")},
        num_parts=16,
    )
    pages = _read_documents(sf_dir, ["doc_id"]).map_batches(
        lambda t: t.rename_columns(["page_id"]), batch_format="pyarrow"
    )
    return _attach_zero_fill(
        pages,
        deg,
        key="page_id",
        value_cols=["out_deg", "in_deg"],
        left_schema=pa.schema([("page_id", pa.int64())]),
        right_schema=pa.schema(
            [("page_id", pa.int64()), ("out_deg", pa.int64()), ("in_deg", pa.int64())]
        ),
    )


LINK_STATS_SQL = f"""
WITH {_EDGES_CTE},
o AS (SELECT src_page AS page_id, count(*) AS out_deg FROM edges GROUP BY 1),
i AS (SELECT dst_page AS page_id, count(*) AS in_deg FROM edges GROUP BY 1)
SELECT d.doc_id AS page_id,
       COALESCE(o.out_deg, 0) AS out_deg,
       COALESCE(i.in_deg, 0) AS in_deg
FROM documents d LEFT JOIN o ON d.doc_id = o.page_id
                 LEFT JOIN i ON d.doc_id = i.page_id
"""


# --------------------------------------------------------------------------
# fixed-point PageRank
# --------------------------------------------------------------------------

_PR_SCALE = 10**12
_PR_ITERS = 5
_PR_DAMP_NUM, _PR_DAMP_DEN = 85, 100


_EWD_SCHEMA = pa.schema(
    [("src_page", pa.int64()), ("dst_page", pa.int64()), ("out_deg", pa.int64())]
)


def _edges_with_outdeg(sf_dir: str, n_docs: int, prefix: str):
    """Pinned (src_page, dst_page, out_deg) edge table — the shared input
    of the power-iteration family (pagerank, trustrank)."""
    edges = pin(_edge_list(sf_dir, n_docs), f"{prefix}_edges")
    out_deg = grouped_agg(
        edges, ["src_page"], {"out_deg": ("dst_page", "count")}, num_parts=16
    )
    edge_schema = pa.schema([("src_page", pa.int64()), ("dst_page", pa.int64())])
    deg_schema = pa.schema([("src_page", pa.int64()), ("out_deg", pa.int64())])
    return pin(
        lookup_join(
            edges, out_deg, "src_page", "src_page", {"out_deg": "out_deg"},
            num_parts=16, left_schema=edge_schema, right_schema=deg_schema,
        ),
        f"{prefix}_edges_deg",
    )


def pagerank(sf_dir: str, iters: int = _PR_ITERS):
    """T damped PageRank iterations in int64 fixed point (see module doc).

    pr_0(v)      = SCALE // N
    pr_{t+1}(v)  = (15 · SCALE) // (100 · N)
                   + (85 · Σ_{u→v} pr_t(u) // out_deg(u)) // 100

    Every operation is integer floor division / addition on non-negatives,
    so any summation order gives the same bits and DuckDB's ``//`` (trunc)
    agrees with Python's (floor)."""
    n_docs = _n_docs(sf_dir)
    ewd = _edges_with_outdeg(sf_dir, n_docs, "webgraph")
    ewd_schema = _EWD_SCHEMA

    pages = _read_documents(sf_dir, ["doc_id"]).map_batches(
        lambda t: t.rename_columns(["page_id"]), batch_format="pyarrow"
    )
    pages_schema = pa.schema([("page_id", pa.int64())])

    init = _PR_SCALE // n_docs
    base = (15 * _PR_SCALE) // (100 * n_docs)

    # Intermediate state is the RAW per-page mass sums m_t (pinned; pages
    # with no in-links are simply absent = 0): the damping affine
    # pr_t = base + (85·m_t)//100 folds into the NEXT iteration's share
    # map — bit-identical to materializing pr per page, but each
    # iteration is ONE zero-fill attach over the edge list + ONE grouped
    # sum + ONE pin (the former per-iteration pages-side zero-fill
    # cogroup + damp pass + extra pin are gone). Iteration 0 skips the
    # join entirely: pr_0 is the constant SCALE//N for every page.
    sums_schema = pa.schema([("page_id", pa.int64()), ("m", pa.int64())])
    sums = None

    for it in range(iters):
        if sums is None:
            def share0(t: pa.Table) -> pa.Table:
                d = t.column("out_deg").to_numpy(zero_copy_only=False)
                return pa.table(
                    {
                        "page_id": t["dst_page"],
                        "c": pa.array(init // d, type=pa.int64()),
                    }
                )

            contrib = ewd.map_batches(share0, batch_format="pyarrow")
        else:
            # LEFT-attach the previous sums onto the edge list (missing
            # src -> m=0, i.e. pr = base), then damp inline
            sums_as_src = sums.map_batches(
                lambda t: t.rename_columns(["src_page", "m"]),
                batch_format="pyarrow",
            )
            joined = _attach_zero_fill(
                ewd, sums_as_src, key="src_page", value_cols=["m"],
                left_schema=ewd_schema,
                right_schema=pa.schema([("src_page", pa.int64()), ("m", pa.int64())]),
                extra_cols=["dst_page", "out_deg"],
            )

            def share(t: pa.Table) -> pa.Table:
                m = t.column("m").to_numpy(zero_copy_only=False)
                d = t.column("out_deg").to_numpy(zero_copy_only=False)
                p = base + (_PR_DAMP_NUM * m) // _PR_DAMP_DEN
                return pa.table(
                    {
                        "page_id": t["dst_page"],
                        "c": pa.array(p // d, type=pa.int64()),
                    }
                )

            contrib = joined.map_batches(share, batch_format="pyarrow")
        sums = pin(
            grouped_agg(contrib, ["page_id"], {"m": ("c", "sum")}, num_parts=16),
            f"webgraph_pr_m{it + 1}",
        )

    if sums is None:
        # iters=0: pr_0 is the uniform constant — no sums to attach
        def uniform(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "page_id": t["page_id"],
                    "pr": pa.array(np.full(len(t), init, np.int64), type=pa.int64()),
                }
            )

        return pages.map_batches(uniform, batch_format="pyarrow")

    # final pr per page (zero-fill once so every page appears)
    filled = _attach_zero_fill(
        pages, sums, key="page_id", value_cols=["m"],
        left_schema=pages_schema,
        right_schema=sums_schema,
    )

    def damp(t: pa.Table) -> pa.Table:
        m = t.column("m").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "page_id": t["page_id"],
                "pr": pa.array(
                    base + (_PR_DAMP_NUM * m) // _PR_DAMP_DEN, type=pa.int64()
                ),
            }
        )

    return filled.map_batches(damp, batch_format="pyarrow")


def _pagerank_sql(iters: int = _PR_ITERS) -> str:
    parts = [
        f"WITH {_EDGES_CTE}",
        "od AS (SELECT src_page, count(*) AS out_deg FROM edges GROUP BY 1)",
        f"pr0 AS (SELECT doc_id AS page_id, CAST({_PR_SCALE} AS BIGINT) // n.n AS pr"
        " FROM documents, n)",
    ]
    for t in range(iters):
        parts.append(
            f"s{t} AS (SELECT e.dst_page AS page_id,"
            f" CAST(sum(p.pr // od.out_deg) AS BIGINT) AS m"
            f" FROM edges e JOIN od USING (src_page)"
            f" JOIN pr{t} p ON p.page_id = e.src_page GROUP BY 1)"
        )
        parts.append(
            f"pr{t + 1} AS (SELECT d.doc_id AS page_id,"
            f" (15 * CAST({_PR_SCALE} AS BIGINT)) // (100 * n.n)"
            f" + ({_PR_DAMP_NUM} * COALESCE(s.m, 0)) // {_PR_DAMP_DEN} AS pr"
            f" FROM documents d CROSS JOIN n LEFT JOIN s{t} s ON d.doc_id = s.page_id)"
        )
    return ",\n".join(parts) + f"\nSELECT page_id, pr FROM pr{iters}"


PAGERANK_SQL = _pagerank_sql()


# --------------------------------------------------------------------------
# cross-snapshot dedup (latest capture per url)
# --------------------------------------------------------------------------

_TS_BASE_US = int(np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64))
_HOUR_US = 3_600_000_000


def synth_captures(sf_dir: str):
    """Multi-capture pages table: doc_id gets 1 + doc_id % 3 captures of
    url https://site{doc_id%20}.test/p/{doc_id:08d}; capture c has
    warc_ts = base + doc_id·1s + c·1h and text revision suffix ' rev{c}'
    for c > 0 (so later captures differ in length)."""
    ds = _read_documents(sf_dir, ["doc_id", "text"])

    def expand(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = ["" if t is None else t for t in batch.column("text").to_pylist()]
        url, ts, tl, cap = [], [], [], []
        for did, text in zip(ids.tolist(), texts):
            u = f"https://site{did % _N_HOSTS}.test/p/{did:08d}"
            for c in range(1 + did % 3):
                url.append(u)
                ts.append(_TS_BASE_US + did * 1_000_000 + c * _HOUR_US)
                t = text if c == 0 else f"{text} rev{c}"
                tl.append(len(t))
                cap.append(c)
        return pa.table(
            {
                "url": pa.array(url, type=pa.string()),
                "warc_ts": pa.array(ts, type=pa.int64()).cast(pa.timestamp("us")),
                "text_len": pa.array(tl, type=pa.int64()),
                "capture": pa.array(cap, type=pa.int64()),
            }
        )

    return ds.map_batches(expand, batch_format="pyarrow", batch_size=2048)


def latest_snapshot(sf_dir: str):
    """Keep the latest capture per url (warc_ts argmax) + capture count:
    one url-hash shuffle, per-bucket lexsort argmax — no driver state."""
    caps = synth_captures(sf_dir)
    num_parts = 16

    def tag(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        part = np.array(
            [hash_url(u) % num_parts for u in urls], dtype=np.int64
        )
        return batch.append_column("__part", pa.array(part, type=pa.int64()))

    def pick_latest(g: pa.Table) -> pa.Table:
        urls = np.asarray(g.column("url").to_pylist(), dtype=object)
        ts = g.column("warc_ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        order = np.lexsort((ts, urls))
        urls_s, ts_s = urls[order], ts[order]
        # last row of each url run = latest capture (ts strictly increasing
        # within a url by construction; lexsort is total so ties can't occur)
        is_last = np.r_[urls_s[1:] != urls_s[:-1], True]
        starts = np.flatnonzero(np.r_[True, urls_s[1:] != urls_s[:-1]])
        n_caps = np.diff(np.r_[starts, len(urls_s)])
        idx = pa.array(order[is_last], type=pa.int64())
        import pyarrow.compute as pc

        return pa.table(
            {
                "url": pc.take(g.column("url").combine_chunks(), idx),
                "latest_ts": pc.take(g.column("warc_ts").combine_chunks(), idx),
                "n_captures": pa.array(n_caps, type=pa.int64()),
                "latest_len": pc.take(g.column("text_len").combine_chunks(), idx),
            }
        )

    return (
        caps.map_batches(tag, batch_format="pyarrow", batch_size=8192)
        .groupby("__part")
        .map_groups(pick_latest, batch_format="pyarrow")
    )


LATEST_SNAPSHOT_SQL = f"""
WITH caps AS (
  SELECT 'https://site' || CAST(doc_id % {_N_HOSTS} AS VARCHAR) || '.test/p/'
           || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS url,
         TIMESTAMP '2024-01-01 00:00:00'
           + to_microseconds(doc_id * 1000000 + c.c * {_HOUR_US}) AS warc_ts,
         CAST(length(text || CASE WHEN c.c = 0 THEN '' ELSE ' rev' || CAST(c.c AS VARCHAR) END) AS BIGINT) AS text_len,
         row_number() OVER (PARTITION BY doc_id ORDER BY c.c DESC) AS rn,
         count(*) OVER (PARTITION BY doc_id) AS n_captures
  FROM documents, UNNEST([0, 1, 2]) AS c(c)
  WHERE c.c < 1 + doc_id % 3
)
SELECT url, warc_ts AS latest_ts, CAST(n_captures AS BIGINT) AS n_captures,
       text_len AS latest_len
FROM caps WHERE rn = 1
"""


def hash_url(u: str) -> int:
    """Deterministic 63-bit FNV-1a over the url bytes (process-independent,
    unlike builtin hash)."""
    h = 0xCBF29CE484222325
    for b in u.encode():
        h = ((h ^ b) * 0x100000001B3) & 0x7FFFFFFFFFFFFFFF
    return h


# --------------------------------------------------------------------------
# per-domain rollup
# --------------------------------------------------------------------------


def domain_stats(sf_dir: str):
    """Per-host rollup: (host, n_pages, sum_chars, n_out_links,
    n_cross_links). Link counts come from the EXTRACTED edge rows (pre-
    distinct raw hrefs, self-links included — the crawl-side accounting),
    cross = dst_host != src_host."""
    n_docs = _n_docs(sf_dir)
    pages = synth_linked_pages(sf_dir, n_docs)

    def page_partial(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "host": batch["host"],
                "np": pa.array(np.ones(len(batch), np.int64), type=pa.int64()),
                "nc": batch["n_chars"],
            }
        )

    pstats = grouped_agg(
        pages.map_batches(page_partial, batch_format="pyarrow"),
        ["host"],
        {"n_pages": ("np", "sum"), "sum_chars": ("nc", "sum")},
        num_parts=8,
    )

    links = _extract_links(synth_linked_pages(sf_dir, n_docs))

    def link_partial(batch: pa.Table) -> pa.Table:
        sh = batch.column("src_host").to_pylist()
        dh = batch.column("dst_host").to_pylist()
        cross = np.array([a != b for a, b in zip(sh, dh)], dtype=np.int64)
        return pa.table(
            {
                "host": batch["src_host"],
                "nl": pa.array(np.ones(len(batch), np.int64), type=pa.int64()),
                "nx": pa.array(cross, type=pa.int64()),
            }
        )

    lstats = grouped_agg(
        links.map_batches(link_partial, batch_format="pyarrow"),
        ["host"],
        {"n_out_links": ("nl", "sum"), "n_cross_links": ("nx", "sum")},
        num_parts=8,
    )

    # every host has pages AND links (3 raw hrefs per page): inner join
    return lookup_join(
        pstats, lstats, "host", "host",
        {"n_out_links": "n_out_links", "n_cross_links": "n_cross_links"},
        num_parts=8,
        left_schema=pa.schema(
            [("host", pa.string()), ("n_pages", pa.int64()), ("sum_chars", pa.int64())]
        ),
        right_schema=pa.schema(
            [("host", pa.string()), ("n_out_links", pa.int64()), ("n_cross_links", pa.int64())]
        ),
    )


DOMAIN_STATS_SQL = f"""
WITH n AS (SELECT count(*) AS n FROM documents),
raw AS (
  SELECT doc_id % {_N_HOSTS} AS src_h,
         ((doc_id * r.m + r.a) % n.n) % {_N_HOSTS} AS dst_h
  FROM documents, n,
       (VALUES {", ".join(f"({m}, {a})" for m, a in _LINK_RULES)}) AS r(m, a)
),
l AS (
  SELECT 'site' || CAST(src_h AS VARCHAR) || '.test' AS host,
         count(*) AS n_out_links,
         CAST(sum(CASE WHEN src_h <> dst_h THEN 1 ELSE 0 END) AS BIGINT) AS n_cross_links
  FROM raw GROUP BY 1
),
p AS (
  SELECT 'site' || CAST(doc_id % {_N_HOSTS} AS VARCHAR) || '.test' AS host,
         count(*) AS n_pages, CAST(sum(n_chars) AS BIGINT) AS sum_chars
  FROM documents GROUP BY 1
)
SELECT p.host, p.n_pages, p.sum_chars, l.n_out_links, l.n_cross_links
FROM p JOIN l USING (host)
"""


# --------------------------------------------------------------------------
# anchor-text aggregation (wave 7)
# --------------------------------------------------------------------------

_ANCHOR_RE = re.compile(rb'<a href="https://site\d+\.test/p/(\d{8})">([^<]*)</a>')


def _mult_part(ids: np.ndarray, num_parts: int) -> np.ndarray:
    """Multiplicative int64 hash -> partition id (dense ids would otherwise
    bucket on their low bits; same device as the detect/cluster kernels)."""
    h = (ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)
    return (h % np.uint64(num_parts)).astype(np.int64)


def anchor_text(sf_dir: str):
    """Inbound anchor-text aggregation — the classic web-corpus enrichment
    step (anchor text of links INTO a page describes the page). Per target
    page over non-self links: total inbound anchors, distinct anchor
    strings, lexicographically smallest anchor. One hash shuffle on
    dst_page; per-bucket lexsort + reduceat (no per-row Python)."""
    n_docs = _n_docs(sf_dir)
    pages = synth_linked_pages(sf_dir, n_docs)
    num_parts = 16

    def parse(batch: pa.Table) -> pa.Table:
        ids = batch.column("page_id").to_numpy(zero_copy_only=False)
        htmls = batch.column("html").to_pylist()
        dst, anc = [], []
        for did, html in zip(ids.tolist(), htmls):
            for m in _ANCHOR_RE.finditer(html or b""):
                t = int(m.group(1))
                if t != did:
                    dst.append(t)
                    anc.append(m.group(2).decode())
        d = np.asarray(dst, dtype=np.int64)
        return pa.table(
            {
                "dst_page": pa.array(d, type=pa.int64()),
                "anchor": pa.array(anc, type=pa.string()),
                "__part": pa.array(_mult_part(d, num_parts), type=pa.int64()),
            }
        )

    def agg(g: pa.Table) -> pa.Table:
        d = g.column("dst_page").to_numpy(zero_copy_only=False)
        a = np.asarray(g.column("anchor").to_pylist(), dtype=object)
        order = np.lexsort((a, d))
        d_s, a_s = d[order], a[order]
        new_dst = np.r_[True, d_s[1:] != d_s[:-1]]
        starts = np.flatnonzero(new_dst)
        counts = np.diff(np.r_[starts, len(d_s)])
        new_pair = np.r_[True, (d_s[1:] != d_s[:-1]) | (a_s[1:] != a_s[:-1])]
        uniq = np.add.reduceat(new_pair.astype(np.int64), starts)
        return pa.table(
            {
                "dst_page": pa.array(d_s[starts], type=pa.int64()),
                "n_anchors": pa.array(counts, type=pa.int64()),
                "n_unique_anchors": pa.array(uniq, type=pa.int64()),
                "top_anchor": pa.array(a_s[starts].tolist(), type=pa.string()),
            }
        )

    return (
        pages.map_batches(parse, batch_format="pyarrow", batch_size=1024)
        .groupby("__part")
        .map_groups(agg, batch_format="pyarrow")
    )


ANCHOR_TEXT_SQL = f"""
WITH {_EDGES_CTE},
anchors AS (
  SELECT dst_page,
         'a' || CAST((src_page * 3 + dst_page) % 101 AS VARCHAR) AS anchor
  FROM raw WHERE src_page <> dst_page
)
SELECT dst_page, count(*) AS n_anchors,
       CAST(count(DISTINCT anchor) AS BIGINT) AS n_unique_anchors,
       min(anchor) AS top_anchor
FROM anchors GROUP BY dst_page
"""


# --------------------------------------------------------------------------
# host-level link graph with reciprocity (wave 7)
# --------------------------------------------------------------------------


def host_graph(sf_dir: str):
    """Host-pair rollup of the distinct page-level edge list with the
    reciprocal count attached: (src_host, dst_host, n_edges, n_reverse).
    The reverse direction is attached WITHOUT a join — each host pair is
    emitted twice (forward carrying n_edges, swapped carrying n_reverse)
    and one grouped sum folds them; rows that only existed as reversals
    (n_edges = 0) are dropped at the end. Two shuffles total, both over
    pre-aggregated host pairs (O(hosts^2) rows, not O(edges))."""
    import pyarrow.compute as pc

    n_docs = _n_docs(sf_dir)
    raw = _extract_links(synth_linked_pages(sf_dir, n_docs))
    nonself = raw.map_batches(
        lambda t: t.filter(pc.not_equal(t["src_page"], t["dst_page"])),
        batch_format="pyarrow",
    )
    edges = distinct(
        nonself, ["src_page", "dst_page", "src_host", "dst_host"], num_parts=16
    )

    def both_directions(t: pa.Table) -> pa.Table:
        ones = np.ones(len(t), dtype=np.int64)
        zeros = np.zeros(len(t), dtype=np.int64)
        fwd = pa.table(
            {
                "src_host": t["src_host"],
                "dst_host": t["dst_host"],
                "ne": pa.array(ones, type=pa.int64()),
                "nr": pa.array(zeros, type=pa.int64()),
            }
        )
        rev = pa.table(
            {
                "src_host": t["dst_host"],
                "dst_host": t["src_host"],
                "ne": pa.array(zeros, type=pa.int64()),
                "nr": pa.array(ones, type=pa.int64()),
            }
        )
        return pa.concat_tables([fwd, rev])

    pairs = grouped_agg(
        edges.map_batches(both_directions, batch_format="pyarrow"),
        ["src_host", "dst_host"],
        {"n_edges": ("ne", "sum"), "n_reverse": ("nr", "sum")},
        num_parts=8,
    )
    return pairs.map_batches(
        lambda t: t.filter(pc.greater(t["n_edges"], 0)), batch_format="pyarrow"
    )


HOST_GRAPH_SQL = f"""
WITH {_EDGES_CTE},
hp AS (
  SELECT 'site' || CAST(src_page % {_N_HOSTS} AS VARCHAR) || '.test' AS src_host,
         'site' || CAST(dst_page % {_N_HOSTS} AS VARCHAR) || '.test' AS dst_host,
         count(*) AS n_edges
  FROM edges GROUP BY 1, 2
)
SELECT a.src_host, a.dst_host, a.n_edges,
       CAST(coalesce(b.n_edges, 0) AS BIGINT) AS n_reverse
FROM hp a LEFT JOIN hp b
  ON a.src_host = b.dst_host AND a.dst_host = b.src_host
"""


# --------------------------------------------------------------------------
# url canonicalization + variant dedup (wave 7)
# --------------------------------------------------------------------------


def canonicalize_urls(urls) -> pa.Array:
    """Vectorized URL canonicalization (pyarrow/RE2 kernels, no Python
    loop): strip #fragment, drop utm_* query params, lowercase
    scheme+host, upgrade http->https, strip trailing slashes and dangling
    ?/& junk. Non-URL strings pass through deterministically.

    The rule chain is IDEMPOTENT for arbitrary input (pinned by a
    hypothesis property test): the utm strip keeps its [?&] anchor (so a
    global RE2 pass removes every anchored occurrence and cannot splice a
    new one — the following char after a maximal [^&#]* run is &/#/end,
    never 'utm_'), separator runs left behind collapse in one pass, and
    the single trailing [/?&]+ rule leaves an end character outside its
    own class."""
    import pyarrow.compute as pc

    u = pc.replace_substring_regex(urls, r"#.*$", "")
    u = pc.replace_substring_regex(u, r"([?&])utm_[^&#]*", r"\1")
    u = pc.replace_substring_regex(u, r"([?&])&+", r"\1")
    parts = pc.extract_regex(
        u, r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.-]*)://(?P<host>[^/?#]*)(?P<rest>.*)$"
    )
    scheme = pc.utf8_lower(pc.struct_field(parts, "scheme"))
    scheme = pc.replace_substring_regex(scheme, r"^http$", "https")
    host = pc.utf8_lower(pc.struct_field(parts, "host"))
    rest = pc.replace_substring_regex(pc.struct_field(parts, "rest"), r"[/?&]+$", "")
    joined = pc.binary_join_element_wise(scheme, "://", host, rest, "")
    out = pc.if_else(pc.is_valid(scheme), joined, u)
    return out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out


def synth_url_variants(sf_dir: str):
    """Messy-URL table: doc_id gets 1 + doc_id % 3 raw variants of its
    canonical url (clean; HTTP + capitalized host + trailing slash;
    utm-tracking query + fragment) — the aliasing every crawl dedup
    has to resolve."""
    ds = _read_documents(sf_dir, ["doc_id"])

    def expand(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        raw = []
        for did in ids.tolist():
            h = did % _N_HOSTS
            base = f"site{h}.test/p/{did:08d}"
            raw.append(f"https://{base}")
            if did % 3 >= 1:
                raw.append(f"HTTP://Site{h}.test/p/{did:08d}/")
            if did % 3 >= 2:
                raw.append(
                    f"https://{base}?utm_source=s{did % 5}&utm_campaign=c{did % 7}"
                    f"#sec{did % 11}"
                )
        return pa.table({"raw_url": pa.array(raw, type=pa.string())})

    return ds.map_batches(expand, batch_format="pyarrow", batch_size=2048)


def url_dedup(sf_dir: str):
    """Canonicalize every raw URL variant, then count variants per
    canonical url — one vectorized map + one hash-partitioned grouped
    sum (fastagg partial/combine), no driver state."""
    vs = synth_url_variants(sf_dir)

    def canon(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": canonicalize_urls(t.column("raw_url")),
                "one": pa.array(np.ones(len(t), np.int64), type=pa.int64()),
            }
        )

    return grouped_agg(
        vs.map_batches(canon, batch_format="pyarrow"),
        ["url"],
        {"n_variants": ("one", "sum")},
        num_parts=16,
    )


URL_DEDUP_SQL = f"""
SELECT 'https://site' || CAST(doc_id % {_N_HOSTS} AS VARCHAR) || '.test/p/'
         || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS url,
       CAST(1 + doc_id % 3 AS BIGINT) AS n_variants
FROM documents
"""


# --------------------------------------------------------------------------
# connected components over a sparse link-graph slice (wave 7)
# --------------------------------------------------------------------------

_CC_MOD = 13  # keep edges with (src+dst) % 13 == 0: mean degree ~0.46,
# below the giant-component threshold, so components stay small and the
# recursive-CTE oracle's reach table stays bounded


def link_components(sf_dir: str):
    """Weakly-connected components over a sparse slice of the page link
    graph ((src+dst) % 13 == 0 edges — the sub-percolation regime where
    component structure is non-trivial), singletons mapped to themselves.
    Reuses the snap-clustering machinery: per-partition union-find +
    O(boundary) driver closure (stages/components.py), then one
    partitioned left join fills singletons. Nothing O(pages) on the
    driver."""
    import pyarrow.compute as pc

    from osmwaterwayextractor_ray.stages.components import connected_components
    from osmwaterwayextractor_ray.stages.fastagg import hash_join

    n_docs = _n_docs(sf_dir)
    edges = _edge_list(sf_dir, n_docs)

    def keep_sparse(t: pa.Table) -> pa.Table:
        s = t.column("src_page").to_numpy(zero_copy_only=False)
        d = t.column("dst_page").to_numpy(zero_copy_only=False)
        return t.filter(pa.array((s + d) % _CC_MOD == 0))

    sparse = edges.map_batches(keep_sparse, batch_format="pyarrow")
    assigns = connected_components(
        sparse, "src_page", "dst_page", out_node="doc_id", out_comp="component"
    )
    docs = _read_documents(sf_dir, ["doc_id"])
    joined = hash_join(docs, assigns, on=["doc_id"], how="left")

    def fill(batch: pa.Table) -> pa.Table:
        # unmatched pages are singletons: component = own id (miss marker
        # may be an Arrow null or a pandas-path NaN — same as dedup_clusters)
        d = pc.cast(batch.column("doc_id"), pa.int64())
        cf = pc.cast(batch.column("component"), pa.float64(), safe=False)
        miss = pc.or_kleene(pc.is_null(cf), pc.is_nan(cf))
        c = pc.cast(pc.if_else(miss, pc.cast(d, pa.float64()), cf), pa.int64())
        return pa.table({"page_id": d, "component": c})

    return joined.map_batches(fill, batch_format="pyarrow", batch_size=65536)


LINK_COMPONENTS_SQL = f"""
WITH RECURSIVE {_EDGES_CTE},
sp AS (
  SELECT src_page AS a, dst_page AS b FROM edges
  WHERE (src_page + dst_page) % {_CC_MOD} = 0
),
und AS (SELECT a, b FROM sp UNION ALL SELECT b, a FROM sp),
reach(d, l) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.a, r.l FROM reach r JOIN und e ON e.b = r.d
)
SELECT d AS page_id, CAST(MIN(l) AS BIGINT) AS component FROM reach GROUP BY d
"""


# --------------------------------------------------------------------------
# cross-snapshot diff (wave 7)
# --------------------------------------------------------------------------


def snapshot_diff(sf_dir: str):
    """Per-url diff of the two most recent captures: capture count, latest
    and previous text lengths, and a status ('new' single-capture url,
    'changed'/'unchanged' by content-length comparison). Same single
    url-hash shuffle as latest_snapshot; per-bucket lexsort kernel."""
    caps = synth_captures(sf_dir)
    num_parts = 16

    def tag(batch: pa.Table) -> pa.Table:
        part = np.array(
            [hash_url(u) % num_parts for u in batch.column("url").to_pylist()],
            dtype=np.int64,
        )
        return batch.append_column("__part", pa.array(part, type=pa.int64()))

    def diff(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        urls = np.asarray(g.column("url").to_pylist(), dtype=object)
        ts = g.column("warc_ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        tl = g.column("text_len").to_numpy(zero_copy_only=False)
        order = np.lexsort((ts, urls))
        u_s, l_s = urls[order], tl[order]
        starts = np.flatnonzero(np.r_[True, u_s[1:] != u_s[:-1]])
        ends = np.r_[starts[1:], len(u_s)] - 1
        n_caps = ends - starts + 1
        latest_len = l_s[ends]
        prev_len = np.where(n_caps > 1, l_s[np.maximum(ends - 1, 0)], 0)
        status = np.where(
            n_caps == 1,
            "new",
            np.where(latest_len != prev_len, "changed", "unchanged"),
        )
        return pa.table(
            {
                "url": pc.take(
                    g.column("url").combine_chunks(),
                    pa.array(order[ends], type=pa.int64()),
                ),
                "n_captures": pa.array(n_caps, type=pa.int64()),
                "latest_len": pa.array(latest_len, type=pa.int64()),
                "prev_len": pa.array(prev_len, type=pa.int64()),
                "status": pa.array(status.tolist(), type=pa.string()),
            }
        )

    return (
        caps.map_batches(tag, batch_format="pyarrow", batch_size=8192)
        .groupby("__part")
        .map_groups(diff, batch_format="pyarrow")
    )


SNAPSHOT_DIFF_SQL = f"""
WITH caps AS (
  SELECT 'https://site' || CAST(doc_id % {_N_HOSTS} AS VARCHAR) || '.test/p/'
           || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS url,
         TIMESTAMP '2024-01-01 00:00:00'
           + to_microseconds(doc_id * 1000000 + c.c * {_HOUR_US}) AS warc_ts,
         CAST(length(text || CASE WHEN c.c = 0 THEN '' ELSE ' rev' || CAST(c.c AS VARCHAR) END) AS BIGINT) AS text_len
  FROM documents, UNNEST([0, 1, 2]) AS c(c)
  WHERE c.c < 1 + doc_id % 3
),
x AS (
  SELECT url, text_len,
         row_number() OVER (PARTITION BY url ORDER BY warc_ts DESC) AS rn,
         count(*) OVER (PARTITION BY url) AS nc
  FROM caps
)
SELECT a.url, CAST(a.nc AS BIGINT) AS n_captures, a.text_len AS latest_len,
       CAST(coalesce(b.text_len, 0) AS BIGINT) AS prev_len,
       CASE WHEN a.nc = 1 THEN 'new'
            WHEN a.text_len <> b.text_len THEN 'changed'
            ELSE 'unchanged' END AS status
FROM x a LEFT JOIN x b ON a.url = b.url AND b.rn = 2
WHERE a.rn = 1
"""


# --------------------------------------------------------------------------
# host blocklist filtering (wave 9)
# --------------------------------------------------------------------------

# deterministic subdomain synthesis: (doc_id // 20) % 4 picks the
# subdomain tier — decorrelated from the site index (doc_id % 20), so all
# 4 x 20 host combinations occur
_BL_SUBS = ["", "cdn.", "ads.", "m."]
# ordered domain-suffix blocklist (RefinedWeb / UT1 style): an entry
# blocks the host itself AND every subdomain of it ('.'-suffix match);
# first matching entry in list order wins ('cdn.site7.test' is shadowed
# by 'site7.test' — kept to pin the precedence rule)
HOST_BLOCKLIST = [
    "ads.site3.test",
    "site7.test",
    "m.site1.test",
    "site13.test",
    "cdn.site7.test",
]


def host_blocklist(sf_dir: str):
    """Domain-suffix blocklist filter — the URL-curation screen every
    crawl corpus passes through (UT1 / RefinedWeb blocklists). A host is
    blocked iff it equals a blocklist entry or ends with '.' + entry
    (standard registrable-domain semantics: 'site7.test' blocks
    'cdn.site7.test' but NOT 'notsite7.test'). Returns the BLOCKED rows
    (doc_id, host, blocked_by), blocked_by = first matching entry.

    Host = {'', cdn., ads., m.}[(doc_id // 20) % 4] + site{doc_id % 20}.test.

    Shape: the blocklist is the tiny broadcast side (module constant
    here; ray.put at real scale); matching is k vectorized
    equal/ends_with passes per batch over the host column — one
    streaming map, zero shuffles, output bounded by the block rate."""
    ds = _read_documents(sf_dir, ["doc_id"])

    # only len(_BL_SUBS) x _N_HOSTS distinct hosts exist, so the whole
    # match (strings AND first-matching-entry index) precomputes into
    # 80-entry lookup tables indexed by host key — the per-batch hot
    # path is pure vectorized integer indexing, no string work
    host_strs = np.array(
        [f"{sub}site{k}.test" for sub in _BL_SUBS for k in range(_N_HOSTS)],
        dtype=object,
    )
    hit_by_key = np.full(len(host_strs), -1, dtype=np.int64)
    for j, h in enumerate(host_strs):
        for e_i, e in enumerate(HOST_BLOCKLIST):  # list order = precedence
            if h == e or h.endswith("." + e):
                hit_by_key[j] = e_i
                break
    bl_strs = np.array(HOST_BLOCKLIST, dtype=object)

    def screen(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        hk = ((ids // _N_HOSTS) % len(_BL_SUBS)) * _N_HOSTS + ids % _N_HOSTS
        hit = hit_by_key[hk]
        keep = hit >= 0
        return pa.table(
            {
                "doc_id": pa.array(ids[keep], type=pa.int64()),
                "host": pa.array(host_strs[hk[keep]].tolist(), type=pa.string()),
                "blocked_by": pa.array(
                    bl_strs[hit[keep]].tolist(), type=pa.string()
                ),
            }
        )

    return ds.map_batches(screen, batch_format="pyarrow", batch_size=65536)


_BL_VALUES = ", ".join(
    f"('{e}', {i})" for i, e in enumerate(HOST_BLOCKLIST)
)

HOST_BLOCKLIST_SQL = f"""
WITH d AS (
  SELECT doc_id,
         (CASE (doc_id // {_N_HOSTS}) % 4 WHEN 1 THEN 'cdn.' WHEN 2 THEN 'ads.'
               WHEN 3 THEN 'm.' ELSE '' END)
           || 'site' || CAST(doc_id % {_N_HOSTS} AS VARCHAR) || '.test' AS host
  FROM documents
),
b(entry, ord) AS (VALUES {_BL_VALUES})
SELECT doc_id, host, blocked_by FROM (
  SELECT d.doc_id, d.host, b.entry AS blocked_by,
         row_number() OVER (PARTITION BY d.doc_id ORDER BY b.ord) AS rn
  FROM d JOIN b ON d.host = b.entry OR ends_with(d.host, '.' || b.entry)
) WHERE rn = 1
"""


# --------------------------------------------------------------------------
# full web-curation chain (wave 9)
# --------------------------------------------------------------------------

_CWC_CAP = 15  # per-host keep cap (webtext._HQ_CAP's value, chain-local)


def curate_web_corpus(sf_dir: str):
    """The end-to-end CRAWL-side curation chain, in the order a real
    pipeline runs it:

      domain-suffix blocklist screen (host_blocklist semantics)
      -> temperature-based source mixing over the SURVIVORS
         (source_temperature_mix semantics — masses computed on the
         post-blocklist corpus, so a blocked heavy source no longer
         depresses its siblings' rates)
      -> per-host document quota over the mix survivors
         (host_quota semantics: top-_CWC_CAP per host by n_chars DESC,
         doc_id ASC).

    Returns (doc_id, host, source, n_chars, host_rank).

    Scale shape: the host is a pure function of doc_id, and only
    4 x _N_HOSTS host strings exist — the blocklist screen collapses to
    a precomputed 80-entry boolean lookup indexed by host key, so the
    whole blocklist+mix filter is ONE vectorized streaming pass (plus an
    O(sources) mass aggregate for the thresholds), and the quota is the
    per-block partial top-cap + ONE O(cap x hosts) shuffle. The corpus
    itself never shuffles and is read column-pruned twice (mass pass +
    filter pass)."""
    import pyarrow.compute as pc
    import ray

    from osmwaterwayextractor_ray.pipelines.webtext import (
        _STM_HASH_MULT,
        stm_thresholds,
        topcap_by_key,
    )
    from osmwaterwayextractor_ray.stages.fastagg import grouped_agg

    n_sub = len(_BL_SUBS)
    host_strs = [
        f"{sub}site{k}.test" for sub in _BL_SUBS for k in range(_N_HOSTS)
    ]  # host key = sub_tier * _N_HOSTS + site
    blocked = np.zeros(len(host_strs), dtype=bool)
    for j, h in enumerate(host_strs):
        for e in HOST_BLOCKLIST:
            if h == e or h.endswith("." + e):
                blocked[j] = True
                break

    ds = _read_documents(sf_dir, ["doc_id", "source", "n_chars"])

    def hostkey(ids: np.ndarray) -> np.ndarray:
        return ((ids // _N_HOSTS) % n_sub) * _N_HOSTS + ids % _N_HOSTS

    def mass_partial(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        t = batch.filter(pa.array(~blocked[hostkey(ids)]))
        tt = pa.table({"source": t.column("source"), "mass": t.column("n_chars")})
        return (
            tt.group_by("source", use_threads=False)
            .aggregate([("mass", "sum")])
            .rename_columns(["source", "mass"])
        )

    masses = grouped_agg(
        ds.map_batches(mass_partial, batch_format="pyarrow", batch_size=65536),
        ["source"],
        {"mass": ("mass", "sum")},
        num_parts=2,
    ).to_pandas()  # O(sources) rows
    srcs, thr_arr = stm_thresholds(masses["source"], masses["mass"])
    src_arr = pa.array(srcs, type=pa.string())
    ref = ray.put((src_arr, thr_arr))

    num_parts = 8

    def filter_and_cap(batch: pa.Table) -> pa.Table:
        src_a, thr_a = ray.get(ref)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        hk = hostkey(ids)
        si = (
            pc.index_in(batch.column("source"), value_set=src_a)
            .fill_null(-1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        # blocklist + tempered-mix keep decision in one vectorized pass;
        # a source absent from the mass table (possible only if ALL its
        # docs are blocked) has no survivors by construction
        keep = (~blocked[hk]) & (si >= 0) & (
            (ids * _STM_HASH_MULT) % 4294967296 < thr_a[np.maximum(si, 0)]
        )
        t = batch.filter(pa.array(keep))
        ids_k = ids[keep]
        nc_k = t.column("n_chars").to_numpy(zero_copy_only=False).astype(np.int64)
        idx, _ = topcap_by_key(ids_k, nc_k, hk[keep], _CWC_CAP)
        take = pa.array(idx, type=pa.int64())
        return pa.table(
            {
                "doc_id": pa.array(ids_k[idx], type=pa.int64()),
                "source": pc.take(t.column("source").combine_chunks(), take),
                "n_chars": pa.array(nc_k[idx], type=pa.int64()),
                "__part": pa.array(hk[keep][idx] % num_parts, type=pa.int64()),
            }
        )

    def final(g: pa.Table) -> pa.Table:
        ids = g.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        nc = g.column("n_chars").to_numpy(zero_copy_only=False).astype(np.int64)
        hk = hostkey(ids)
        idx, pos = topcap_by_key(ids, nc, hk, _CWC_CAP)
        take = pa.array(idx, type=pa.int64())
        return pa.table(
            {
                "doc_id": pa.array(ids[idx], type=pa.int64()),
                "host": pa.array(
                    [host_strs[j] for j in hk[idx].tolist()], type=pa.string()
                ),
                "source": pc.take(g.column("source").combine_chunks(), take),
                "n_chars": pa.array(nc[idx], type=pa.int64()),
                "host_rank": pa.array(pos + 1, type=pa.int64()),
            }
        )

    return (
        ds.map_batches(filter_and_cap, batch_format="pyarrow", batch_size=65536)
        .groupby("__part")
        .map_groups(final, batch_format="pyarrow")
    )


def _cwc_sql() -> str:
    from osmwaterwayextractor_ray.pipelines.webtext import _STM_HASH_MULT

    return f"""
WITH d AS (
  SELECT doc_id, source, n_chars,
         (CASE (doc_id // {_N_HOSTS}) % 4 WHEN 1 THEN 'cdn.' WHEN 2 THEN 'ads.'
               WHEN 3 THEN 'm.' ELSE '' END)
           || 'site' || CAST(doc_id % {_N_HOSTS} AS VARCHAR) || '.test' AS host
  FROM documents
),
b(entry, ord) AS (VALUES {_BL_VALUES}),
surv AS (
  SELECT d.* FROM d
  WHERE NOT EXISTS (
    SELECT 1 FROM b WHERE d.host = b.entry OR ends_with(d.host, '.' || b.entry)
  )
),
m AS (SELECT source, CAST(sum(n_chars) AS BIGINT) AS mass FROM surv GROUP BY source),
mn AS (SELECT min(mass) AS m_min FROM m),
t AS (
  SELECT source,
         CAST(floor(sqrt(CAST(m_min AS DOUBLE) / CAST(mass AS DOUBLE))
                    * 4294967296) AS BIGINT) AS thr
  FROM m, mn
),
mixed AS (
  SELECT s.* FROM surv s JOIN t USING (source)
  WHERE (s.doc_id * {_STM_HASH_MULT}) % 4294967296 < t.thr
)
SELECT doc_id, host, source, n_chars, host_rank FROM (
  SELECT doc_id, host, source, n_chars,
         row_number() OVER (PARTITION BY host
                            ORDER BY n_chars DESC, doc_id) AS host_rank
  FROM mixed
) WHERE host_rank <= {_CWC_CAP}
"""


CURATE_WEB_CORPUS_SQL = _cwc_sql()


# --------------------------------------------------------------------------
# shared helpers
# --------------------------------------------------------------------------


# --------------------------------------------------------------------------
# HITS hubs/authorities (wave 12)
# --------------------------------------------------------------------------

_HITS_SCALE = 10**6   # fixed-point grid; a_raw*SCALE must fit int64 — fine
                      # to ~1e6 pages x SCALE; the SQL twin shares the bound
_HITS_ITERS = 3


def hits_scores(sf_dir: str, iters: int = _HITS_ITERS):
    """HITS hubs/authorities (Kleinberg 1999) in int64 fixed point with
    max-normalization — the second classic iterative graph primitive
    next to pagerank, exercising the opposite join direction each half
    step. Per iteration over the same distinct edge list:

      a_raw(v) = Σ_{u→v} h(u);   a(v) = a_raw(v)·SCALE // max(a_raw)
      h_raw(u) = Σ_{u→v} a(v);   h(u) = h_raw(u)·SCALE // max(h_raw)

    Every step is integer addition / floor division on non-negatives, so
    the result is bit-identical under any block structure and the
    unrolled-CTE oracle agrees exactly. The per-iteration shape is the
    pagerank device: broadcast nothing, ONE skinny lookup_join + grouped
    sum per half step, O(1) driver scalars (the max), per-iteration
    re-pin (parquet spill at 100 TB via WWX_PIN_MODE). Returns
    (page_id, hub, auth)."""
    from ray.data.aggregate import Max

    n_docs = _n_docs(sf_dir)
    edges = pin(_edge_list(sf_dir, n_docs), "hits_edges")
    edge_schema = pa.schema([("src_page", pa.int64()), ("dst_page", pa.int64())])

    pages = _read_documents(sf_dir, ["doc_id"]).map_batches(
        lambda t: t.rename_columns(["page_id"]), batch_format="pyarrow"
    )
    pages_schema = pa.schema([("page_id", pa.int64())])

    # Intermediate scores stay RAW (pinned grouped sums + a driver max
    # scalar): normalization applies per-score BEFORE the next summation,
    # so the next half step folds (v·SCALE)//m into its share map —
    # bit-identical to materializing normalized tables, but each half
    # step is ONE lookup_join + ONE grouped_agg + ONE pin (no zero-fill
    # cogroup, no extra normalize pass; pages missing from the sums
    # would contribute 0 anyway). Zero-fill happens once per side at the
    # END so the output covers every page. The very first half step
    # skips the join entirely: h0 is the constant SCALE per page, so the
    # first authority sums are SCALE·in_degree.
    raw_schema = pa.schema([("page_id", pa.int64()), ("v", pa.int64())])

    def _sums(scores, m, join_key, group_key, it):
        """grouped sums of normalized scores over edges (scores=None ->
        the constant-SCALE initial hubs)."""
        if scores is None:
            contrib = edges.map_batches(
                lambda t: pa.table(
                    {
                        "page_id": t[group_key],
                        "c": pa.array(
                            np.full(len(t), _HITS_SCALE, np.int64), type=pa.int64()
                        ),
                    }
                ),
                batch_format="pyarrow",
            )
        else:
            joined = lookup_join(
                edges, scores, join_key, "page_id", {"v": "s"},
                num_parts=16, left_schema=edge_schema, right_schema=raw_schema,
            )

            def share(t: pa.Table) -> pa.Table:
                p = t.column("s").to_numpy(zero_copy_only=False)
                return pa.table(
                    {
                        "page_id": t[group_key],
                        "c": pa.array((p * _HITS_SCALE) // m, type=pa.int64()),
                    }
                )

            contrib = joined.map_batches(share, batch_format="pyarrow")
        pinned = pin(
            grouped_agg(contrib, ["page_id"], {"v": ("c", "sum")}, num_parts=16),
            f"hits_{group_key}_{it}",
        )
        # aggregate() returns None on an empty dataset (zero-link corpus:
        # the grouped sums are empty) — all scores are then 0, max -> 1
        agg = pinned.aggregate(Max("v", alias_name="m"))
        mx = max(int(agg["m"]), 1) if agg and agg.get("m") is not None else 1
        return pinned, mx

    h, m_h = None, _HITS_SCALE
    a, m_a = None, 1
    for it in range(iters):
        # authorities from hubs (sum over IN-edges), then hubs from
        # authorities (sum over OUT-edges)
        a, m_a = _sums(h, m_h, "src_page", "dst_page", it)
        h, m_h = _sums(a, m_a, "dst_page", "src_page", it)

    def _final(sums, m, out_name):
        filled = _attach_zero_fill(
            pages, sums, key="page_id", value_cols=["v"],
            left_schema=pages_schema, right_schema=raw_schema,
        )

        def norm(t: pa.Table) -> pa.Table:
            v = t.column("v").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "page_id": t["page_id"],
                    out_name: pa.array((v * _HITS_SCALE) // m, type=pa.int64()),
                }
            )

        return filled.map_batches(norm, batch_format="pyarrow")

    h_final = _final(h, m_h, "hub")
    a_final = _final(a, m_a, "auth")
    out_h_schema = pa.schema([("page_id", pa.int64()), ("hub", pa.int64())])
    out_a_schema = pa.schema([("page_id", pa.int64()), ("auth", pa.int64())])
    return lookup_join(
        h_final, a_final, "page_id", "page_id", {"auth": "auth"},
        num_parts=16, left_schema=out_h_schema, right_schema=out_a_schema,
    )


def _und_edges(sf_dir: str, pin_name: str, n_docs: int | None = None):
    """Distinct UNDIRECTED (a, b) edge rows (both directions present),
    pinned — the base table of the undirected-graph operators."""
    edges = _edge_list(sf_dir, _n_docs(sf_dir) if n_docs is None else n_docs)

    def both_dirs(t: pa.Table) -> pa.Table:
        s = t.column("src_page").to_numpy(zero_copy_only=False)
        d = t.column("dst_page").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "a": pa.array(np.concatenate([s, d]), type=pa.int64()),
                "b": pa.array(np.concatenate([d, s]), type=pa.int64()),
            }
        )

    return pin(
        distinct(
            edges.map_batches(both_dirs, batch_format="pyarrow"),
            ["a", "b"],
            num_parts=16,
        ),
        pin_name,
    )


_LPA_ITERS = 4


def label_prop_communities(sf_dir: str, iters: int = _LPA_ITERS, und=None):
    """Synchronous label propagation (Raghavan et al. 2007) over the
    UNDIRECTED link graph — the classic community-detection primitive
    next to pagerank/HITS, exercising a grouped ARGMAX per iteration
    instead of a grouped sum:

      lab_0(v)     = v
      lab_{t+1}(v) = the label l maximizing |{u ~ v : lab_t(u) = l}|,
                     ties broken by smallest l; isolated v keeps lab_t(v).

    Counts are exact ints and the (count desc, label asc) tie-break is a
    total order, so the fixed-T result is bit-identical under any block
    structure and the unrolled-CTE oracle agrees exactly.

    Shape per iteration (the pagerank device, argmax flavor): one
    zero-fill attach of the previous labels onto the undirected edge
    list, one pair_counts shuffle for the (v, label) counts, one
    coarse-bucket top-1 shuffle — all O(E) hash-partitioned rows,
    per-iteration re-pin (parquet spill at 100 TB via WWX_PIN_MODE).
    The per-iteration label table covers every NON-ISOLATED node
    (changed or not); the zero-fill's lab=u fallback fires only for
    isolated nodes, and only in the final page attach — edge endpoints
    are never isolated. The driver sees O(1).
    Returns (page_id, community)."""
    from osmwaterwayextractor_ray.stages.fastagg import _bucket_tbl, pair_counts

    if und is None:  # callers holding a pinned und pass it to avoid a rebuild
        und = _und_edges(sf_dir, "lpa_und")
    und_schema = pa.schema([("a", pa.int64()), ("b", pa.int64())])
    # labels ride +1 so the zero-fill's 0 means "absent -> label = own id"
    best_schema = pa.schema([("b", pa.int64()), ("labp", pa.int64())])

    def _top1(counts):
        """per-v argmax by (count desc, label asc) — coarse hash buckets,
        one lexsort + run-first per bucket (no per-group Python)."""

        def tag(batch: pa.Table) -> pa.Table:
            part = _bucket_tbl(batch, ["v"], 16)
            return batch.append_column("__part", pa.array(part, type=pa.int64()))

        def kernel(g: pa.Table) -> pa.Table:
            v = g.column("v").to_numpy(zero_copy_only=False)
            lab = g.column("lab").to_numpy(zero_copy_only=False)
            c = g.column("c").to_numpy(zero_copy_only=False)
            order = np.lexsort((lab, -c, v))
            v, lab = v[order], lab[order]
            first = np.ones(len(v), dtype=bool)
            first[1:] = v[1:] != v[:-1]
            return pa.table(
                {
                    "b": pa.array(v[first], type=pa.int64()),
                    "labp": pa.array(lab[first] + 1, type=pa.int64()),
                }
            )

        return (
            counts.map_batches(tag, batch_format="pyarrow")
            .groupby("__part")
            .map_groups(kernel, batch_format="pyarrow")
        )

    best = None
    for it in range(iters):
        if best is None:
            # lab_0(u) = u: the neighbor's label IS the neighbor id
            contrib = und.map_batches(
                lambda t: pa.table({"v": t["a"], "lab": t["b"]}),
                batch_format="pyarrow",
            )
        else:
            attached = _attach_zero_fill(
                und, best, key="b", value_cols=["labp"],
                left_schema=und_schema, right_schema=best_schema,
                extra_cols=["a"],
            )

            def relabel(t: pa.Table) -> pa.Table:
                b = t.column("b").to_numpy(zero_copy_only=False)
                labp = t.column("labp").to_numpy(zero_copy_only=False)
                lab = np.where(labp > 0, labp - 1, b)
                return pa.table(
                    {"v": t["a"], "lab": pa.array(lab, type=pa.int64())}
                )

            contrib = attached.map_batches(relabel, batch_format="pyarrow")
        counts = pair_counts(contrib, "v", "lab", "c", num_parts=16)
        best = pin(_top1(counts), f"lpa_best{it + 1}")

    pages = _read_documents(sf_dir, ["doc_id"]).map_batches(
        lambda t: t.rename_columns(["page_id"]), batch_format="pyarrow"
    )
    filled = _attach_zero_fill(
        pages,
        best.map_batches(
            lambda t: t.rename_columns(["page_id", "labp"]), batch_format="pyarrow"
        ),
        key="page_id", value_cols=["labp"],
        left_schema=pa.schema([("page_id", pa.int64())]),
        right_schema=pa.schema([("page_id", pa.int64()), ("labp", pa.int64())]),
    ) if iters else None
    if filled is None:
        return pages.map_batches(
            lambda t: pa.table({"page_id": t["page_id"], "community": t["page_id"]}),
            batch_format="pyarrow",
        )

    def finish(t: pa.Table) -> pa.Table:
        p = t.column("page_id").to_numpy(zero_copy_only=False)
        labp = t.column("labp").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "page_id": t["page_id"],
                "community": pa.array(
                    np.where(labp > 0, labp - 1, p), type=pa.int64()
                ),
            }
        )

    return filled.map_batches(finish, batch_format="pyarrow")


def _lpa_sql(iters: int = _LPA_ITERS) -> str:
    parts = [
        f"WITH {_EDGES_CTE}",
        "und AS (SELECT DISTINCT a, b FROM (SELECT src_page AS a, dst_page AS b"
        " FROM edges UNION ALL SELECT dst_page, src_page FROM edges))",
        "l0 AS (SELECT doc_id AS page_id, doc_id AS lab FROM documents)",
    ]
    for t in range(iters):
        parts.append(
            f"cnt{t} AS (SELECT e.a AS page_id, l.lab, count(*) AS c"
            f" FROM und e JOIN l{t} l ON l.page_id = e.b GROUP BY 1, 2)"
        )
        parts.append(
            f"best{t} AS (SELECT page_id, lab FROM (SELECT page_id, lab,"
            f" row_number() OVER (PARTITION BY page_id ORDER BY c DESC, lab ASC)"
            f" AS rn FROM cnt{t}) WHERE rn = 1)"
        )
        parts.append(
            f"l{t + 1} AS (SELECT l.page_id, COALESCE(b.lab, l.lab) AS lab"
            f" FROM l{t} l LEFT JOIN best{t} b USING (page_id))"
        )
    return (
        ",\n".join(parts)
        + f"\nSELECT page_id, lab AS community FROM l{iters}"
    )


LPA_SQL = _lpa_sql()


AA_Q = 10**6  # Adamic-Adar weight quantization: floor(Q / ln(deg))


def adamic_adar(sf_dir: str):
    """Adamic-Adar link prediction (Adamic & Adar 2003) over the
    undirected link graph: for every NON-adjacent pair (x, y) with at
    least one common neighbor,

      aa(x, y) = Σ_{z ~ x, z ~ y} 1 / ln(deg(z))

    quantized per center as w(z) = floor(AA_Q / ln(deg(z))) so the score
    is an exact int64 sum (ln via libm in both numpy and DuckDB — the
    shared-expression device; a common neighbor always has deg >= 2, so
    ln > 0). Returns (id_a, id_b, n_common, aa_q).

    Shape: the wedge join — per-center neighbor pairs from
    ``fastagg.bucketed_pair_products`` in const-weight mode (one row per
    common neighbor per pair, no neighbor lists shipped), ONE pair_sums
    shuffle producing sum AND count together, then an anti_join against
    the packed existing-edge keys. All hash-partitioned O(wedges) rows;
    quadratic in a hub's degree like every wedge enumeration — the
    triangle-counting contract. Pair keys pack as x * n_docs + y
    (documented int64 bound: n_docs < 3e9)."""
    from osmwaterwayextractor_ray.stages.fastagg import (
        anti_join,
        bucketed_pair_products,
        pair_sums,
    )

    n_docs = _n_docs(sf_dir)
    und = _und_edges(sf_dir, "aa_und", n_docs=n_docs)
    und_schema = pa.schema([("a", pa.int64()), ("b", pa.int64())])

    deg = grouped_agg(und, ["a"], {"deg": ("b", "count")}, num_parts=16)

    def to_w(t: pa.Table) -> pa.Table:
        z = t.column("a").to_numpy(zero_copy_only=False)
        d = t.column("deg").to_numpy(zero_copy_only=False)
        keep = d >= 2
        z, d = z[keep], d[keep]
        # expression shape shared with the SQL oracle — do not reorder
        w = np.floor(AA_Q / np.log(d.astype(np.float64))).astype(np.int64)
        return pa.table(
            {"z": pa.array(z, type=pa.int64()), "w": pa.array(w, type=pa.int64())}
        )

    wz = deg.map_batches(to_w, batch_format="pyarrow")
    wz_schema = pa.schema([("z", pa.int64()), ("w", pa.int64())])

    postings = lookup_join(
        und, wz, "a", "z", {"w": "w"},
        num_parts=16, left_schema=und_schema, right_schema=wz_schema,
    )

    wedges = bucketed_pair_products(
        postings, ["a"], "b", "w", "id_a", "id_b", "w",
        num_parts=32, weight_mode="const",
    )
    aa = pair_sums(wedges, "id_a", "id_b", "w", sum_col="aa_q", count_col="n_common")

    def pack(t: pa.Table, x: str, y: str) -> pa.Table:
        a = t.column(x).to_numpy(zero_copy_only=False)
        b = t.column(y).to_numpy(zero_copy_only=False)
        return t.append_column("key", pa.array(a * n_docs + b, type=pa.int64()))

    aa_keyed = aa.map_batches(lambda t: pack(t, "id_a", "id_b"), batch_format="pyarrow")
    edge_keys = und.map_batches(
        lambda t: pack(t, "a", "b").select(["key"]), batch_format="pyarrow"
    )
    out = anti_join(
        aa_keyed, edge_keys, "key", "key",
        num_parts=16,
        left_schema=pa.schema(
            [("id_a", pa.int64()), ("id_b", pa.int64()),
             ("aa_q", pa.int64()), ("n_common", pa.int64()), ("key", pa.int64())]
        ),
        right_schema=pa.schema([("key", pa.int64())]),
    )
    return out.map_batches(
        lambda t: t.select(["id_a", "id_b", "n_common", "aa_q"]),
        batch_format="pyarrow",
    )


ADAMIC_ADAR_SQL = f"""
WITH {_EDGES_CTE},
und AS (SELECT DISTINCT a, b FROM (SELECT src_page AS a, dst_page AS b
        FROM edges UNION ALL SELECT dst_page, src_page FROM edges)),
deg AS (SELECT a AS z, count(*) AS deg FROM und GROUP BY 1),
wz AS (
  SELECT z, CAST(floor({AA_Q} / ln(CAST(deg AS DOUBLE))) AS BIGINT) AS w
  FROM deg WHERE deg >= 2
),
wedge AS (
  SELECT e1.b AS id_a, e2.b AS id_b, w.w
  FROM und e1
  JOIN und e2 ON e1.a = e2.a AND e1.b < e2.b
  JOIN wz w ON w.z = e1.a
),
aa AS (
  SELECT id_a, id_b, CAST(count(*) AS BIGINT) AS n_common,
         CAST(sum(w) AS BIGINT) AS aa_q
  FROM wedge GROUP BY 1, 2
)
SELECT id_a, id_b, n_common, aa_q FROM aa
WHERE NOT EXISTS (SELECT 1 FROM und u WHERE u.a = aa.id_a AND u.b = aa.id_b)
"""


def _hits_sql(iters: int = _HITS_ITERS) -> str:
    S = _HITS_SCALE
    parts = [
        f"WITH {_EDGES_CTE}",
        f"h0 AS (SELECT doc_id AS page_id, CAST({S} AS BIGINT) AS h FROM documents)",
    ]
    for t in range(iters):
        parts.append(
            f"ar{t} AS (SELECT e.dst_page AS page_id, CAST(sum(h.h) AS BIGINT) AS v"
            f" FROM edges e JOIN h{t} h ON h.page_id = e.src_page GROUP BY 1)"
        )
        parts.append(
            f"a{t + 1} AS (SELECT d.doc_id AS page_id,"
            f" (COALESCE(r.v, 0) * {S}) // greatest(m.m, 1) AS a"
            f" FROM documents d CROSS JOIN (SELECT max(v) AS m FROM ar{t}) m"
            f" LEFT JOIN ar{t} r ON r.page_id = d.doc_id)"
        )
        parts.append(
            f"hr{t} AS (SELECT e.src_page AS page_id, CAST(sum(a.a) AS BIGINT) AS v"
            f" FROM edges e JOIN a{t + 1} a ON a.page_id = e.dst_page GROUP BY 1)"
        )
        parts.append(
            f"h{t + 1} AS (SELECT d.doc_id AS page_id,"
            f" (COALESCE(r.v, 0) * {S}) // greatest(m.m, 1) AS h"
            f" FROM documents d CROSS JOIN (SELECT max(v) AS m FROM hr{t}) m"
            f" LEFT JOIN hr{t} r ON r.page_id = d.doc_id)"
        )
    return (
        ",\n".join(parts)
        + f"\nSELECT h.page_id, h.h AS hub, a.a AS auth"
        f" FROM h{iters} h JOIN a{iters} a USING (page_id)"
    )


HITS_SQL = _hits_sql()


_KCORE_K = 3
_KCORE_ITERS = 8


def k_core(sf_dir: str, k: int = _KCORE_K, iters: int = _KCORE_ITERS):
    """k-core decomposition membership (Seidman 1983) by iterative
    peeling over the UNDIRECTED link graph: repeatedly drop every node
    whose (current) degree is < k, for at most ``iters`` rounds; return
    the surviving nodes with their within-core degree (page_id, deg).

    Exactly ``iters`` peel rounds (fixed T, the pagerank/LPA device) so
    the unrolled-CTE oracle agrees; the engine early-exits when the
    active-node COUNT stops shrinking, which is sound because the active
    set shrinks monotonically (act_{t+1} ⊆ nodes(e_t) ⊆ act_t — equal
    counts therefore mean equal sets, and every later round is the
    identity). All-integer, so bit-identical under any block structure.

    Shape per round (100 TB bar): one partial-aggregated grouped count
    over the surviving edges, a filter, and two partitioned hash
    SEMI-joins (the active table is unique-keyed, so inner join == semi
    join) to drop edges with a dead endpoint — all O(E) hash-partitioned
    rows, never a broadcast of the O(nodes) active set; surviving edges
    re-pinned per round (parquet spill at scale via WWX_PIN_MODE). The
    driver sees only the O(1) per-round count used for the early exit."""
    from osmwaterwayextractor_ray.stages.fastagg import grouped_agg, hash_join

    e_schema = pa.schema([("a", pa.int64()), ("b", pa.int64())])
    act_schema = pa.schema([("a", pa.int64())])
    actb_schema = pa.schema([("b", pa.int64())])

    edges = _und_edges(sf_dir, "kcore_und")
    n_prev = None
    for t in range(iters):
        deg = grouped_agg(edges, ["a"], {"deg": ("a", "count")}, num_parts=16)

        def keep(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return batch.filter(pc.greater_equal(batch["deg"], k)).select(["a"])

        act = pin(deg.map_batches(keep, batch_format="pyarrow"), f"kcore_act{t + 1}")
        n_act = act.count()
        if n_prev is not None and n_act == n_prev:
            break  # converged: every later round is the identity
        n_prev = n_act
        if n_act == 0:
            # empty core: return a TYPED empty table (a zero-block lazy
            # dataset would lose the schema the oracle compare needs)
            import ray.data as _rd

            return _rd.from_arrow(
                pa.table(
                    {
                        "page_id": pa.array([], type=pa.int64()),
                        "deg": pa.array([], type=pa.int64()),
                    }
                )
            )
        e1 = hash_join(
            edges, act, on=["a"], num_parts=16,
            left_schema=e_schema, right_schema=act_schema,
        )
        act_b = act.map_batches(
            lambda t: t.rename_columns(["b"]), batch_format="pyarrow"
        )
        edges = pin(
            hash_join(
                e1, act_b, on=["b"], num_parts=16,
                left_schema=e_schema, right_schema=actb_schema,
            ).map_batches(lambda t: t.select(["a", "b"]), batch_format="pyarrow"),
            f"kcore_e{t + 1}",
        )

    out = grouped_agg(edges, ["a"], {"deg": ("a", "count")}, num_parts=16)
    return out.map_batches(
        lambda t: t.rename_columns(["page_id", "deg"]), batch_format="pyarrow"
    )


def _kcore_sql(k: int = _KCORE_K, iters: int = _KCORE_ITERS) -> str:
    parts = [
        f"WITH {_EDGES_CTE}",
        "und AS (SELECT DISTINCT a, b FROM (SELECT src_page AS a, dst_page AS b"
        " FROM edges UNION ALL SELECT dst_page, src_page FROM edges))",
        "e0 AS (SELECT a, b FROM und)",
    ]
    # AS MATERIALIZED is load-bearing: DuckDB inlines plain CTEs, and each
    # round references the previous one three times -> 3^iters expansions
    # of the base scan (fd exhaustion before it's even slow)
    for t in range(iters):
        parts.append(
            f"deg{t} AS MATERIALIZED (SELECT a, CAST(count(*) AS BIGINT) AS deg"
            f" FROM e{t} GROUP BY 1)"
        )
        parts.append(f"act{t + 1} AS (SELECT a FROM deg{t} WHERE deg >= {k})")
        parts.append(
            f"e{t + 1} AS MATERIALIZED (SELECT e.a, e.b FROM e{t} e"
            f" JOIN act{t + 1} x ON x.a = e.a JOIN act{t + 1} y ON y.a = e.b)"
        )
    return (
        ",\n".join(parts)
        + f"\nSELECT a AS page_id, CAST(count(*) AS BIGINT) AS deg"
        f" FROM e{iters} GROUP BY 1"
    )


K_CORE_SQL = _kcore_sql()


LCC_Q = 10**6  # local-clustering-coefficient quantization grid


def clustering_coeff(sf_dir: str):
    """Per-node local clustering coefficient (Watts & Strogatz 1998) over
    the undirected link graph: lcc(v) = 2·T(v) / (deg(v)·(deg(v)−1)),
    where T(v) counts triangles through v. Reported on the exact integer
    grid lcc_q = (2·T·LCC_Q) // (deg·(deg−1)) so engine and SQL agree
    bit-for-bit. Returns (page_id, deg, tri, lcc_q) for every node with
    at least one edge.

    Per-node triangle counts come from the wedge-closure identity: the
    neighbor pairs x<z of center v (``bucketed_pair_products`` in
    group-const mode, the pair primitive — each wedge row carries its
    center) close iff (x, z) is an edge — one partitioned co-group
    against the canonical a<b edge list with a packed-key np.isin kernel
    that emits PER-BUCKET partial counts per center, combined by one
    small grouped sum. No all-pairs: work is O(Σ deg²) wedge rows, the
    standard triangle-count bound, hash-partitioned end to end.
    int64 bound: 2·T·LCC_Q needs T < 4.6e12 — any real per-node count."""
    import pyarrow.compute as pc

    from osmwaterwayextractor_ray.stages.fastagg import (
        bucketed_pair_products,
        cogroup,
        grouped_agg,
    )

    und = _und_edges(sf_dir, "lcc_und")

    # wedges: all neighbor pairs x<z per center v, carrying v (group-const)
    wedges = bucketed_pair_products(
        und, ["a"], "b", "a", "x", "z", "v", num_parts=16, weight_mode="const"
    )
    canon = und.map_batches(
        lambda t: t.filter(pc.less(t["a"], t["b"])), batch_format="pyarrow"
    )
    wedge_schema = pa.schema([("x", pa.int64()), ("z", pa.int64()), ("v", pa.int64())])
    canon_schema = pa.schema([("a", pa.int64()), ("b", pa.int64())])
    grouped, split = cogroup(
        wedges, canon, ["x", "z"], right_on=["a", "b"], num_parts=16,
        left_schema=wedge_schema, right_schema=canon_schema,
    )

    def close_per_center(g: pa.Table) -> pa.Table:
        from osmwaterwayextractor_ray.stages.fastagg import pack_ids32

        lg, rg = split(g)
        wx = lg.column("x").to_numpy(zero_copy_only=False)
        wz = lg.column("z").to_numpy(zero_copy_only=False)
        wv = lg.column("v").to_numpy(zero_copy_only=False)
        ea = rg.column("a").to_numpy(zero_copy_only=False)
        eb = rg.column("b").to_numpy(zero_copy_only=False)
        closed = np.isin(pack_ids32(wx, wz), pack_ids32(ea, eb))
        centers, counts = np.unique(wv[closed], return_counts=True)
        return pa.table(
            {
                "page_id": pa.array(centers, type=pa.int64()),
                "tri_p": pa.array(counts, type=pa.int64()),
            }
        )

    tri = grouped_agg(
        grouped.map_groups(close_per_center, batch_format="pyarrow"),
        ["page_id"], {"tri": ("tri_p", "sum")}, num_parts=16,
    )
    deg = grouped_agg(und, ["a"], {"deg": ("a", "count")}, num_parts=16).map_batches(
        lambda t: t.rename_columns(["page_id", "deg"]), batch_format="pyarrow"
    )
    filled = _attach_zero_fill(
        deg, tri, key="page_id", value_cols=["tri"],
        left_schema=pa.schema([("page_id", pa.int64()), ("deg", pa.int64())]),
        right_schema=pa.schema([("page_id", pa.int64()), ("tri", pa.int64())]),
        extra_cols=["deg"],
    )

    def finish(t: pa.Table) -> pa.Table:
        d = t.column("deg").to_numpy(zero_copy_only=False)
        tr = t.column("tri").to_numpy(zero_copy_only=False)
        denom = d * (d - 1)
        lcc = np.where(d >= 2, (2 * tr * LCC_Q) // np.maximum(denom, 1), 0)
        return pa.table(
            {
                "page_id": t["page_id"],
                "deg": t["deg"],
                "tri": t["tri"],
                "lcc_q": pa.array(lcc, type=pa.int64()),
            }
        )

    return filled.map_batches(finish, batch_format="pyarrow")


CLUSTERING_COEFF_SQL = f"""
WITH {_EDGES_CTE},
und AS (SELECT DISTINCT a, b FROM (SELECT src_page AS a, dst_page AS b
        FROM edges UNION ALL SELECT dst_page, src_page FROM edges)),
canon AS (SELECT a, b FROM und WHERE a < b),
deg AS (SELECT a AS page_id, CAST(count(*) AS BIGINT) AS deg FROM und GROUP BY 1),
wedges AS (
  SELECT u1.a AS v, u1.b AS x, u2.b AS z
  FROM und u1 JOIN und u2 ON u2.a = u1.a AND u2.b > u1.b
),
tri AS (
  SELECT w.v AS page_id, CAST(count(*) AS BIGINT) AS tri
  FROM wedges w JOIN canon e ON e.a = w.x AND e.b = w.z
  GROUP BY 1
)
SELECT d.page_id, d.deg, COALESCE(t.tri, CAST(0 AS BIGINT)) AS tri,
       CASE WHEN d.deg >= 2
            THEN (2 * COALESCE(t.tri, 0) * {LCC_Q}) // (d.deg * (d.deg - 1))
            ELSE CAST(0 AS BIGINT) END AS lcc_q
FROM deg d LEFT JOIN tri t USING (page_id)
"""


_CRAWL_SEED_MOD = 17
_CRAWL_MAX_DEPTH = 4


def crawl_depth(sf_dir: str, max_depth: int = _CRAWL_MAX_DEPTH,
                seed_mod: int = _CRAWL_SEED_MOD):
    """Multi-source BFS hop distance over the DIRECTED link graph — the
    crawl-frontier primitive (how many hops from the seed list does the
    crawler need to reach each page). Seeds are doc_id % seed_mod == 0;
    returns (page_id, depth) for every page reached within ``max_depth``
    hops, depth = the minimum hop count.

    Shape per level (100 TB bar): one partitioned hash semi-join
    (edges ⋈ frontier on src), one distinct on the reached targets, one
    anti-join against the visited set — all O(E)/O(V) hash-partitioned
    rows, frontier and visited re-pinned per level (parquet spill at
    scale via WWX_PIN_MODE); the driver sees only the O(1) per-level
    frontier count used for the early exit. Frontier expansion with a
    min-combine is exactly the iterative-semi-join primitive the
    pagerank/LPA family doesn't cover. Fixed max_depth, so the unrolled
    MATERIALIZED-CTE oracle agrees exactly; an empty frontier makes all
    later levels identity, so the early break is sound."""
    from osmwaterwayextractor_ray.stages.fastagg import cogroup, hash_join

    edges = pin(_edge_list(sf_dir, _n_docs(sf_dir)), "crawl_edges")
    e_schema = pa.schema([("src_page", pa.int64()), ("dst_page", pa.int64())])
    key_schema = pa.schema([("page_id", pa.int64())])

    def pick_seeds(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {"page_id": pa.array(ids[ids % seed_mod == 0], type=pa.int64())}
        )

    seeds = pin(
        _read_documents(sf_dir, ["doc_id"]).map_batches(
            pick_seeds, batch_format="pyarrow"
        ),
        "crawl_seeds",
    )

    def with_depth(keys, d: int):
        return keys.map_batches(
            lambda t: pa.table(
                {
                    "page_id": t["page_id"],
                    "depth": pa.array(
                        np.full(t.num_rows, d, dtype=np.int64), type=pa.int64()
                    ),
                }
            ),
            batch_format="pyarrow",
        )

    levels = [with_depth(seeds, 0)]
    visited = [seeds]  # list of pinned key tables; union = the visited set
    frontier = seeds
    for t in range(1, max_depth + 1):
        fr_src = frontier.map_batches(
            lambda t: t.rename_columns(["src_page"]), batch_format="pyarrow"
        )
        reached = hash_join(
            edges, fr_src, on=["src_page"], num_parts=16,
            left_schema=e_schema,
            right_schema=pa.schema([("src_page", pa.int64())]),
        ).map_batches(
            lambda t: pa.table({"page_id": t["dst_page"]}),
            batch_format="pyarrow",
        )
        seen = visited[0] if len(visited) == 1 else visited[0].union(*visited[1:])
        # fused distinct + anti-join: both hash-partition on page_id, so
        # one cogroup resolves them (unique left keys minus right keys)
        grouped, split = cogroup(
            reached, seen, ["page_id"], num_parts=16,
            left_schema=key_schema, right_schema=key_schema,
        )

        def minus(g: pa.Table) -> pa.Table:
            lg, rg = split(g)
            lk = np.unique(lg.column("page_id").to_numpy(zero_copy_only=False))
            rk = rg.column("page_id").to_numpy(zero_copy_only=False)
            return pa.table(
                {"page_id": pa.array(lk[~np.isin(lk, rk)], type=pa.int64())}
            )

        new = pin(
            grouped.map_groups(minus, batch_format="pyarrow"), f"crawl_f{t}"
        )
        if new.count() == 0:
            break
        levels.append(with_depth(new, t))
        visited.append(new)
        frontier = new

    out = levels[0] if len(levels) == 1 else levels[0].union(*levels[1:])
    return out


def _crawl_depth_sql(max_depth: int = _CRAWL_MAX_DEPTH,
                     seed_mod: int = _CRAWL_SEED_MOD) -> str:
    parts = [
        f"WITH {_EDGES_CTE}",
        f"v0 AS MATERIALIZED (SELECT doc_id AS page_id,"
        f" CAST(0 AS BIGINT) AS depth FROM documents"
        f" WHERE doc_id % {seed_mod} = 0)",
        "f0 AS (SELECT page_id FROM v0)",
    ]
    for t in range(1, max_depth + 1):
        parts.append(
            f"f{t} AS MATERIALIZED (SELECT DISTINCT e.dst_page AS page_id"
            f" FROM edges e JOIN f{t - 1} f ON f.page_id = e.src_page"
            f" WHERE NOT EXISTS (SELECT 1 FROM v{t - 1} v"
            f" WHERE v.page_id = e.dst_page))"
        )
        parts.append(
            f"v{t} AS MATERIALIZED (SELECT page_id, depth FROM v{t - 1}"
            f" UNION ALL SELECT page_id, CAST({t} AS BIGINT) FROM f{t})"
        )
    return ",\n".join(parts) + f"\nSELECT page_id, depth FROM v{max_depth}"


CRAWL_DEPTH_SQL = _crawl_depth_sql()


_WALK_STEPS = 4
_WALK_START_MOD = 13
# deterministic next-hop choice: idx = ((w*C1 + t*C2 + v*C3) % P) % out_deg
_WALK_C1, _WALK_C2, _WALK_C3, _WALK_P = 1000003, 10007, 101, 1000000007


def random_walks(sf_dir: str, steps: int = _WALK_STEPS,
                 start_mod: int = _WALK_START_MOD):
    """Deterministic graph random walks (the DeepWalk/node2vec sampling
    primitive) over the directed link graph: one walk per page with
    doc_id % start_mod == 0, ``steps`` hops; at node v on step t of walk
    w, the next hop is out-neighbor number
    ((w·C1 + t·C2 + v·C3) % P) % out_deg(v) of v's neighbors sorted by
    id — a shared integer expression, so numpy and DuckDB agree
    bit-for-bit and the result is block-structure-invariant. A walk that
    reaches a dangling node (no out-links — the synthesized graph really
    has them: any d with 6d ≡ −1 mod n has only self-links) just stops.
    Returns (walk_id, step, node) including the step-0 starts.

    Shape (100 TB bar): the indexed edge table (src, dst, idx-within-src,
    out_deg) is built by one coarse-bucket shuffle + per-bucket lexsort
    run resolution and pinned once; each step is ONE partitioned hash
    join of the O(walks) position table against it plus a vectorized
    filter — no per-row Python, positions re-pinned per step (parquet
    spill at scale via WWX_PIN_MODE)."""
    from osmwaterwayextractor_ray.stages.fastagg import _bucket_tbl, hash_join

    edges = _edge_list(sf_dir, _n_docs(sf_dir))

    def tag(batch: pa.Table) -> pa.Table:
        part = _bucket_tbl(batch, ["src_page"], 16)
        return batch.append_column("__part", pa.array(part, type=pa.int64()))

    def index_runs(g: pa.Table) -> pa.Table:
        s = g.column("src_page").to_numpy(zero_copy_only=False)
        d = g.column("dst_page").to_numpy(zero_copy_only=False)
        order = np.lexsort((d, s))
        s, d = s[order], d[order]
        change = np.ones(len(s), dtype=bool)
        change[1:] = s[1:] != s[:-1]
        starts = np.flatnonzero(change)
        counts = np.diff(np.append(starts, len(s)))
        idx = np.arange(len(s)) - np.repeat(starts, counts)
        deg = np.repeat(counts, counts)
        return pa.table(
            {
                "cur": pa.array(s, type=pa.int64()),
                "nxt": pa.array(d, type=pa.int64()),
                "idx": pa.array(idx, type=pa.int64()),
                "deg": pa.array(deg, type=pa.int64()),
            }
        )

    ie = pin(
        edges.map_batches(tag, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(index_runs, batch_format="pyarrow"),
        "walk_indexed_edges",
    )
    ie_schema = pa.schema(
        [("cur", pa.int64()), ("nxt", pa.int64()),
         ("idx", pa.int64()), ("deg", pa.int64())]
    )
    pos_schema = pa.schema([("walk_id", pa.int64()), ("cur", pa.int64())])

    def pick_starts(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        ids = ids[ids % start_mod == 0]
        arr = pa.array(ids, type=pa.int64())
        return pa.table({"walk_id": arr, "cur": arr})

    pos = pin(
        _read_documents(sf_dir, ["doc_id"]).map_batches(
            pick_starts, batch_format="pyarrow"
        ),
        "walk_pos0",
    )

    def emit(p, step: int):
        return p.map_batches(
            lambda t: pa.table(
                {
                    "walk_id": t["walk_id"],
                    "step": pa.array(
                        np.full(t.num_rows, step, dtype=np.int64),
                        type=pa.int64(),
                    ),
                    "node": t["cur"],
                }
            ),
            batch_format="pyarrow",
        )

    out = [emit(pos, 0)]
    for t in range(1, steps + 1):
        joined = hash_join(
            pos, ie, on=["cur"], num_parts=16,
            left_schema=pos_schema, right_schema=ie_schema,
        )

        def step_filter(b: pa.Table, _t=t) -> pa.Table:
            w = b.column("walk_id").to_numpy(zero_copy_only=False)
            v = b.column("cur").to_numpy(zero_copy_only=False)
            idx = b.column("idx").to_numpy(zero_copy_only=False)
            deg = b.column("deg").to_numpy(zero_copy_only=False)
            want = ((w * _WALK_C1 + _t * _WALK_C2 + v * _WALK_C3)
                    % _WALK_P) % deg
            keep = idx == want
            return pa.table(
                {
                    "walk_id": pa.array(w[keep], type=pa.int64()),
                    "cur": b.column("nxt").filter(pa.array(keep)),
                }
            )

        pos = pin(
            joined.map_batches(step_filter, batch_format="pyarrow"),
            f"walk_pos{t}",
        )
        if pos.count() == 0:
            break
        out.append(emit(pos, t))

    return out[0] if len(out) == 1 else out[0].union(*out[1:])


def _random_walks_sql(steps: int = _WALK_STEPS,
                      start_mod: int = _WALK_START_MOD) -> str:
    parts = [
        f"WITH {_EDGES_CTE}",
        "ie AS MATERIALIZED (SELECT src_page, dst_page,"
        " row_number() OVER (PARTITION BY src_page ORDER BY dst_page) - 1"
        " AS idx, count(*) OVER (PARTITION BY src_page) AS deg FROM edges)",
        f"w0 AS (SELECT doc_id AS walk_id, doc_id AS node FROM documents"
        f" WHERE doc_id % {start_mod} = 0)",
    ]
    for t in range(1, steps + 1):
        parts.append(
            f"w{t} AS MATERIALIZED (SELECT w.walk_id, e.dst_page AS node"
            f" FROM w{t - 1} w JOIN ie e ON e.src_page = w.node"
            f" AND e.idx = ((w.walk_id * {_WALK_C1} + {t} * {_WALK_C2}"
            f" + w.node * {_WALK_C3}) % {_WALK_P}) % e.deg)"
        )
    selects = [
        f"SELECT walk_id, CAST({t} AS BIGINT) AS step, node FROM w{t}"
        for t in range(steps + 1)
    ]
    return ",\n".join(parts) + "\n" + "\nUNION ALL\n".join(selects)


RANDOM_WALKS_SQL = _random_walks_sql()


_RA_K = 20


def _driver_topk(ds, score_col: str, k: int):
    """Exact distributed top-k by (score desc, page_id asc): per-block
    partial top-k rows (sound — page ids are unique), O(blocks × k) rows
    to the driver, final merge there. Returns [(page_id, score), ...]."""

    def partial(t: pa.Table) -> pa.Table:
        ids = t.column("page_id").to_numpy(zero_copy_only=False)
        sc = t.column(score_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -sc))[:k]
        return pa.table(
            {
                "page_id": pa.array(ids[order], type=pa.int64()),
                "s": pa.array(sc[order], type=pa.int64()),
            }
        )

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: (-r["s"], r["page_id"]))
    return rows[:k]


def rank_agreement(sf_dir: str, k: int = _RA_K):
    """Ranking-agreement audit between the two link-authority scores —
    the eval-metric composition every ranking pipeline needs (did the
    cheap score order the same pages as the expensive one?). Takes the
    exact top-k of PageRank and of HITS authority (ties broken by
    page_id — both totals), and reports: overlap size, and Kendall
    concordant/discordant pair counts over the SHARED pages' positions
    in the two top-k lists. One row, all exact int64.

    Scale shape: both rankings stay distributed; only per-block partial
    top-k rows (O(blocks × k)) reach the driver, and the O(k²) pair
    count runs on ≤ k rows there. SQL twin composes both unrolled-CTE
    programs as materialized subqueries."""
    pr_top = _driver_topk(
        pagerank(sf_dir).map_batches(
            lambda t: t.select(["page_id", "pr"]), batch_format="pyarrow"
        ),
        "pr", k,
    )
    ht_top = _driver_topk(
        hits_scores(sf_dir).map_batches(
            lambda t: t.select(["page_id", "auth"]), batch_format="pyarrow"
        ),
        "auth", k,
    )
    rp = {r["page_id"]: i + 1 for i, r in enumerate(pr_top)}
    rh = {r["page_id"]: i + 1 for i, r in enumerate(ht_top)}
    common = sorted(set(rp) & set(rh))
    conc = disc = 0
    for i in range(len(common)):
        for j in range(i + 1, len(common)):
            s = (rp[common[i]] - rp[common[j]]) * (rh[common[i]] - rh[common[j]])
            if s > 0:
                conc += 1
            elif s < 0:
                disc += 1
    return pa.table(
        {
            "k": pa.array([k], type=pa.int64()),
            "n_overlap": pa.array([len(common)], type=pa.int64()),
            "n_concordant": pa.array([conc], type=pa.int64()),
            "n_discordant": pa.array([disc], type=pa.int64()),
        }
    )


def _rank_agreement_sql(k: int = _RA_K) -> str:
    return f"""
WITH pr AS MATERIALIZED (SELECT * FROM ({PAGERANK_SQL})),
ht AS MATERIALIZED (SELECT * FROM ({HITS_SQL})),
topp AS (
  SELECT page_id, row_number() OVER (ORDER BY pr DESC, page_id) AS rp
  FROM pr QUALIFY rp <= {k}
),
toph AS (
  SELECT page_id, row_number() OVER (ORDER BY auth DESC, page_id) AS rh
  FROM ht QUALIFY rh <= {k}
),
shared AS (SELECT page_id, rp, rh FROM topp JOIN toph USING (page_id)),
pairs AS (
  SELECT (a.rp - b.rp) * (a.rh - b.rh) AS s
  FROM shared a JOIN shared b ON a.page_id < b.page_id
)
SELECT CAST({k} AS BIGINT) AS k,
       CAST((SELECT count(*) FROM shared) AS BIGINT) AS n_overlap,
       CAST(COALESCE(sum(CASE WHEN s > 0 THEN 1 ELSE 0 END), 0) AS BIGINT)
         AS n_concordant,
       CAST(COALESCE(sum(CASE WHEN s < 0 THEN 1 ELSE 0 END), 0) AS BIGINT)
         AS n_discordant
FROM pairs
"""


RANK_AGREEMENT_SQL = _rank_agreement_sql()


def community_modularity(sf_dir: str):
    """Exact-integer Newman modularity of the LPA partition — the
    standard quality metric for a community detection run:

      Q = Σ_c ( e_c / m  −  (d_c / 2m)² )
        = q_num / (4 m²),   q_num = Σ_c (4·m·e_c − d_c²)

    with m = undirected edge count, e_c = within-community edges, d_c =
    community degree sum — reported as the EXACT int64 pair (m, q_num)
    plus the community count (int64 bound: needs 4·m·e_c < 2^63, i.e.
    m < ~1.5e9 edges; beyond that widen to big-int per the tfidf
    HUGEINT convention). One row.

    Shape: labels attach to the canonical edge list and the degree table
    by two partitioned co-group passes; per-community (e_c, d_c) rows
    co-group once more into per-bucket partial q_num sums, so the driver
    sees O(buckets) integers plus the O(1) m."""
    import pyarrow.compute as pc

    from osmwaterwayextractor_ray.stages.fastagg import (
        cogroup,
        grouped_agg,
        lookup_join,
    )

    und = _und_edges(sf_dir, "mod_und")
    # thread the pinned und through LPA so the O(E) edge list is built,
    # shuffled and pinned ONCE for the whole query
    labels = pin(label_prop_communities(sf_dir, und=und), "mod_labels")
    lab_schema = pa.schema([("page_id", pa.int64()), ("community", pa.int64())])
    canon = und.map_batches(
        lambda t: t.filter(pc.less(t["a"], t["b"])), batch_format="pyarrow"
    )
    canon_schema = pa.schema([("a", pa.int64()), ("b", pa.int64())])
    m = canon.count()

    # e_c: attach labels on both endpoints, keep same-community edges
    wa = lookup_join(
        canon, labels, "a", "page_id", {"community": "ca"},
        num_parts=16, left_schema=canon_schema, right_schema=lab_schema,
    )
    wa_schema = canon_schema.append(pa.field("ca", pa.int64()))
    wb = lookup_join(
        wa, labels, "b", "page_id", {"community": "cb"},
        num_parts=16, left_schema=wa_schema, right_schema=lab_schema,
    )
    within = wb.map_batches(
        lambda t: pa.table(
            {"c": t.filter(pc.equal(t["ca"], t["cb"]))["ca"]}
        ),
        batch_format="pyarrow",
    )
    ec = grouped_agg(within, ["c"], {"e": ("c", "count")}, num_parts=8)

    # d_c: per-node degree, attach label, sum per community
    deg = grouped_agg(und, ["a"], {"deg": ("a", "count")}, num_parts=16)
    deg_schema = pa.schema([("a", pa.int64()), ("deg", pa.int64())])
    degl = lookup_join(
        deg, labels, "a", "page_id", {"community": "c"},
        num_parts=16, left_schema=deg_schema, right_schema=lab_schema,
    )
    dc = grouped_agg(degl, ["c"], {"d": ("deg", "sum")}, num_parts=8)

    # per-community (e_c, d_c) -> per-bucket partial q_num sums
    ec_schema = pa.schema([("c", pa.int64()), ("e", pa.int64())])
    dc_schema = pa.schema([("c", pa.int64()), ("d", pa.int64())])
    grouped, split = cogroup(
        dc, ec, ["c"], num_parts=8, left_schema=dc_schema, right_schema=ec_schema,
    )

    def qnum_partial(g: pa.Table) -> pa.Table:
        dg, eg = split(g)
        dci = dg.column("c").to_numpy(zero_copy_only=False)
        dv = dg.column("d").to_numpy(zero_copy_only=False)
        eci = eg.column("c").to_numpy(zero_copy_only=False)
        ev = eg.column("e").to_numpy(zero_copy_only=False)
        order = np.argsort(eci)
        pos = np.searchsorted(eci[order], dci)
        pos_c = np.clip(pos, 0, max(len(eci) - 1, 0))
        hit = (eci[order][pos_c] == dci) if len(eci) else np.zeros(len(dci), bool)
        e_for_d = np.zeros(len(dci), dtype=np.int64)
        if len(eci):
            e_for_d[hit] = ev[order][pos_c[hit]]
        q = int((4 * m * e_for_d - dv * dv).sum())
        return pa.table(
            {
                "q": pa.array([q], type=pa.int64()),
                "nc": pa.array([len(dci)], type=pa.int64()),
            }
        )

    parts = grouped.map_groups(qnum_partial, batch_format="pyarrow").take_all()
    # isolated pages (deg 0) are their own communities with e=d=0 — they
    # contribute 0 to q_num but DO count as communities
    n_pages = _n_docs(sf_dir)
    n_nonisolated = und.map_batches(
        lambda t: pa.table({"a": t["a"]}), batch_format="pyarrow"
    )
    from osmwaterwayextractor_ray.stages.fastagg import distinct as _distinct

    n_iso = n_pages - _distinct(n_nonisolated, ["a"], num_parts=8).count()
    return pa.table(
        {
            "m": pa.array([m], type=pa.int64()),
            "q_num": pa.array([sum(p["q"] for p in parts)], type=pa.int64()),
            "n_communities": pa.array(
                [sum(p["nc"] for p in parts) + n_iso], type=pa.int64()
            ),
        }
    )


COMMUNITY_MODULARITY_SQL = f"""
WITH lp AS MATERIALIZED (SELECT * FROM ({LPA_SQL})),
{_EDGES_CTE.strip().lstrip()},
und AS (SELECT DISTINCT a, b FROM (SELECT src_page AS a, dst_page AS b
        FROM edges UNION ALL SELECT dst_page, src_page FROM edges)),
canon AS (SELECT a, b FROM und WHERE a < b),
m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM canon),
ec AS (
  SELECT la.community AS c, CAST(count(*) AS BIGINT) AS e
  FROM canon JOIN lp la ON la.page_id = canon.a
             JOIN lp lb ON lb.page_id = canon.b
  WHERE la.community = lb.community GROUP BY 1
),
deg AS (SELECT a, CAST(count(*) AS BIGINT) AS deg FROM und GROUP BY 1),
dc AS (
  SELECT lp.community AS c, CAST(sum(deg.deg) AS BIGINT) AS d
  FROM deg JOIN lp ON lp.page_id = deg.a GROUP BY 1
),
qsum AS (
  SELECT CAST(COALESCE(sum(4 * m.m * COALESCE(ec.e, 0) - dc.d * dc.d), 0)
         AS BIGINT) AS q_num,
         CAST(count(*) AS BIGINT) AS nc
  FROM dc LEFT JOIN ec USING (c) CROSS JOIN m
),
iso AS (
  SELECT CAST(count(*) AS BIGINT) AS n FROM documents d
  WHERE NOT EXISTS (SELECT 1 FROM und u WHERE u.a = d.doc_id)
)
SELECT m.m, qsum.q_num, qsum.nc + iso.n AS n_communities
FROM m CROSS JOIN qsum CROSS JOIN iso
"""


def trustrank(sf_dir: str, iters: int = _PR_ITERS,
              seed_mod: int = _CRAWL_SEED_MOD):
    """TrustRank (Gyöngyi et al. 2004): PageRank personalized to the
    crawl-seed set — teleport mass lands ONLY on seeds (doc_id %
    seed_mod == 0, the crawl_depth seed list), so trust decays with link
    distance from them; the classic spam-demotion / crawl-prioritization
    score. Same int64 fixed-point contract as pagerank:

      tr_0(v)     = SCALE // S             if v seed else 0
      tr_{t+1}(v) = base_v + (85 · Σ_{u→v} tr_t(u) // out_deg(u)) // 100
      base_v      = (15·SCALE) // (100·S)  if v seed else 0

    (S = seed count). Seed-ness is pure id arithmetic, so the per-node
    base folds into the share map exactly like pagerank's constant base
    — one zero-fill attach + one grouped sum + one re-pin per iteration;
    zero contributions are filtered before the shuffle (sum-identical).
    Returns (page_id, tr); bit-identical under any block structure."""
    n_docs = _n_docs(sf_dir)

    def pick_seeds(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {"page_id": pa.array(ids[ids % seed_mod == 0], type=pa.int64())}
        )

    n_seeds = (
        _read_documents(sf_dir, ["doc_id"])
        .map_batches(pick_seeds, batch_format="pyarrow")
        .count()
    )
    ewd = _edges_with_outdeg(sf_dir, n_docs, "trustrank")

    init = _PR_SCALE // max(n_seeds, 1)
    base = (15 * _PR_SCALE) // (100 * max(n_seeds, 1))

    sums_schema = pa.schema([("page_id", pa.int64()), ("m", pa.int64())])
    sums = None
    for it in range(iters):
        if sums is None:
            def share0(t: pa.Table) -> pa.Table:
                s = t.column("src_page").to_numpy(zero_copy_only=False)
                d = t.column("out_deg").to_numpy(zero_copy_only=False)
                mask = s % seed_mod == 0
                c = init // d[mask]
                keep = c > 0
                return pa.table(
                    {
                        "page_id": t.column("dst_page").filter(
                            pa.array(mask)
                        ).filter(pa.array(keep)),
                        "c": pa.array(c[keep], type=pa.int64()),
                    }
                )

            contrib = ewd.map_batches(share0, batch_format="pyarrow")
        else:
            sums_as_src = sums.map_batches(
                lambda t: t.rename_columns(["src_page", "m"]),
                batch_format="pyarrow",
            )
            joined = _attach_zero_fill(
                ewd, sums_as_src, key="src_page", value_cols=["m"],
                left_schema=_EWD_SCHEMA,
                right_schema=pa.schema(
                    [("src_page", pa.int64()), ("m", pa.int64())]
                ),
                extra_cols=["dst_page", "out_deg"],
            )

            def share(t: pa.Table) -> pa.Table:
                s = t.column("src_page").to_numpy(zero_copy_only=False)
                m = t.column("m").to_numpy(zero_copy_only=False)
                d = t.column("out_deg").to_numpy(zero_copy_only=False)
                base_v = np.where(s % seed_mod == 0, base, 0)
                c = (base_v + (_PR_DAMP_NUM * m) // _PR_DAMP_DEN) // d
                keep = c > 0
                return pa.table(
                    {
                        "page_id": t.column("dst_page").filter(pa.array(keep)),
                        "c": pa.array(c[keep], type=pa.int64()),
                    }
                )

            contrib = joined.map_batches(share, batch_format="pyarrow")
        sums = pin(
            grouped_agg(contrib, ["page_id"], {"m": ("c", "sum")}, num_parts=16),
            f"trustrank_m{it + 1}",
        )

    pages = _read_documents(sf_dir, ["doc_id"]).map_batches(
        lambda t: t.rename_columns(["page_id"]), batch_format="pyarrow"
    )
    pages_schema = pa.schema([("page_id", pa.int64())])

    if sums is None:
        def uniform(t: pa.Table) -> pa.Table:
            ids = t.column("page_id").to_numpy(zero_copy_only=False)
            tr = np.where(ids % seed_mod == 0, init, 0)
            return pa.table(
                {
                    "page_id": t["page_id"],
                    "tr": pa.array(tr, type=pa.int64()),
                }
            )

        return pages.map_batches(uniform, batch_format="pyarrow")

    filled = _attach_zero_fill(
        pages, sums, key="page_id", value_cols=["m"],
        left_schema=pages_schema, right_schema=sums_schema,
    )

    def damp(t: pa.Table) -> pa.Table:
        ids = t.column("page_id").to_numpy(zero_copy_only=False)
        m = t.column("m").to_numpy(zero_copy_only=False)
        base_v = np.where(ids % seed_mod == 0, base, 0)
        return pa.table(
            {
                "page_id": t["page_id"],
                "tr": pa.array(
                    base_v + (_PR_DAMP_NUM * m) // _PR_DAMP_DEN, type=pa.int64()
                ),
            }
        )

    return filled.map_batches(damp, batch_format="pyarrow")


def _trustrank_sql(iters: int = _PR_ITERS,
                   seed_mod: int = _CRAWL_SEED_MOD) -> str:
    S = _PR_SCALE
    parts = [
        f"WITH {_EDGES_CTE}",
        "od AS (SELECT src_page, count(*) AS out_deg FROM edges GROUP BY 1)",
        f"ns AS (SELECT CAST(count(*) AS BIGINT) AS s FROM documents"
        f" WHERE doc_id % {seed_mod} = 0)",
        f"tr0 AS (SELECT doc_id AS page_id,"
        f" CASE WHEN doc_id % {seed_mod} = 0"
        f" THEN CAST({S} AS BIGINT) // greatest(ns.s, 1) ELSE 0 END AS tr"
        f" FROM documents, ns)",
    ]
    for t in range(iters):
        parts.append(
            f"s{t} AS (SELECT e.dst_page AS page_id,"
            f" CAST(sum(p.tr // od.out_deg) AS BIGINT) AS m"
            f" FROM edges e JOIN od USING (src_page)"
            f" JOIN tr{t} p ON p.page_id = e.src_page GROUP BY 1)"
        )
        parts.append(
            f"tr{t + 1} AS (SELECT d.doc_id AS page_id,"
            f" CASE WHEN d.doc_id % {seed_mod} = 0"
            f" THEN (15 * CAST({S} AS BIGINT)) // (100 * greatest(ns.s, 1))"
            f" ELSE 0 END"
            f" + ({_PR_DAMP_NUM} * COALESCE(s.m, 0)) // {_PR_DAMP_DEN} AS tr"
            f" FROM documents d CROSS JOIN ns"
            f" LEFT JOIN s{t} s ON d.doc_id = s.page_id)"
        )
    return ",\n".join(parts) + f"\nSELECT page_id, tr FROM tr{iters}"


TRUSTRANK_SQL = _trustrank_sql()


def _attach_zero_fill(left, right, key: str, value_cols: list[str],
                      left_schema=None, right_schema=None, num_parts: int = 16,
                      extra_cols: list[str] | None = None):
    """LEFT JOIN right (unique-keyed int64) onto left, missing -> 0.
    ``extra_cols``: additional LEFT columns carried through unchanged."""
    grouped, split = cogroup(
        left, right, [key], num_parts=num_parts,
        left_schema=left_schema, right_schema=right_schema,
    )

    def attach(g: pa.Table) -> pa.Table:
        lg, rg = split(g)
        lk = lg.column(key).to_numpy(zero_copy_only=False)
        rk = rg.column(key).to_numpy(zero_copy_only=False)
        order = np.argsort(rk)
        rk = rk[order]
        pos = np.searchsorted(rk, lk)
        pos_c = np.clip(pos, 0, max(len(rk) - 1, 0))
        hit = (rk[pos_c] == lk) if len(rk) else np.zeros(len(lk), dtype=bool)
        cols = {key: lg[key]}
        for c in extra_cols or []:
            cols[c] = lg[c]
        for c in value_cols:
            v = np.zeros(len(lk), dtype=np.int64)
            if len(rk):
                rv = rg.column(c).to_numpy(zero_copy_only=False)[order]
                v[hit] = rv[pos_c[hit]]
            cols[c] = pa.array(v, type=pa.int64())
        return pa.table(cols)

    return grouped.map_groups(attach, batch_format="pyarrow")


def _read_documents(sf_dir: str, columns):
    from osmwaterwayextractor_ray.sources.readers import read_pq

    return read_pq(f"{sf_dir}/documents.parquet", columns=columns)


# ---------------------------------------------------------------------------
# HyperANF neighborhood function (wave 27)
# ---------------------------------------------------------------------------

_HA_P = 8                  # 2^8 = 256 registers/node (HyperANF's regime)
_HA_M = 1 << _HA_P
_HA_BITS = 64 - _HA_P      # rho domain: the hash's low 56 bits
_HA_ITERS = 4


def _ha_rho(w: np.ndarray) -> np.ndarray:
    """rho(w) = leading-zero count of w within _HA_BITS bits, + 1
    (= _HA_BITS - floor(log2 w) for w > 0; _HA_BITS + 1 for w == 0).
    Exact 6-step uint64 binary search — no float log (the 56-bit domain
    exceeds float64's 53-bit exact range, so state/hll.py's frexp trick
    does not apply at p=8)."""
    lg = np.zeros(w.shape, dtype=np.int64)
    x = w.copy()
    for s in (32, 16, 8, 4, 2, 1):
        big = x >= (np.uint64(1) << np.uint64(s))
        lg[big] += s
        x[big] >>= np.uint64(s)
    out = (_HA_BITS - lg).astype(np.uint8)
    out[w == 0] = _HA_BITS + 1
    return out


def _ha_init_regs(ids: np.ndarray) -> np.ndarray:
    """(n, 256) uint8 register matrix for singleton sets {id}."""
    from osmwaterwayextractor_ray.state.hll import _mix64

    h = _mix64(ids.astype(np.uint64))
    idx = (h >> np.uint64(_HA_BITS)).astype(np.int64)
    rho = _ha_rho(h & np.uint64((1 << _HA_BITS) - 1))
    regs = np.zeros((len(ids), _HA_M), dtype=np.uint8)
    regs[np.arange(len(ids)), idx] = rho
    return regs


def _ha_estimates(regs: np.ndarray) -> np.ndarray:
    """Vectorized HLL estimate per row of an (n, 256) register matrix —
    standard 64-bit-hash variant: alpha·m²/Σ2^-M with linear counting
    below 2.5m (no large-range correction needed)."""
    m = _HA_M
    alpha = 0.7213 / (1 + 1.079 / m)
    raw = alpha * m * m / np.sum(np.float64(2.0) ** -regs.astype(np.float64), axis=1)
    zeros = (regs == 0).sum(axis=1)
    small = (raw <= 2.5 * m) & (zeros > 0)
    out = raw.copy()
    out[small] = m * np.log(m / zeros[small])
    return out


def _regs_matrix(col) -> np.ndarray:
    """(n, 256) uint8 view of a binary register column — zero-copy via the
    offsets/values buffers (every row is exactly _HA_M bytes)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    if n == 0:
        return np.zeros((0, _HA_M), dtype=np.uint8)
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
        arr.offset : arr.offset + n + 1
    ]
    if offs[-1] - offs[0] != n * _HA_M:
        raise ValueError("hyperanf register rows must be exactly 2^p bytes")
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    return data[offs[0] : offs[-1]].reshape(n, _HA_M)


def _regs_binary(mat: np.ndarray) -> pa.Array:
    """Binary column from an (n, 256) uint8 matrix without a per-row loop."""
    n = len(mat)
    offs = pa.array(np.arange(0, (n + 1) * _HA_M, _HA_M, dtype=np.int32))
    return pa.Array.from_buffers(
        pa.binary(), n,
        [None, offs.buffers()[1], pa.py_buffer(np.ascontiguousarray(mat).tobytes())],
    )


def hyperanf(sf_dir: str):
    """HyperANF (Boldi, Rosa & Vigna, WWW 2011, public): the graph
    neighborhood function N(t) = Σ_v |{u : dist(v,u) <= t}| estimated by
    one 256-register HyperLogLog counter PER NODE, advanced t hops by
    register-max merges along the out-edges — the distributed sketch
    answer to "how connected is the crawl graph / what is its effective
    diameter" that exact all-pairs BFS (O(n·m)) cannot give at scale.

    Per iteration (the pagerank loop shape): ship each node's registers
    to its in-neighbors with ONE Arrow lookup_join on dst, union the
    nodes' own registers, ONE grouped max-merge shuffle (np.maximum over
    stacked uint8 rows), re-pin (object store at bench scale, parquet
    at 100 TB via WWX_PIN_MODE). Register max is associative +
    commutative and the hash is fixed, so the whole run is bit-identical
    under any block structure — but the OUTPUT is an estimator, so this
    is a rows-only query (no SQL twin); tests pin it against exact BFS
    neighborhood counts at sf0.001 within HLL error.

    Returns one row per hop t = 0.._HA_ITERS: (t, nf_est) plus the
    exact node count for reference."""
    from osmwaterwayextractor_ray.stages.fastagg import lookup_join

    n_docs = _n_docs(sf_dir)
    # self-loop rows fold the "∪ own registers" into the SAME lookup_join
    # that ships the neighbors' — no per-iteration union (a union before
    # the merge shuffle blocks operator fusion; pagerank A/B, NOTES_r4 #20)
    raw_edges = _edge_list(sf_dir, n_docs)
    selfloops = _read_documents(sf_dir, ["doc_id"]).map_batches(
        lambda t: pa.table({"src_page": t["doc_id"], "dst_page": t["doc_id"]}),
        batch_format="pyarrow",
    )
    edges = pin(raw_edges.union(selfloops), "hyperanf_edges")
    edge_schema = pa.schema([("src_page", pa.int64()), ("dst_page", pa.int64())])
    regs_schema = pa.schema([("page_id", pa.int64()), ("regs", pa.binary())])

    def init(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        regs = _ha_init_regs(ids)
        return pa.table(
            {
                "page_id": pa.array(ids, type=pa.int64()),
                "regs": _regs_binary(regs),
            }
        )

    regs = pin(
        _read_documents(sf_dir, ["doc_id"]).map_batches(init, batch_format="pyarrow"),
        "hyperanf_regs0",
    )

    def sum_est(t: pa.Table) -> pa.Table:
        # per-node estimates are deterministic (row-local float ops), but a
        # float SUM would depend on block structure — quantize each node's
        # estimate to micro-units and sum int64 (the invariance rule)
        m = _regs_matrix(t.column("regs"))
        micro = np.floor(_ha_estimates(m) * 1e6 + 0.5).astype(np.int64)
        return pa.table({"s": pa.array([int(micro.sum())], type=pa.int64())})

    def nf(r) -> float:
        parts = r.map_batches(sum_est, batch_format="pyarrow").take_all()
        return sum(int(p["s"]) for p in parts) / 1e6

    out_t, out_nf = [0], [nf(regs)]
    num_parts = 8

    for it in range(_HA_ITERS):
        # pull: regs of each OUT-neighbor land on the edge's src side
        shipped = lookup_join(
            edges, regs, "dst_page", "page_id", {"regs": "regs"},
            num_parts=num_parts, left_schema=edge_schema, right_schema=regs_schema,
        ).map_batches(
            lambda t: t.select(["src_page", "regs"]).rename_columns(
                ["page_id", "regs"]
            ),
            batch_format="pyarrow",
        )
        both = shipped  # self-loop edges already carry each node's own regs

        def tag(t: pa.Table) -> pa.Table:
            ids = t.column("page_id").to_numpy(zero_copy_only=False)
            return t.append_column(
                "__part", pa.array(ids % num_parts, type=pa.int64())
            )

        def merge(g: pa.Table) -> pa.Table:
            if len(g) == 0:
                return pa.table(
                    {
                        "page_id": pa.array([], type=pa.int64()),
                        "regs": pa.array([], type=pa.binary()),
                    }
                )
            ids = g.column("page_id").to_numpy(zero_copy_only=False)
            m = _regs_matrix(g.column("regs"))
            order = np.argsort(ids, kind="stable")
            ids_s, m_s = ids[order], m[order]
            seg = np.flatnonzero(np.r_[True, ids_s[1:] != ids_s[:-1]])
            merged = np.maximum.reduceat(m_s, seg, axis=0)
            return pa.table(
                {
                    "page_id": pa.array(ids_s[seg], type=pa.int64()),
                    "regs": _regs_binary(merged),
                }
            )

        regs = pin(
            both.map_batches(tag, batch_format="pyarrow")
            .groupby("__part")
            .map_groups(merge, batch_format="pyarrow"),
            f"hyperanf_regs{it + 1}",
        )
        out_t.append(it + 1)
        out_nf.append(nf(regs))

    return pa.table(
        {
            "t": pa.array(out_t, type=pa.int64()),
            "nf_est": pa.array(out_nf, type=pa.float64()),
            "n_nodes": pa.array([n_docs] * len(out_t), type=pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# crawl-rate anomaly screen (wave 27)
# ---------------------------------------------------------------------------

_CA_TRAP_MOD = 50    # planted crawler trap: every 50th doc ...
_CA_BURST = 20       # ... contributes 20 extra fetches ...
_CA_TRAP_HOUR = 9    # ... in hour 9
_CA_Z2_NUM = 2       # flag hour iff z^2 > 2 (exact integer cross-multiply)


def crawl_anomaly(sf_dir: str):
    """Per-host fetch-rate anomaly screen over the capture log: bucket
    fetches into (host, hour), then flag every hour whose count is a
    per-host outlier — z^2 > _CA_Z2_NUM, evaluated EXACTLY in integers:

        z^2 = (n·H - T)^2 / (H·S2 - T^2)   with
        H = hours observed for the host, T = Σn, S2 = Σn²

    so the flag is (n·H - T)^2 > Z2 · (H·S2 - T^2) — no float sqrt /
    division anywhere, bit-identical to the SQL twin. A planted crawler
    trap (every _CA_TRAP_MOD-th doc adds _CA_BURST fetches at hour
    _CA_TRAP_HOUR) gives the screen real signal, reproduced verbatim by
    the oracle.

    Scale: per-batch (host, hour) Counter partials -> one O(hosts×hours)
    grouped-sum shuffle -> one host-hash shuffle over the tiny stats
    table; the capture log itself never moves twice. int64 fail-loud
    guard on the squared terms (the pack_ids32 discipline)."""
    from osmwaterwayextractor_ray.stages.fastagg import _bucket_tbl, grouped_agg

    caps = _read_documents(sf_dir, ["doc_id"])
    num_parts = 8

    def partial(batch: pa.Table) -> pa.Table:
        from collections import Counter

        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        c: Counter = Counter()
        for did in ids.tolist():
            host = f"site{did % _N_HOSTS}.test"
            for cap in range(1 + did % 3):
                hour = (did * 1_000_000 + cap * _HOUR_US) // _HOUR_US
                c[(host, hour)] += 1
            if did % _CA_TRAP_MOD == 0:
                c[(host, _CA_TRAP_HOUR)] += _CA_BURST
        hosts = [h for h, _ in c]
        return pa.table(
            {
                "host": pa.array(hosts, type=pa.string()),
                "hour": pa.array([h for _, h in c], type=pa.int64()),
                "n": pa.array(list(c.values()), type=pa.int64()),
            }
        )

    counts = grouped_agg(
        caps.map_batches(partial, batch_format="pyarrow", batch_size=4096),
        ["host", "hour"],
        {"n_fetches": ("n", "sum")},
        num_parts=num_parts,
    )

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column(
            "__part", pa.array(_bucket_tbl(t, ["host"], num_parts), type=pa.int64())
        )

    def flag(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {
                    "host": pa.array([], type=pa.string()),
                    "hour": pa.array([], type=pa.int64()),
                    "n_fetches": pa.array([], type=pa.int64()),
                    "anomalous": pa.array([], type=pa.int64()),
                }
            )
        hosts = np.asarray(g.column("host").to_pylist(), dtype=object)
        hour = g.column("hour").to_numpy(zero_copy_only=False)
        n = g.column("n_fetches").to_numpy(zero_copy_only=False)
        order = np.lexsort((hour, hosts))
        hosts, hour, n = hosts[order], hour[order], n[order]
        seg = np.flatnonzero(np.r_[True, hosts[1:] != hosts[:-1]])
        H = np.diff(np.r_[seg, len(hosts)])
        T = np.add.reduceat(n, seg)
        S2 = np.add.reduceat(n * n, seg)
        Hr, Tr, S2r = np.repeat(H, H), np.repeat(T, H), np.repeat(S2, H)
        lhs_root = n * Hr - Tr
        rhs = Hr * S2r - Tr * Tr
        # int64 fail-loud bounds: squares must not wrap
        if len(n) and (np.abs(lhs_root).max() > 3_000_000_000 or rhs.max() > (1 << 61)):
            raise ValueError("crawl_anomaly: counts exceed the int64 z^2 budget")
        anom = (lhs_root * lhs_root > _CA_Z2_NUM * rhs).astype(np.int64)
        return pa.table(
            {
                "host": pa.array(hosts, type=pa.string()),
                "hour": pa.array(hour, type=pa.int64()),
                "n_fetches": pa.array(n, type=pa.int64()),
                "anomalous": pa.array(anom, type=pa.int64()),
            }
        )

    return (
        counts.map_batches(tag, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(flag, batch_format="pyarrow")
    )


CRAWL_ANOMALY_SQL = f"""
WITH f AS (
  SELECT 'site' || CAST(doc_id % {_N_HOSTS} AS VARCHAR) || '.test' AS host,
         (doc_id * 1000000 + c.c * {_HOUR_US}) // {_HOUR_US} AS hour
  FROM documents, UNNEST([0, 1, 2]) AS c(c)
  WHERE c.c < 1 + doc_id % 3
  UNION ALL
  SELECT 'site' || CAST(doc_id % {_N_HOSTS} AS VARCHAR) || '.test' AS host,
         {_CA_TRAP_HOUR} AS hour
  FROM documents, UNNEST(generate_series(1, {_CA_BURST})) AS b(b)
  WHERE doc_id % {_CA_TRAP_MOD} = 0
),
g AS (SELECT host, hour, count(*) AS n_fetches FROM f GROUP BY 1, 2),
s AS (
  SELECT *, count(*) OVER (PARTITION BY host) AS H,
         sum(n_fetches) OVER (PARTITION BY host) AS T,
         sum(n_fetches * n_fetches) OVER (PARTITION BY host) AS S2
  FROM g
)
SELECT host, CAST(hour AS BIGINT) AS hour, CAST(n_fetches AS BIGINT) AS n_fetches,
       CAST(CASE WHEN (n_fetches * H - T) * (n_fetches * H - T)
                      > {_CA_Z2_NUM} * (H * S2 - T * T)
                 THEN 1 ELSE 0 END AS BIGINT) AS anomalous
FROM s
"""


# ---------------------------------------------------------------------------
# strongly connected components (wave 28)
# ---------------------------------------------------------------------------

_SCC_MAX_ROUNDS = 16  # outer FW-BW peel rounds, fail-loud cap. Worst case
# (sink component holds the global min id) extracts ONE component per
# round, so the cap is the tolerated condensation-chain depth; on the
# synthesized graph family every component is its own color class and a
# single round clears everything (verified n=60..50k).
_SCC_MAX_PROP = 32    # min/max-propagation fixpoint cap per phase


_E_SCHEMA = pa.schema([("src_page", pa.int64()), ("dst_page", pa.int64())])
_L_SCHEMA = pa.schema([("page_id", pa.int64()), ("lab", pa.int64())])


def _int_sum(ds, col: str) -> int:
    """Exact int64 column sum, O(blocks) driver rows."""

    def part(t: pa.Table) -> pa.Table:
        v = t.column(col).to_numpy(zero_copy_only=False)
        return pa.table({"s": pa.array([int(v.sum())], type=pa.int64())})

    return sum(
        int(p["s"]) for p in ds.map_batches(part, batch_format="pyarrow").take_all()
    )


def _min_label_fixpoint(lab, e_tbl, along: str, name: str, num_parts: int = 8):
    """Min-label fixpoint over (page_id, lab) with pointer jumping.
    ``along='out'``: label flows dst -> src (forward reachability);
    'in': src -> dst (backward reachability). Labels must be node ids
    (lab(v) reachable from v) for the jump to be sound; convergence is
    detected by equal int64 label sums (min-propagation only lowers
    labels). Shared by scc and bowtie.

    The pointer jump rides the SAME join as edge propagation
    (labels-as-edges fusion, r5): a virtual edge (v, lab(v)) attached
    against the label table contributes lab(lab(v)) to v's grouped min —
    exactly the old second lookup_join — so each iteration pays ONE
    cogroup shuffle instead of two. The update set is identical rule-
    for-rule (self-loops in e_tbl already contribute lab(v) itself), so
    labels — and the iteration count — are byte-identical to the
    unfused plan (pinned by tests/test_webgraph.py's scc oracle +
    Kosaraju brute force).

    Two execution twins (``WWX_SCC_FIXPOINT``): ``bsp`` (default) runs
    the fixpoint on hash-sharded actors — TWO message rounds per
    iteration instead of two Ray Data shuffles + pin + sum (~10× less
    per-iteration launch overhead, measured r5; see
    ``state/labelprop.py`` for the partitioning contract); ``dataset``
    keeps the pure-Dataset plan below. Same update rule, byte-identical
    labels (twin-equality pinned by tests/test_labelprop.py)."""
    from osmwaterwayextractor_ray.stages.fastagg import grouped_agg, lookup_join
    from osmwaterwayextractor_ray.stages.pin import pin

    if os.environ.get("WWX_SCC_FIXPOINT", "bsp") == "bsp":
        from osmwaterwayextractor_ray.state.labelprop import min_label_fixpoint_bsp

        return min_label_fixpoint_bsp(
            lab, e_tbl, along, name, num_parts=num_parts,
            max_iters=_SCC_MAX_PROP,
        )

    attach_key, group_key = (
        ("dst_page", "src_page") if along == "out" else ("src_page", "dst_page")
    )

    def lab_as_edges(t: pa.Table) -> pa.Table:
        # (page_id, lab) -> an edge whose group side is page_id and whose
        # attach side is lab, matching the direction of this fixpoint
        if along == "out":
            return pa.table({"src_page": t["page_id"], "dst_page": t["lab"]})
        return pa.table({"src_page": t["lab"], "dst_page": t["page_id"]})

    s_prev = _int_sum(lab, "lab")
    for it in range(_SCC_MAX_PROP):
        fused_edges = e_tbl.union(
            lab.map_batches(lab_as_edges, batch_format="pyarrow")
        )
        via = lookup_join(
            fused_edges, lab, attach_key, "page_id", {"lab": "lab"},
            num_parts=num_parts, left_schema=_E_SCHEMA, right_schema=_L_SCHEMA,
        ).map_batches(
            lambda t: t.select([group_key, "lab"]).rename_columns(
                ["page_id", "lab"]
            ),
            batch_format="pyarrow",
        )
        lab = pin(
            grouped_agg(
                via,
                ["page_id"],
                {"lab": ("lab", "min")},
                num_parts=num_parts,
            ),
            f"{name}_{it}",
        )
        s = _int_sum(lab, "lab")
        if s == s_prev:
            return lab
        s_prev = s
    raise ValueError(
        f"{name}: min-label propagation did not converge in {_SCC_MAX_PROP} steps"
    )


def _scc_inputs(sf_dir: str, n_docs: int, prefix: str = "scc"):
    """Pinned (active page set, self-looped distinct edge list) pair —
    the FW-BW working graph, shared by scc and bowtie."""
    from osmwaterwayextractor_ray.stages.pin import pin

    def selfloop(t: pa.Table) -> pa.Table:
        return pa.table({"src_page": t["page_id"], "dst_page": t["page_id"]})

    active = pin(
        _read_documents(sf_dir, ["doc_id"]).map_batches(
            lambda t: t.rename_columns(["page_id"]), batch_format="pyarrow"
        ),
        f"{prefix}_act0",
    )
    edges = pin(
        _edge_list(sf_dir, n_docs).union(
            active.map_batches(selfloop, batch_format="pyarrow")
        ),
        f"{prefix}_e0",
    )
    return active, edges


def scc(sf_dir: str, _pre=None):
    """Strongly connected components of the directed link graph by
    iterative FORWARD-BACKWARD COLORING (Fleischer/Hendrickson/Pinar
    FW-BW, Orzan's coloring — both public), with POINTER JUMPING
    (Shiloach-Vishkin style label shortcutting) so each min-label
    fixpoint needs O(log diameter) rounds instead of O(diameter).

    Per outer round over the unassigned subgraph:

      F-phase   F(v) = min page id forward-reachable from v, by min-label
                propagation along out-edges. Every color value c is a
                root (F(c) = c: if c reached a smaller w, its reachers
                would too) and equals its class's minimum member id.
      B-phase   over the edges RESTRICTED to one color class
                (F(src) == F(dst)): B(v) = min class id that reaches v,
                same min-label propagation along IN-edges. Membership:
                v ∈ SCC(c)  ⟺  F(v) = c (v →* c)  AND  B(v) = c
                (c →* v within the class — sound because every node of a
                cycle through c carries color c).
      peel      assign (page_id, scc_id = F), drop assigned nodes/edges,
                repeat — each round clears at least every source SCC of
                the condensation (_SCC_MAX_ROUNDS cap, fail-loud).

    Pointer jumping is sound for reachability min-labels: the current
    label F(v) is itself reachable from v, so F(F(v)) is too — each
    iteration unions the edge contributions with one label-on-label
    lookup, doubling the effective horizon.

    scc_id is the component's minimum page id — a pure function of the
    graph, bit-identical under any block structure (pinned vs a
    sequential Tarjan in tests). Fixpoint detection is O(1) on the
    driver: min-propagation only lowers labels, so equal int64 label
    SUMS ⟺ pointwise equality (the k_core count device).

    Shape (100 TB bar): each fixpoint iteration is two Arrow
    lookup_joins (labels onto edges; labels onto labels) + ONE grouped
    min + a re-pin (parquet spill at scale via WWX_PIN_MODE); self-loop
    rows make the node's own label ride the edge join (the hyperanf
    device). Peeling is two unique-keyed semi-joins (the k_core
    device). Nothing corpus-sized touches the driver."""
    import pyarrow.compute as pc

    from osmwaterwayextractor_ray.stages.fastagg import grouped_agg, lookup_join

    n_docs = _n_docs(sf_dir)
    e_schema = pa.schema([("src_page", pa.int64()), ("dst_page", pa.int64())])
    lab_schema = pa.schema([("page_id", pa.int64()), ("F", pa.int64())])
    act_schema = pa.schema([("page_id", pa.int64())])

    if _pre is not None:
        # caller (bowtie) already pinned the (active, self-looped edge)
        # pair — reuse instead of re-running the extraction
        active, edges = _pre
    else:
        active, edges = _scc_inputs(sf_dir, n_docs)

    int_sum = _int_sum
    min_labels = _min_label_fixpoint

    def as_labels(ds):
        return ds.map_batches(
            lambda t: pa.table({"page_id": t["page_id"], "lab": t["page_id"]}),
            batch_format="pyarrow",
        )

    assigned = []
    for rnd in range(_SCC_MAX_ROUNDS):
        # one pinned (page_id, lab=page_id) seed table feeds BOTH phases
        lab0 = pin(as_labels(active), f"scc_L0_r{rnd}")
        # F-phase: min forward-reachable id (labels flow dst -> src)
        F = min_labels(lab0, edges, "out", f"scc_F_r{rnd}")
        F = F.map_batches(
            lambda t: t.rename_columns(["page_id", "F"]), batch_format="pyarrow"
        )

        # class-restricted edges: keep (v,u) with F(v) == F(u)
        withF = lookup_join(
            edges, F, "src_page", "page_id", {"F": "f_src"},
            num_parts=8, left_schema=e_schema, right_schema=lab_schema,
        )
        from osmwaterwayextractor_ray.stages.fastagg import joined_schema

        withF = lookup_join(
            withF, F, "dst_page", "page_id", {"F": "f_dst"},
            num_parts=8,
            left_schema=joined_schema(edges, F, {"F": "f_src"}),
            right_schema=lab_schema,
        )
        cedges = pin(
            withF.map_batches(
                lambda t: t.filter(pc.equal(t["f_src"], t["f_dst"])).select(
                    ["src_page", "dst_page"]
                ),
                batch_format="pyarrow",
            ),
            f"scc_ce_r{rnd}",
        )

        # B-phase: min class id reaching v (labels flow src -> dst)
        B = min_labels(lab0, cedges, "in", f"scc_B_r{rnd}")

        # membership: F(v) == B(v) == the class color
        FB = lookup_join(
            F, B, "page_id", "page_id", {"lab": "B"},
            num_parts=8, left_schema=lab_schema,
            right_schema=pa.schema([("page_id", pa.int64()), ("lab", pa.int64())]),
        )
        FB = pin(FB, f"scc_fb_r{rnd}")
        done = pin(
            FB.map_batches(
                lambda t: t.filter(pc.equal(t["F"], t["B"]))
                .select(["page_id", "F"])
                .rename_columns(["page_id", "scc_id"]),
                batch_format="pyarrow",
            ),
            f"scc_done_r{rnd}",
        )
        assigned.append(done)
        active = pin(
            FB.map_batches(
                lambda t: t.filter(pc.invert(pc.equal(t["F"], t["B"]))).select(
                    ["page_id"]
                ),
                batch_format="pyarrow",
            ),
            f"scc_act{rnd + 1}",
        )
        if active.count() == 0:
            out = assigned[0]
            for d in assigned[1:]:
                out = out.union(d)
            return out
        # surviving edges: both endpoints active (self-loops survive too)
        e1 = lookup_join(
            edges, active, "src_page", "page_id", {"page_id": "__a"},
            num_parts=8, left_schema=e_schema, right_schema=act_schema,
        ).map_batches(lambda t: t.select(["src_page", "dst_page"]), batch_format="pyarrow")
        edges = pin(
            lookup_join(
                e1, active, "dst_page", "page_id", {"page_id": "__b"},
                num_parts=8, left_schema=e_schema, right_schema=act_schema,
            ).map_batches(
                lambda t: t.select(["src_page", "dst_page"]), batch_format="pyarrow"
            ),
            f"scc_e{rnd + 1}",
        )

    raise ValueError(f"scc: condensation deeper than {_SCC_MAX_ROUNDS} peel rounds")


# Exact twin: recursive transitive closure (fine at oracle scale — the
# driver compares at <= 500 docs, closure <= n^2 pairs), mutual
# reachability, scc_id = min(self, min mutual partner).
SCC_SQL = f"""
WITH RECURSIVE {_EDGES_CTE},
reach(v, u) AS (
  SELECT src_page AS v, dst_page AS u FROM edges
  UNION
  SELECT r.v, e.dst_page FROM reach r JOIN edges e ON e.src_page = r.u
),
mutual AS (
  SELECT a.v AS page_id, MIN(a.u) AS mn
  FROM reach a JOIN reach b ON b.v = a.u AND b.u = a.v
  GROUP BY a.v
)
SELECT d.doc_id AS page_id,
       CAST(LEAST(d.doc_id, COALESCE(m.mn, d.doc_id)) AS BIGINT) AS scc_id
FROM documents d
LEFT JOIN mutual m ON m.page_id = d.doc_id
"""


# ---------------------------------------------------------------------------
# bow-tie decomposition (wave 30)
# ---------------------------------------------------------------------------


def bowtie(sf_dir: str):
    """Bow-tie decomposition of the link graph (Broder et al. 2000 "Graph
    structure in the Web"): CORE = the largest SCC (ties broken by min
    scc_id), IN = pages that reach the core but are not in it, OUT =
    pages the core reaches, OTHER = tendrils + disconnected. Returns
    (component, n_pages), the classic 4-row web-graph audit.

    Plan: scc() gives (page_id, scc_id = min member id). The two
    reachability tests reuse _min_label_fixpoint with a VIRTUAL node -1:
    since the core is strongly connected, a single edge core_id -> -1
    makes "v reaches the core" equivalent to "min id reaching -1 test"
    along the 'out' direction (min forward-reachable id == -1), and a
    single edge -1 -> core_id makes "core reaches v" the mirror test
    along 'in'. Both runs keep labels = node ids, so pointer jumping
    stays sound (-1 carries a self-loop). Classification is two
    lookup_joins + one vectorized case; output is an O(4) grouped count.

    100 TB shape: inherits scc's per-iteration two-lookup_join + grouped
    min + re-pin contract (parquet spill via WWX_PIN_MODE); the size
    top-1 is per-block partial + O(blocks) driver rows (sound — scc_id
    is unique per block after the keyed grouped_agg)."""
    import pyarrow.compute as pc
    import ray

    from osmwaterwayextractor_ray.stages.fastagg import grouped_agg, lookup_join
    from osmwaterwayextractor_ray.stages.pin import pin

    n_docs = _n_docs(sf_dir)
    active, sl_edges = _scc_inputs(sf_dir, n_docs, prefix="bt")
    sccs = pin(scc(sf_dir, _pre=(active, sl_edges)), "bt_scc")

    # largest SCC: per-block partial top-1 by (n desc, scc_id asc)
    sizes = grouped_agg(
        sccs.map_batches(
            lambda t: pa.table(
                {
                    "scc_id": t["scc_id"],
                    "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                }
            ),
            batch_format="pyarrow",
        ),
        ["scc_id"],
        {"n": ("one", "sum")},
        num_parts=8,
    )

    def top1(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"scc_id": pa.array([], type=pa.int64()),
                 "n": pa.array([], type=pa.int64())}
            )
        sid = t.column("scc_id").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False)
        i = np.lexsort((sid, -n))[0]
        return pa.table(
            {"scc_id": pa.array([sid[i]], type=pa.int64()),
             "n": pa.array([n[i]], type=pa.int64())}
        )

    cand = sizes.map_batches(top1, batch_format="pyarrow").to_pandas()
    i = np.lexsort((cand["scc_id"].to_numpy(), -cand["n"].to_numpy()))[0]
    core_id = int(cand["scc_id"].iloc[i])

    virtual = ray.data.from_arrow(
        pa.table(
            {"src_page": pa.array([-1], type=pa.int64()),
             "dst_page": pa.array([-1], type=pa.int64())}
        )
    )
    # sl_edges already carries the per-page self-loops scc needs; only the
    # virtual node's self-loop is new
    base_edges = pin(sl_edges.union(virtual), "bt_ev")
    lab0 = pin(
        active.map_batches(
            lambda t: pa.table({"page_id": t["page_id"], "lab": t["page_id"]}),
            batch_format="pyarrow",
        ).union(
            ray.data.from_arrow(
                pa.table(
                    {"page_id": pa.array([-1], type=pa.int64()),
                     "lab": pa.array([-1], type=pa.int64())}
                )
            )
        ),
        "bt_lab0",
    )

    def vedge(src: int, dst: int):
        return ray.data.from_arrow(
            pa.table(
                {"src_page": pa.array([src], type=pa.int64()),
                 "dst_page": pa.array([dst], type=pa.int64())}
            )
        )

    # v reaches core  ⟺  min forward-reachable id == -1 (edge core -> -1)
    minF = _min_label_fixpoint(
        lab0, base_edges.union(vedge(core_id, -1)), "out", "bt_F"
    )
    # core reaches v  ⟺  min id reaching v == -1 (edge -1 -> core)
    minB = _min_label_fixpoint(
        lab0, base_edges.union(vedge(-1, core_id)), "in", "bt_B"
    )

    withF = lookup_join(
        sccs, minF, "page_id", "page_id", {"lab": "f"},
        num_parts=8,
        left_schema=pa.schema([("page_id", pa.int64()), ("scc_id", pa.int64())]),
        right_schema=_L_SCHEMA,
    )
    withFB = lookup_join(
        withF, minB, "page_id", "page_id", {"lab": "b"},
        num_parts=8,
        left_schema=pa.schema(
            [("page_id", pa.int64()), ("scc_id", pa.int64()), ("f", pa.int64())]
        ),
        right_schema=_L_SCHEMA,
    )

    def classify(t: pa.Table) -> pa.Table:
        sid = t.column("scc_id").to_numpy(zero_copy_only=False)
        f = t.column("f").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        comp = np.where(
            sid == core_id,
            "core",
            np.where(f == -1, "in", np.where(b == -1, "out", "other")),
        )
        return pa.table(
            {
                "component": pa.array(comp.tolist(), type=pa.string()),
                "one": pa.array(np.ones(len(sid), dtype=np.int64)),
            }
        )

    return grouped_agg(
        withFB.map_batches(classify, batch_format="pyarrow"),
        ["component"],
        {"n_pages": ("one", "sum")},
        num_parts=4,
    )


BOWTIE_SQL = f"""
WITH RECURSIVE {_EDGES_CTE},
reach(v, u) AS (
  SELECT src_page AS v, dst_page AS u FROM edges
  UNION
  SELECT r.v, e.dst_page FROM reach r JOIN edges e ON e.src_page = r.u
),
mutual AS (
  SELECT a.v AS page_id, MIN(a.u) AS mn
  FROM reach a JOIN reach b ON b.v = a.u AND b.u = a.v
  GROUP BY a.v
),
sccs AS (
  SELECT d.doc_id AS page_id,
         LEAST(d.doc_id, COALESCE(m.mn, d.doc_id)) AS scc_id
  FROM documents d LEFT JOIN mutual m ON m.page_id = d.doc_id
),
core AS (
  SELECT scc_id FROM sccs GROUP BY scc_id
  ORDER BY count(*) DESC, scc_id LIMIT 1
),
cls AS (
  SELECT s.page_id,
         CASE
           WHEN s.scc_id = core.scc_id THEN 'core'
           WHEN EXISTS (
             SELECT 1 FROM reach r JOIN sccs t ON t.page_id = r.u
             WHERE r.v = s.page_id AND t.scc_id = core.scc_id
           ) THEN 'in'
           WHEN EXISTS (
             SELECT 1 FROM reach r JOIN sccs t ON t.page_id = r.v
             WHERE r.u = s.page_id AND t.scc_id = core.scc_id
           ) THEN 'out'
           ELSE 'other'
         END AS component
  FROM sccs s CROSS JOIN core
)
SELECT component, CAST(count(*) AS BIGINT) AS n_pages
FROM cls GROUP BY component
"""


# ---------------------------------------------------------------------------
# co-citation similarity (wave 32)
# ---------------------------------------------------------------------------

_CC_MIN = 2  # emit pairs co-cited by at least this many pages


def co_citation(sf_dir: str):
    """Co-citation similarity (Small 1973; the "related pages" signal):
    two pages are co-cited once per page that links BOTH. Returns
    (page_a, page_b, n_common) with page_a < page_b and n_common >=
    _CC_MIN — the classic bibliometric couple of the link graph.

    Plan: every linker's out-list yields its unordered dst pairs
    (``bucketed_pairs`` — the LSH candidate primitive, grouped by
    src_page), and ONE ``pair_counts`` shuffle sums multiplicities:
    n_common IS the co-citation count. Out-degree bounds the per-group
    pair fan-out (the synthesized graph's fan-out is O(_LINK_RULES)), so
    no all-pairs stage exists; at 100 TB a max_group stop-band guards
    viral hub linkers the same way the near-dup plans guard stop
    shingles."""
    import pyarrow.compute as pc

    from osmwaterwayextractor_ray.stages.fastagg import bucketed_pairs, pair_counts

    n_docs = _n_docs(sf_dir)
    pairs = bucketed_pairs(
        _edge_list(sf_dir, n_docs),
        ["src_page"],
        "dst_page",
        "page_a",
        "page_b",
        num_parts=16,
    )
    counted = pair_counts(pairs, "page_a", "page_b", "n_common", num_parts=16)
    return counted.map_batches(
        lambda t: t.filter(pc.greater_equal(t["n_common"], _CC_MIN)),
        batch_format="pyarrow",
    )


CO_CITATION_SQL = f"""
WITH {_EDGES_CTE}
SELECT e1.dst_page AS page_a, e2.dst_page AS page_b,
       CAST(count(*) AS BIGINT) AS n_common
FROM edges e1 JOIN edges e2
  ON e1.src_page = e2.src_page AND e1.dst_page < e2.dst_page
GROUP BY 1, 2
HAVING count(*) >= {_CC_MIN}
"""


# ---------------------------------------------------------------------------
# effective diameter (wave 37)
# ---------------------------------------------------------------------------

_ED_NUM, _ED_DEN = 9, 10  # 90th-percentile effective diameter


def effective_diameter(sf_dir: str):
    """Effective diameter of the link graph (Boldi–Rosa–Vigna): the
    interpolated hop count at which the HyperANF neighborhood function
    reaches 90% of its final value — THE one-number connectivity summary
    a crawl audit wants. Derived entirely from hyperanf()'s O(hops)
    output rows; the interpolation runs in exact integer micro-units
    (nf_est · 1e6 is integral by hyperanf's quantization contract, and
    the fraction is one truncating division), so the result is as
    deterministic as the sketch itself. Returns one row
    (eff_diameter_micro, nf_final_micro, n_nodes).

    Sketch-defined (no SQL twin — rows-only in the driver); pinned
    against exact BFS effective diameters in tests."""
    from osmwaterwayextractor_ray.pipelines.relational3 import _trunc_div

    anf = hyperanf(sf_dir).to_pandas().sort_values("t")
    nf_micro = [int(round(v * 1e6)) for v in anf["nf_est"]]
    n_nodes = int(anf["n_nodes"].iloc[0])
    target_num = _ED_NUM * nf_micro[-1]  # compare via cross-multiplication
    d_micro = len(nf_micro) - 1
    d_micro *= 1_000_000
    for h, cur in enumerate(nf_micro):
        if _ED_DEN * cur >= target_num:
            if h == 0:
                d_micro = 0
                break
            prev = nf_micro[h - 1]
            num = target_num - _ED_DEN * prev
            den = _ED_DEN * (cur - prev)
            frac = _trunc_div(num * 1_000_000, den) if den else 0
            d_micro = (h - 1) * 1_000_000 + frac
            break
    return pa.table(
        {
            "eff_diameter_micro": pa.array([d_micro], type=pa.int64()),
            "nf_final_micro": pa.array([nf_micro[-1]], type=pa.int64()),
            "n_nodes": pa.array([n_nodes], type=pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# degree assortativity (wave 44)
# ---------------------------------------------------------------------------


def degree_assortativity(sf_dir: str):
    """Degree-correlation audit of the link graph (Newman 2002): over
    all directed edges (u, v), the least-squares slope of in-degree(v)
    on out-degree(u) — positive slope = assortative (hubs link hubs),
    negative = disassortative (the usual web shape). Exact normal
    equations (the price_model device): five int64 moment partials over
    the degree-attached edge list, big-int Cramer on the driver, one
    truncating division per coefficient. Returns one row (n_edges,
    slope_micro, intercept_micro).

    Shape: two grouped degree counts + two lookup_joins attach the
    degrees to the edges (all skinny int columns); the moments reach the
    driver as O(blocks) rows."""
    from osmwaterwayextractor_ray.pipelines.relational3 import _trunc_div
    from osmwaterwayextractor_ray.stages.fastagg import grouped_agg, lookup_join
    from osmwaterwayextractor_ray.stages.pin import pin

    n_docs = _n_docs(sf_dir)
    edges = pin(_edge_list(sf_dir, n_docs), "da_edges")

    def deg(col: str, name: str):
        return grouped_agg(
            edges.map_batches(
                lambda t, _c=col: pa.table(
                    {
                        "page_id": t[_c],
                        "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                    }
                ),
                batch_format="pyarrow",
            ),
            ["page_id"],
            {name: ("one", "sum")},
            num_parts=8,
        )

    outdeg = deg("src_page", "od")
    indeg = deg("dst_page", "idg")
    e_schema = pa.schema([("src_page", pa.int64()), ("dst_page", pa.int64())])
    withx = lookup_join(
        edges, outdeg, "src_page", "page_id", {"od": "x"},
        num_parts=8, left_schema=e_schema,
        right_schema=pa.schema([("page_id", pa.int64()), ("od", pa.int64())]),
    )
    withxy = lookup_join(
        withx, indeg, "dst_page", "page_id", {"idg": "y"},
        num_parts=8,
        left_schema=pa.schema(
            [("src_page", pa.int64()), ("dst_page", pa.int64()), ("x", pa.int64())]
        ),
        right_schema=pa.schema([("page_id", pa.int64()), ("idg", pa.int64())]),
    )

    def moments(t: pa.Table) -> pa.Table:
        x = t.column("x").to_numpy(zero_copy_only=False)
        y = t.column("y").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n": pa.array([len(x)], type=pa.int64()),
                "sx": pa.array([int(x.sum())], type=pa.int64()),
                "sy": pa.array([int(y.sum())], type=pa.int64()),
                "sxx": pa.array([int((x * x).sum())], type=pa.int64()),
                "sxy": pa.array([int((x * y).sum())], type=pa.int64()),
            }
        )

    parts = withxy.map_batches(moments, batch_format="pyarrow").take_all()
    n = sum(int(p["n"]) for p in parts)
    sx = sum(int(p["sx"]) for p in parts)
    sy = sum(int(p["sy"]) for p in parts)
    sxx = sum(int(p["sxx"]) for p in parts)
    sxy = sum(int(p["sxy"]) for p in parts)
    den = n * sxx - sx * sx
    if den == 0:
        # constant out-degree design: the slope is undefined, not an
        # error — report NULL coefficients (the sf0.1 synthesized graph
        # IS constant-out-degree; the SQL twin's NULLIF matches)
        return pa.table(
            {
                "n_edges": pa.array([n], type=pa.int64()),
                "slope_micro": pa.array([None], type=pa.int64()),
                "intercept_micro": pa.array([None], type=pa.int64()),
            }
        )
    return pa.table(
        {
            "n_edges": pa.array([n], type=pa.int64()),
            "slope_micro": pa.array(
                [_trunc_div((n * sxy - sx * sy) * 1_000_000, den)], type=pa.int64()
            ),
            "intercept_micro": pa.array(
                [_trunc_div((sxx * sy - sx * sxy) * 1_000_000, den)],
                type=pa.int64(),
            ),
        }
    )


DEGREE_ASSORTATIVITY_SQL = f"""
WITH {_EDGES_CTE},
od AS (SELECT src_page, count(*) AS x FROM edges GROUP BY 1),
idg AS (SELECT dst_page, count(*) AS y FROM edges GROUP BY 1),
j AS (
  SELECT CAST(od.x AS BIGINT) AS x, CAST(idg.y AS BIGINT) AS y
  FROM edges e JOIN od ON od.src_page = e.src_page
  JOIN idg ON idg.dst_page = e.dst_page
),
s AS (
  SELECT CAST(count(*) AS HUGEINT) AS n, CAST(sum(x) AS HUGEINT) AS sx,
         CAST(sum(y) AS HUGEINT) AS sy, CAST(sum(x * x) AS HUGEINT) AS sxx,
         CAST(sum(x * y) AS HUGEINT) AS sxy
  FROM j
)
SELECT CAST(n AS BIGINT) AS n_edges,
       CAST(((n * sxy - sx * sy) * 1000000) // NULLIF(n * sxx - sx * sx, 0)
            AS BIGINT) AS slope_micro,
       CAST(((sxx * sy - sx * sxy) * 1000000) // NULLIF(n * sxx - sx * sx, 0)
            AS BIGINT) AS intercept_micro
FROM s
"""
