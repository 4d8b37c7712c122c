"""Text-analysis kernels for the training-data pipeline surfaces:
tokenization/quality metrics, n-gram language-ID heuristic, shingling,
MinHash, SimHash, winnowing fingerprints.

All deterministic, no RNG at call time (MinHash permutation constants are
drawn once from a fixed-seed generator at import). Tokenization uses an
explicit ASCII-whitespace character class so the DuckDB oracle
(string_split_regex with the same class) has identical semantics.
"""

from __future__ import annotations

import re

import numpy as np

from osmwaterwayextractor_ray.functions.hashing import xxh64, xxh64_windows

_WS_RE = re.compile(r"[ \t\n\r\f\v]+")
_PUNCT_RE = re.compile(r"[.!?,;:]")

# DuckDB-equivalent regex strings (documented for the oracles)
WS_REGEX_SQL = "[ \\t\\n\\r\\f\\v]+"
PUNCT_REGEX_SQL = "[.!?,;:]"


def tokenize(text: str) -> list[str]:
    return [t for t in _WS_RE.split(text) if t]


def token_counts(texts) -> np.ndarray:
    return np.fromiter((len(tokenize(t)) for t in texts), dtype=np.int64, count=len(texts))


# GPT-2-style BPE pretokenizer pattern (Radford et al. 2019), ASCII form
# WITHOUT the trailing-whitespace lookahead — RE2 (the DuckDB oracle's
# engine) has no lookahead, and this exact pattern was verified to
# tokenize identically under Python re and DuckDB regexp_extract_all on
# the full corpus (tests/test_text_functions.py pins agreement).
BPE_PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"
_BPE_RE = re.compile(BPE_PATTERN)


def bpe_token_counts(texts) -> np.ndarray:
    """Tokens per text under the BPE-ish pretokenizer — the
    pre-merge vocabulary unit a byte-pair tokenizer starts from (the
    whitespace `token_counts` is the cheap heuristic twin)."""
    return np.fromiter(
        (len(_BPE_RE.findall(t)) for t in texts), dtype=np.int64, count=len(texts)
    )


def char_counts(texts) -> np.ndarray:
    return np.fromiter((len(t) for t in texts), dtype=np.int64, count=len(texts))


def punct_counts(texts) -> np.ndarray:
    return np.fromiter(
        (len(_PUNCT_RE.findall(t)) for t in texts), dtype=np.int64, count=len(texts)
    )


# ---- language-ID heuristic (stopword profiles) ----

_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for", "was", "with"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "eine", "zu", "den", "von", "mit"},
    "pt": {"de", "que", "e", "o", "a", "do", "da", "em", "um", "para", "com", "não"},
    "es": {"de", "la", "que", "el", "en", "y", "a", "los", "se", "del", "las", "por"},
    "fr": {"de", "la", "le", "et", "les", "des", "en", "un", "du", "une", "que", "est"},
}
_LANGS = sorted(_STOPWORDS)


def langid(text: str) -> str:
    """Highest stopword-hit-ratio language; 'und' when nothing matches.
    Ties resolved by language-code sort order (deterministic)."""
    toks = [t.lower().strip(".,!?;:\"'()") for t in tokenize(text)]
    if not toks:
        return "und"
    best_lang, best = "und", 0
    for lang in _LANGS:
        hits = sum(1 for t in toks if t in _STOPWORDS[lang])
        if hits > best:
            best, best_lang = hits, lang
    return best_lang


# ---- shingles + MinHash ----

_rng = np.random.RandomState(42)
_N_PERM = 64
# Multiply-shift permutations of Z_2^64 (Dietzfelbinger et al., public):
# h_i(x) = a_i * x + b_i with WRAPPING uint64 arithmetic and odd a_i is a
# bijection on the 64-bit space, so taking the min over a set is a valid
# MinHash permutation. The previous family ((a*x32 + b) mod 2^61-1 with
# a < 2^31) was NOT min-wise: for small folded x the product never
# wrapped the modulus, so h was monotone in x across EVERY permutation
# and the min collapsed onto the globally-smallest shingle hash —
# measured 47% signature agreement on a Jaccard-0.93 pair (expect 93%).
_PERM_A = (
    (_rng.randint(0, 1 << 32, size=_N_PERM).astype(np.uint64) << np.uint64(32))
    | _rng.randint(0, 1 << 32, size=_N_PERM).astype(np.uint64)
    | np.uint64(1)
)
_PERM_B = (
    (_rng.randint(0, 1 << 32, size=_N_PERM).astype(np.uint64) << np.uint64(32))
    | _rng.randint(0, 1 << 32, size=_N_PERM).astype(np.uint64)
)


def shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """xxh64 of each k-byte shingle, distinct (sorted), as uint64.
    Vectorized via the sliding-window XXH64 kernel — every consumer
    (MinHash min, Jaccard set ops) is order-independent."""
    data = text.encode("utf-8", "surrogatepass")
    if len(data) < k:
        return np.array([xxh64(data)], dtype=np.uint64)
    return np.unique(xxh64_windows(data, k))


def minhash_signature_from_shingles(sh: np.ndarray) -> np.ndarray:
    """64-permutation MinHash of an already-shingled (uint64 hash) set —
    lets callers that also need the set size shingle exactly once.
    h_i(x) = a_i*x + b_i over wrapping uint64 (odd a_i: a bijection of
    Z_2^64, see _PERM_A)."""
    with np.errstate(over="ignore"):
        h = _PERM_A[:, None] * sh[None, :] + _PERM_B[:, None]
    return h.min(axis=1)


def minhash_signature(text: str, k: int = 5) -> np.ndarray:
    """64-permutation MinHash of the k-byte shingle set (multiply-shift
    permutations of the xxh64 shingle hashes)."""
    return minhash_signature_from_shingles(shingle_hashes(text, k))


def minhash_bands(sig: np.ndarray, n_bands: int = 16) -> list[int]:
    """LSH band keys: xxh64 of each band's bytes (band id salted in)."""
    rows = len(sig) // n_bands
    return [
        xxh64(bytes([b]) + sig[b * rows : (b + 1) * rows].tobytes()) & 0x7FFFFFFFFFFFFFFF
        for b in range(n_bands)
    ]


def jaccard(text_a: str, text_b: str, k: int = 5) -> float:
    sa = set(shingle_hashes(text_a, k).tolist())
    sb = set(shingle_hashes(text_b, k).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


# ---- SimHash ----

def simhash64(text: str) -> int:
    """Classic 64-bit SimHash over whitespace tokens (term-frequency
    weighted)."""
    toks = tokenize(text)
    if not toks:
        return 0
    from collections import Counter

    counts = Counter(toks)
    hs = np.fromiter(
        (xxh64(t.encode("utf-8", "surrogatepass")) for t in counts), dtype=np.uint64,
        count=len(counts),
    )
    cs = np.fromiter(counts.values(), dtype=np.int64, count=len(counts))
    # (n_tok, 64) bit matrix in one unpackbits — same byte/bit order as the
    # previous per-token np.uint64(h).tobytes() loop (little-endian bytes)
    bits = np.unpackbits(hs.view(np.uint8).reshape(-1, 8), axis=1).astype(np.int64)
    acc = ((2 * bits - 1) * cs[:, None]).sum(axis=0)
    out = np.packbits((acc > 0).astype(np.uint8)).tobytes()
    return int.from_bytes(out, "little")


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


# ---- winnowing fingerprints ----

def winnow_fingerprints(text: str, k: int = 8, window: int = 16) -> np.ndarray:
    """Winnowing (Schleimer et al. 2003): min k-gram hash per sliding
    window, deduplicated — a robust document fingerprint set."""
    data = text.encode("utf-8", "surrogatepass")
    n = len(data) - k + 1
    if n <= 0:
        return np.array([xxh64(data)], dtype=np.uint64)
    hashes = xxh64_windows(data, k)
    if n <= window:
        return np.array([hashes.min()], dtype=np.uint64)
    from numpy.lib.stride_tricks import sliding_window_view

    mins = sliding_window_view(hashes, window).min(axis=1)
    return np.unique(mins)


def word_ngram_hashes(text: str | None, n: int = 3) -> np.ndarray:
    """Distinct word n-gram shingle hashes, sorted ascending as uint64.

    Tokenization is a plain single-space split — EXACTLY DuckDB's
    ``string_split(text, ' ')`` (empty tokens from consecutive spaces are
    kept), so the ngram_jaccard oracle can reproduce the shingle sets.
    Each shingle is the chr(31)-joined n tokens hashed with xxh64; two
    shingles are equal iff their strings are equal (modulo the ~2^-64
    xxh64 collision rate — negligible against any real corpus, and the
    choice a 100-TB run makes anyway to avoid shipping strings)."""
    if not text:
        return np.array([], dtype=np.uint64)
    toks = text.split(" ")
    if len(toks) < n:
        return np.array([], dtype=np.uint64)
    sep = "\x1f"
    return np.unique(
        np.fromiter(
            (
                xxh64(sep.join(toks[i : i + n]).encode("utf-8", "surrogatepass"))
                for i in range(len(toks) - n + 1)
            ),
            dtype=np.uint64,
            count=len(toks) - n + 1,
        )
    )


def banded_levenshtein(a_bytes: list, b_bytes: list, d: int) -> np.ndarray:
    """Vectorized banded Levenshtein over UTF-8 BYTE strings: one DP band
    of width 2d+1 per pair, advanced row-synchronously across ALL pairs
    with numpy (the hot loop is max_len x (2d+1) small vector ops — no
    per-pair Python DP). Returns the EXACT distance for every pair whose
    distance is <= d and the clamp d+1 otherwise (clamping cells at d+1
    is sound: cell values along an optimal path never exceed the final
    distance, so paths of cost <= d never touch a clamped cell).

    BYTE semantics deliberately match DuckDB's ``levenshtein`` (measured
    byte-based: levenshtein('e-acute','e') = 2), so SQL oracles can
    reproduce the engine bit-for-bit on any input, ASCII or not."""
    k = len(a_bytes)
    inf = d + 1
    if k == 0:
        return np.empty(0, dtype=np.int64)
    la = np.fromiter((len(x) for x in a_bytes), dtype=np.int64, count=k)
    lb = np.fromiter((len(x) for x in b_bytes), dtype=np.int64, count=k)
    ans = np.full(k, inf, dtype=np.int64)
    live = np.abs(la - lb) <= d
    ans[live & (la == 0)] = lb[live & (la == 0)]  # <= d by the gap filter
    amax = int(la[live].max()) if live.any() else 0
    if amax == 0:
        return ans
    bmax = int(lb[live].max()) if live.any() else 0
    A = np.zeros((k, amax), dtype=np.uint8)
    B = np.zeros((k, max(bmax, 1)), dtype=np.uint8)
    for i, bs in enumerate(a_bytes):
        if live[i] and bs:
            A[i, : len(bs)] = np.frombuffer(bs, dtype=np.uint8)[:amax]
    for i, bs in enumerate(b_bytes):
        if live[i] and bs:
            B[i, : len(bs)] = np.frombuffer(bs, dtype=np.uint8)
    w = 2 * d + 1
    offs = np.arange(-d, d + 1)
    # band-relative row i: P[:, m] = D[i, i + offs[m]] (invalid cells = inf)
    prev = np.full((k, w), inf, dtype=np.int64)
    for m, off in enumerate(offs):  # row 0: D[0, j] = j for 0 <= j <= lb
        if off >= 0:
            prev[:, m] = np.where(off <= lb, min(off, inf), inf)
    zeros = np.zeros(k, dtype=np.uint8)
    pad = np.full(k, inf + 1, dtype=np.int64)
    for i in range(1, amax + 1):
        cur = np.full((k, w), inf, dtype=np.int64)
        arow = A[:, i - 1]
        for m, off in enumerate(offs):
            j = i + off  # scalar: same column offset for every pair
            if j < 0:
                continue
            valid = j <= lb
            if j == 0:
                cur[:, m] = np.where(valid, min(i, inf), inf)
                continue
            bcol = B[:, j - 1] if j <= B.shape[1] else zeros
            diag = prev[:, m] + (arow != bcol)
            up = prev[:, m + 1] + 1 if m + 1 < w else pad
            left = cur[:, m - 1] + 1 if m >= 1 else pad
            v = np.minimum(np.minimum(diag, up), np.minimum(left, inf))
            cur[:, m] = np.where(valid, v, inf)
        fin = live & (la == i)
        if fin.any():
            ans[fin] = cur[fin, (lb - la + d)[fin]]
        prev = cur
    return np.minimum(ans, inf)
