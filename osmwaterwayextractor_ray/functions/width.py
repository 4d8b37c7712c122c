"""Width-tag parser, quirk-for-quirk with the reference.

Reference: ``_parse_width_tags`` (osm_waterway_extractor.py:2607-2641).
Contract (including quirks the tests pin down):
  * empty/missing raw  -> (None, 'none')
  * any raw containing 'm' (after lower+strip) takes the meters branch:
    float(raw.replace('m','').strip()) — so '5 km' -> float('5 k') -> error
    -> None but source stays 'tag'; '5 m' -> 5.0; '5m' -> 5.0
  * 'ft'/'feet' branch (checked only if no 'm'; note 'feet' contains no 'm'
    but does contain... 'feet' has no 'm', ok): value * 0.3048
  * bare number (digits + dots only) -> meters
  * anything else -> None ('tag' source)
  * parsed value <= 0 or > 1000 -> None (still 'tag' source)
"""

from __future__ import annotations

import numpy as np


def parse_width(raw: str) -> tuple[float | None, str]:
    """Single-value parser, a line-for-line behavioral copy of ref :2607-2641."""
    width_m: float | None = None
    source = "none"
    if raw:
        source = "tag"
        try:
            s = raw.lower().strip()
            if "m" in s:
                width_m = float(s.replace("m", "").strip())
            elif "ft" in s or "feet" in s:
                width_m = float(s.replace("ft", "").replace("feet", "").strip()) * 0.3048
            elif s.replace(".", "").isdigit():
                width_m = float(s)
            if width_m is not None and (width_m <= 0 or width_m > 1000):
                width_m = None
        except (ValueError, AttributeError):
            pass
    return width_m, source


def parse_width_batch(raws: "list[str] | np.ndarray") -> tuple[np.ndarray, np.ndarray]:
    """Batch parser with per-batch memoization (width tags repeat heavily:
    a handful of distinct strings per region). Returns (width_m float64
    with NaN for None, width_source object array)."""
    n = len(raws)
    meters = np.full(n, np.nan, dtype=np.float64)
    sources = np.empty(n, dtype=object)
    memo: dict[str, tuple[float | None, str]] = {}
    for i, raw in enumerate(raws):
        raw = raw if isinstance(raw, str) else ("" if raw is None else str(raw))
        hit = memo.get(raw)
        if hit is None:
            hit = parse_width(raw)
            memo[raw] = hit
        w, src = hit
        if w is not None:
            meters[i] = w
        sources[i] = src
    return meters, sources
