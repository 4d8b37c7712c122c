"""Width parser quirk table — every branch of ref :2607-2641."""

import math

import numpy as np
import pytest

from osmwaterwayextractor_ray.functions.width import parse_width, parse_width_batch

CASES = [
    ("", None, "none"),
    ("10 m", 10.0, "tag"),
    ("5m", 5.0, "tag"),
    ("5.5 m", 5.5, "tag"),
    ("15 ft", 15 * 0.3048, "tag"),
    ("15 feet", 15 * 0.3048, "tag"),
    ("7", 7.0, "tag"),
    ("0", None, "tag"),       # <=0 rejected
    ("2000", None, "tag"),    # >1000 rejected
    ("5 km", None, "tag"),    # quirk: 'm' branch -> float('5 k') fails
    ("wide", None, "tag"),
    ("-3", None, "tag"),      # '-3'.replace('.','').isdigit() is False
    ("3.5", 3.5, "tag"),
    ("M", None, "tag"),       # lower->'m', float('') fails
    ("1000", 1000.0, "tag"),
    ("1000.1", None, "tag"),
]


@pytest.mark.parametrize("raw,expect_m,expect_src", CASES)
def test_parse_width(raw, expect_m, expect_src):
    m, src = parse_width(raw)
    assert src == expect_src
    if expect_m is None:
        assert m is None
    else:
        assert m == pytest.approx(expect_m)


def test_parse_width_batch_matches_scalar():
    raws = [c[0] for c in CASES]
    meters, sources = parse_width_batch(raws)
    for i, (raw, expect_m, expect_src) in enumerate(CASES):
        assert sources[i] == expect_src
        if expect_m is None:
            assert math.isnan(meters[i])
        else:
            assert meters[i] == pytest.approx(expect_m)
    assert meters.dtype == np.float64
