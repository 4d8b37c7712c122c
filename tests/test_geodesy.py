"""Geodesy kernels: Vincenty vs published distances, haversine, flat approx,
vectorized polyline lengths."""

import numpy as np
import pytest

from osmwaterwayextractor_ray.functions.geodesy import (
    approximate_m,
    haversine_m,
    polyline_lengths_m,
    vincenty_m,
)

# Published WGS84 geodesic distances (GeographicLib / NGS computations):
#   Paris (48.8566, 2.3522) -> London (51.5074, -0.1278): 343 923 m (±5 m)
#   Flinders Peak -> Buninyong (Vincenty's own 1975 test line):
#     (-37.95103342, 144.42486789) -> (-37.65282114, 143.92649553) = 54 972.271 m
KNOWN = [
    ((-37.95103341666667, 144.42486788888888), (-37.65282113888889, 143.92649552777777), 54972.271, 0.01),
    ((48.8566, 2.3522), (51.5074, -0.1278), 343923.0, 10.0),
    ((0.0, 0.0), (0.0, 1.0), 111319.491, 0.01),   # 1 deg lon on the equator (a * pi/180)
    ((0.0, 0.0), (1.0, 0.0), 110574.389, 0.5),    # 1 deg lat at the equator
]


@pytest.mark.parametrize("c1,c2,expect,tol", KNOWN)
def test_vincenty_known(c1, c2, expect, tol):
    d = vincenty_m(c1[0], c1[1], c2[0], c2[1])
    assert d == pytest.approx(expect, abs=tol)


def test_vincenty_zero_and_symmetry():
    assert vincenty_m(52.5, 13.4, 52.5, 13.4) == 0.0
    a = vincenty_m(52.5, 13.4, 52.51, 13.41)
    b = vincenty_m(52.51, 13.41, 52.5, 13.4)
    assert a == pytest.approx(b, abs=1e-9)
    assert 1000 < a < 2000  # ~1.3 km


def test_haversine_close_to_vincenty_small_scale():
    rng = np.random.default_rng(7)
    lat1 = rng.uniform(-60, 60, 200)
    lon1 = rng.uniform(-170, 170, 200)
    lat2 = lat1 + rng.uniform(-0.05, 0.05, 200)
    lon2 = lon1 + rng.uniform(-0.05, 0.05, 200)
    hv = haversine_m(lat1, lon1, lat2, lon2)
    vc = vincenty_m(lat1, lon1, lat2, lon2)
    # ellipsoidal vs spherical: <0.6% at km scale
    np.testing.assert_allclose(hv, vc, rtol=6e-3, atol=0.5)


def test_approximate_formula():
    # exact formula replication: dx=dlat_rad*111000, dy=dlon_rad*111000*cos(avg)
    import math

    lat1, lon1, lat2, lon2 = 52.5, 13.4, 52.51, 13.41
    dlat = math.radians(lat2) - math.radians(lat1)
    dlon = math.radians(lon2) - math.radians(lon1)
    avg = (math.radians(lat1) + math.radians(lat2)) / 2
    expect = math.sqrt((dlat * 111000) ** 2 + (dlon * 111000 * math.cos(avg)) ** 2)
    assert float(approximate_m(lat1, lon1, lat2, lon2)) == pytest.approx(expect, abs=1e-9)


def test_polyline_lengths_batch():
    # two polylines: 3 pts and 2 pts, plus a singleton
    lats = np.array([52.5, 52.51, 52.52, 0.0, 0.0, 10.0])
    lons = np.array([13.4, 13.41, 13.42, 0.0, 1.0, 10.0])
    offsets = np.array([0, 3, 5, 6])
    out = polyline_lengths_m(lats, lons, offsets)
    d1 = vincenty_m(52.5, 13.4, 52.51, 13.41) + vincenty_m(52.51, 13.41, 52.52, 13.42)
    d2 = vincenty_m(0.0, 0.0, 0.0, 1.0)
    assert out[0] == pytest.approx(d1, abs=1e-6)
    assert out[1] == pytest.approx(d2, abs=1e-6)
    assert out[2] == 0.0
