"""Geo utilities: marker ordering, antimeridian, distance filters."""
import numpy as np
import pytest

from rupphash_tpu.utils import geo, sunpos


def test_geodesic_known_distance():
    # Helsinki -> Tampere: 161.220 km, bearing 337.110 deg
    # (position_test fixture output)
    d, b = sunpos.geodesic_distance_bearing(60.1699, 24.9384,
                                            61.4978, 23.7610)
    assert d / 1000.0 == pytest.approx(161.220, abs=0.05)
    assert b == pytest.approx(337.110, abs=0.05)


def test_nn_ordering_recovers_line():
    pts = [(0.0, float(i)) for i in [3, 0, 4, 1, 2]]
    order = geo.order_markers(pts, mode="nn")
    assert sorted(order) == list(range(5))

    def plen(o):
        return sum(geo._dist2(pts[o[k]], pts[o[k + 1]]) ** 0.5
                   for k in range(len(o) - 1))
    # start is pinned at index 0 (lon 3); the optimum from there is 5.0
    assert plen(order) <= 5.0 + 1e-9


def test_two_opt_improves_crossing():
    # a square visited in crossing order should come back uncrossed
    pts = [(0.0, 0.0), (1.0, 1.0), (0.0, 1.0), (1.0, 0.0)]
    order = geo.order_markers(pts)
    # path length of result must be <= naive order length
    def plen(o):
        return sum(geo._dist2(pts[o[k]], pts[o[k + 1]]) ** 0.5
                   for k in range(len(o) - 1))
    assert plen(order) <= plen([0, 1, 2, 3]) + 1e-12


def test_chronological_ordering_none_last():
    pts = [(0, 0), (1, 1), (2, 2)]
    order = geo.order_markers(pts, timestamps=[50, None, 10],
                              mode="chronological")
    assert order == [2, 0, 1]


def test_morton_ordering_locality():
    rng = np.random.default_rng(0)
    pts = [(float(la), float(lo))
           for la, lo in rng.uniform([-80, -170], [80, 170], (500, 2))]
    order = geo.order_markers(pts, mode="morton")
    assert sorted(order) == list(range(500))
    # Z-order keeps neighbors close on average vs random order
    def plen(o):
        return sum(geo._dist2(pts[o[k]], pts[o[k + 1]]) ** 0.5
                   for k in range(len(o) - 1))
    assert plen(order) < plen(list(range(500))) * 0.5


def test_antimeridian_unwrap():
    pts = [(10.0, 179.5), (10.0, -179.5), (10.0, 179.0)]
    order = geo.order_markers(pts, mode="nn")
    unwrapped = geo._unwrap_lons(pts)

    def plen(o):
        return sum(geo._dist2(unwrapped[o[k]], unwrapped[o[k + 1]]) ** 0.5
                   for k in range(len(o) - 1))
    # with unwrapping the whole tour spans ~1.5 degrees, not ~359
    assert plen(order) < 5.0
    center, span = geo.fit_bounds(pts)
    assert span[1] < 2.0  # unwrapped span, not ~359 degrees


def test_geo_distance_filter_parse_and_match():
    f = geo.GeoDistanceFilter.parse("distancelonlat:24.9384:60.1699:200")
    assert f is not None
    assert f.matches(61.4978, 23.7610)        # Tampere within 200 km
    assert not f.matches(48.8566, 2.3522)     # Paris not
    locs = {"home": [60.1699, 24.9384]}
    f2 = geo.GeoDistanceFilter.parse("DistanceFrom:home:200",
                                     locations=locs)
    assert f2 is not None and f2.matches(61.4978, 23.7610)
    with pytest.raises(ValueError):
        geo.GeoDistanceFilter.parse("DistanceFrom:nowhere:10")
    assert geo.GeoDistanceFilter.parse("make:Canon") is None


def test_solar_azimuth_morning_is_east():
    """Regression: an inverted NOAA hour-angle mapping mirrored every
    pre-noon azimuth to the west (the validation fixture is a sunset,
    which never caught it)."""
    from datetime import datetime, timezone

    el, az = sunpos.solar_position(
        51.5, -0.1, datetime(2026, 6, 21, 8, 0, tzinfo=timezone.utc))
    assert 80 < az < 120       # morning sun in the east
    assert el > 20
    el2, az2 = sunpos.solar_position(
        51.5, -0.1, datetime(2026, 6, 21, 16, 0, tzinfo=timezone.utc))
    assert 240 < az2 < 280     # afternoon in the west
