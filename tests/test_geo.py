"""Geo (LatLonPoint) + IP (InetAddressPoint) query family.

Parity anchors: GeoEncodingUtils.kt quantization invariants (the reference's
TestGeoEncodingUtils round-trips), LatLonPoint.kt box construction rules,
EdgeTree.kt pnpoly crossing semantics (on-edge contained, holes subtracted),
InetAddressPoint.kt encoding + TestInetAddressPoint's 1.2.3.4 scenarios.
End-to-end oracle = brute-force pandas over the same synthetic table.
"""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_kmp_spark.search import geo
from lucene_kmp_spark.search.query import (
    InetAddressRangeQuery,
    LatLonBoxQuery,
    LatLonDistanceFeatureQuery,
    LatLonDistanceQuery,
    LatLonPolygonQuery,
)
from lucene_kmp_spark.search.geo import GeoPolygon

RNG = np.random.default_rng(20260818)


# ---------------------------------------------------------------------------
# encoding
# ---------------------------------------------------------------------------


def test_encode_extremes():
    # the 90/180 values are not representable: they map to the max encodable
    assert geo.encode_latitude(90.0) == 2**31 - 1
    assert geo.encode_latitude(-90.0) == -(2**31)
    assert geo.encode_longitude(180.0) == 2**31 - 1
    assert geo.encode_longitude(-180.0) == -(2**31)
    assert geo.encode_latitude(0.0) == 0
    assert geo.encode_longitude(0.0) == 0


def test_encode_decode_roundtrip_randomized():
    # TestGeoEncodingUtils-style: decode(encode(x)) is a fixpoint and within
    # one quantum below x (floor quantization)
    lats = RNG.uniform(-90, 90, 2000)
    for lat in lats:
        e = geo.encode_latitude(float(lat))
        d = geo.decode_latitude(e)
        assert geo.encode_latitude(d) == e  # fixpoint
        assert d <= lat and lat - d < geo.LAT_DECODE * 1.0000001
    lons = RNG.uniform(-180, 180, 2000)
    for lon in lons:
        e = geo.encode_longitude(float(lon))
        d = geo.decode_longitude(e)
        assert geo.encode_longitude(d) == e
        assert d <= lon and lon - d < geo.LON_DECODE * 1.0000001


def test_encode_ceil_relationship():
    for lat in RNG.uniform(-90, 90, 500):
        lo, hi = geo.encode_latitude(float(lat)), geo.encode_latitude_ceil(float(lat))
        assert hi - lo in (0, 1)
        # ceil == floor exactly when lat is on the grid
        if hi == lo:
            assert geo.decode_latitude(lo) == pytest.approx(lat, abs=1e-12)


def test_encode_col_matches_scalar(spark):
    vals = [float(v) for v in RNG.uniform(-90, 90, 300)] + [90.0, -90.0, 0.0]
    df = spark.createDataFrame([(v,) for v in vals], "lat double")
    got = [r[0] for r in df.select(geo.encode_lat_col(F.col("lat"))).collect()]
    assert got == [geo.encode_latitude(v) for v in vals]
    lons = [float(v) for v in RNG.uniform(-180, 180, 300)] + [180.0, -180.0]
    df = spark.createDataFrame([(v,) for v in lons], "lon double")
    got = [r[0] for r in df.select(geo.encode_lon_col(F.col("lon"))).collect()]
    assert got == [geo.encode_longitude(v) for v in lons]


# ---------------------------------------------------------------------------
# haversine + circle bbox
# ---------------------------------------------------------------------------


def test_haversine_basics():
    assert geo.haversin_meters(48.0, 2.0, 48.0, 2.0) == 0.0
    # quarter circumference: pole to equator along a meridian
    q = geo.haversin_meters(0.0, 0.0, 90.0, 0.0)
    assert q == pytest.approx(math.pi / 2 * geo.EARTH_MEAN_RADIUS_METERS, rel=1e-12)
    # symmetric
    assert geo.haversin_meters(10, 20, -30, 150) == geo.haversin_meters(-30, 150, 10, 20)


def test_circle_bbox_is_conservative():
    for _ in range(200):
        lat = float(RNG.uniform(-85, 85))
        lon = float(RNG.uniform(-175, 175))
        radius = float(RNG.uniform(1e3, 2e6))
        mn_lat, mx_lat, mn_lon, mx_lon = geo.circle_bbox(lat, lon, radius)
        pts_lat = RNG.uniform(-90, 90, 300)
        pts_lon = RNG.uniform(-180, 180, 300)
        for plat, plon in zip(pts_lat, pts_lon):
            if geo.haversin_meters(plat, plon, lat, lon) <= radius:
                assert mn_lat <= plat <= mx_lat
                if (mn_lon, mx_lon) != (-180.0, 180.0):
                    assert mn_lon <= plon <= mx_lon


# ---------------------------------------------------------------------------
# pnpoly
# ---------------------------------------------------------------------------


def _naive_inside(x, y, px, py):
    """Independent ray-cast formulation (different arithmetic shape)."""
    n = len(px)
    inside = False
    j = n - 1
    for i in range(n):
        if (py[i] > y) != (py[j] > y):
            if x < (px[j] - px[i]) * (y - py[i]) / (py[j] - py[i]) + px[i]:
                inside = not inside
        j = i
    return inside


def test_pnpoly_random_vs_naive():
    # star-ish concave polygon
    ang = np.linspace(0, 2 * math.pi, 11)[:-1]
    r = np.where(np.arange(10) % 2 == 0, 10.0, 4.0)
    px, py = r * np.cos(ang), r * np.sin(ang)
    xs = RNG.uniform(-12, 12, 5000)
    ys = RNG.uniform(-12, 12, 5000)
    got = geo._pnpoly_states(xs, ys, px, py)
    for x, y, g in zip(xs, ys, got):
        assert bool(g > 0) == _naive_inside(x, y, px, py)


def test_pnpoly_on_edge_and_vertex():
    px = np.array([0.0, 10.0, 10.0, 0.0])
    py = np.array([0.0, 0.0, 10.0, 10.0])
    # midpoints of each edge, vertices, interior, exterior
    xs = np.array([5.0, 10.0, 5.0, 0.0, 0.0, 5.0, 15.0, 5.0])
    ys = np.array([0.0, 5.0, 10.0, 5.0, 0.0, 5.0, 5.0, -0.1])
    states = geo._pnpoly_states(xs, ys, px, py)
    assert list(states[:5]) == [2, 2, 2, 2, 2]  # edges + vertex ON_EDGE
    assert states[5] == 1  # interior
    assert states[6] == 0 and states[7] == 0  # exterior


def test_polygon_holes():
    outer = GeoPolygon(lats=(0.0, 0.0, 10.0, 10.0), lons=(0.0, 10.0, 10.0, 0.0))
    hole = GeoPolygon(lats=(4.0, 4.0, 6.0, 6.0), lons=(4.0, 6.0, 6.0, 4.0))
    poly = GeoPolygon(outer.lats, outer.lons, holes=(hole,))
    lats = np.array([5.0, 2.0, 4.0, 11.0])
    lons = np.array([5.0, 2.0, 5.0, 5.0])
    got = geo.polygon_contains(lats, lons, poly)
    # center is inside the hole -> excluded; on hole edge -> excluded
    # (Polygon2D.kt:62-67: holes.contains includes its boundary)
    assert list(got) == [False, True, False, False]


# ---------------------------------------------------------------------------
# InetAddressPoint
# ---------------------------------------------------------------------------


def test_inet_encode():
    assert geo.encode_inet("1.2.3.4") == bytes(10) + b"\xff\xff" + bytes([1, 2, 3, 4])
    assert geo.encode_inet("::1")[-1] == 1 and len(geo.encode_inet("::1")) == 16
    assert geo.encode_inet("fec0::f66d") == bytes.fromhex("fec0000000000000000000000000f66d")


def test_inet_prefix_range():
    # TestInetAddressPoint.testBasics: 1.2.3.4/24 contains 1.2.3.4
    lo, up = geo.inet_prefix_range("1.2.3.4", 24)
    assert lo == geo.encode_inet("1.2.3.0") and up == geo.encode_inet("1.2.3.255")
    assert lo <= geo.encode_inet("1.2.3.4") <= up
    lo, up = geo.inet_prefix_range("1.2.3.4", 32)
    assert lo == up == geo.encode_inet("1.2.3.4")
    lo, up = geo.inet_prefix_range("1.2.3.4", 0)
    assert lo == geo.encode_inet("0.0.0.0") and up == geo.encode_inet("255.255.255.255")
    # IPv6 /64 (testBasicsV6)
    lo, up = geo.inet_prefix_range("fec0::f66d", 64)
    assert lo == bytes.fromhex("fec0000000000000" + "00" * 8)
    assert up == bytes.fromhex("fec0000000000000" + "ff" * 8)


def test_inet_col_encoding_matches(spark):
    ips = ["1.2.3.4", "0.0.0.0", "255.255.255.255", "10.20.30.40", "192.168.1.1"]
    df = spark.createDataFrame([(ip,) for ip in ips], "ip string")
    got = [bytes(r[0]) for r in df.select(geo.encode_inet_col(F.col("ip"))).collect()]
    assert got == [geo.encode_inet(ip) for ip in ips]


# ---------------------------------------------------------------------------
# end-to-end over an index (docset + scoring parity vs pandas brute force)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def geo_index(spark):
    from lucene_kmp_spark.index import assign_doc_ids, build_index
    from lucene_kmp_spark.search.executor import IndexSearcher

    n = 600
    ids = np.arange(n)
    lats = ((ids * 9973) % 1700) / 10.0 - 85.0
    lons = ((ids * 7919) % 3500) / 10.0 - 175.0
    ips = [f"{10 + i % 190}.{(i * 3) % 256}.{(i * 7) % 256}.{i % 256}" for i in ids]
    rows = [
        (int(i), f"doc {i} point data", float(lats[i]), float(lons[i]), ips[i])
        for i in ids
    ]
    df = spark.createDataFrame(rows, "orig_id long, text string, lat double, lon double, ip string")
    idx = build_index(assign_doc_ids(df, key_cols=("orig_id",)), text_col="text")
    return IndexSearcher(idx), lats, lons, ips


def _ids(searcher, q):
    return sorted(r[0] for r in searcher.execute(q).select("doc_id").collect())


def test_box_query_end_to_end(geo_index):
    s, lats, lons, _ = geo_index
    q = LatLonBoxQuery("lat", "lon", -20.0, 35.5, -60.25, 90.0)
    # brute force on the ENCODED grid, as the reference compares
    lo_lat, hi_lat = geo.encode_latitude_ceil(-20.0), geo.encode_latitude(35.5)
    lo_lon, hi_lon = geo.encode_longitude_ceil(-60.25), geo.encode_longitude(90.0)
    exp = [
        i
        for i in range(len(lats))
        if lo_lat <= geo.encode_latitude(lats[i]) <= hi_lat
        and lo_lon <= geo.encode_longitude(lons[i]) <= hi_lon
    ]
    assert _ids(s, q) == exp


def test_box_query_dateline(geo_index):
    s, lats, lons, _ = geo_index
    q = LatLonBoxQuery("lat", "lon", -80.0, 80.0, 150.0, -150.0)  # crosses dateline
    lo_lat, hi_lat = geo.encode_latitude_ceil(-80.0), geo.encode_latitude(80.0)
    lo_lon, hi_lon = geo.encode_longitude_ceil(150.0), geo.encode_longitude(-150.0)
    exp = [
        i
        for i in range(len(lats))
        if lo_lat <= geo.encode_latitude(lats[i]) <= hi_lat
        and (geo.encode_longitude(lons[i]) >= lo_lon or geo.encode_longitude(lons[i]) <= hi_lon)
    ]
    got = _ids(s, q)
    assert got == exp and len(got) > 0


def test_box_query_degenerate(geo_index):
    s, *_ = geo_index
    assert _ids(s, LatLonBoxQuery("lat", "lon", 90.0, 90.0, -10.0, 10.0)) == []
    assert _ids(s, LatLonBoxQuery("lat", "lon", -10.0, 10.0, 180.0, 180.0)) == []


def test_distance_query_end_to_end(geo_index):
    s, lats, lons, _ = geo_index
    center_lat, center_lon, radius = 12.0, -30.0, 3_000_000.0
    q = LatLonDistanceQuery("lat", "lon", center_lat, center_lon, radius)
    exp = [
        i
        for i in range(len(lats))
        if geo.haversin_meters(
            geo.decode_latitude(geo.encode_latitude(lats[i])),
            geo.decode_longitude(geo.encode_longitude(lons[i])),
            center_lat,
            center_lon,
        )
        <= radius
    ]
    got = _ids(s, q)
    assert got == exp and 0 < len(got) < len(lats)


def test_polygon_query_end_to_end(geo_index):
    s, lats, lons, _ = geo_index
    poly = GeoPolygon(
        lats=(-40.0, -35.0, 20.0, 45.0, 10.0),
        lons=(-100.0, 30.0, 80.0, -20.0, -110.0),
        holes=(GeoPolygon(lats=(-10.0, -10.0, 15.0), lons=(-50.0, 10.0, -20.0)),),
    )
    q = LatLonPolygonQuery("lat", "lon", (poly,))
    dec_lats = np.array([geo.decode_latitude(geo.encode_latitude(v)) for v in lats])
    dec_lons = np.array([geo.decode_longitude(geo.encode_longitude(v)) for v in lons])
    exp_mask = geo.polygon_contains(dec_lats, dec_lons, poly)
    exp = [i for i in range(len(lats)) if exp_mask[i]]
    got = _ids(s, q)
    assert got == exp and 0 < len(got) < len(lats)


def test_distance_feature_scores(geo_index):
    s, lats, lons, _ = geo_index
    q = LatLonDistanceFeatureQuery("lat", "lon", 0.0, 0.0, pivot_meters=1_000_000.0, boost=2.0)
    rows = {r["doc_id"]: r["score"] for r in s.execute(q).collect()}
    assert len(rows) == len(lats)
    for i in (0, 17, 233):
        d = geo.haversin_meters(
            geo.decode_latitude(geo.encode_latitude(lats[i])),
            geo.decode_longitude(geo.encode_longitude(lons[i])),
            0.0,
            0.0,
        )
        assert rows[i] == pytest.approx(2.0 * 1e6 / (1e6 + d), rel=1e-9)


def test_inet_range_and_prefix(geo_index):
    s, _, _, ips = geo_index
    q = InetAddressRangeQuery("ip", "50.0.0.0", "99.255.255.255")
    exp = [i for i, ip in enumerate(ips) if geo.encode_inet("50.0.0.0") <= geo.encode_inet(ip) <= geo.encode_inet("99.255.255.255")]
    assert _ids(s, q) == exp

    qp = InetAddressRangeQuery.prefix("ip", "64.33.7.200", 8)  # 64.0.0.0/8
    exp = [i for i, ip in enumerate(ips) if ip.split(".")[0] == "64"]
    assert _ids(s, qp) == exp


def test_geo_in_boolean_filter(geo_index):
    """Geo queries compose as FILTER clauses like any structured query."""
    from lucene_kmp_spark.search.query import BooleanQuery, TermQuery

    s, lats, lons, _ = geo_index
    box = LatLonBoxQuery("lat", "lon", 0.0, 90.0, -180.0, 180.0)  # northern hemisphere
    q = BooleanQuery.build(must=[TermQuery("point")], filter=[box])
    got = _ids(s, q)
    lo = geo.encode_latitude_ceil(0.0)
    exp = [i for i in range(len(lats)) if geo.encode_latitude(lats[i]) >= lo]
    assert got == exp


# ---------------------------------------------------------------------------
# XY (cartesian) variants
# ---------------------------------------------------------------------------


def test_xy_queries_end_to_end(geo_index):
    from lucene_kmp_spark.search.geo import XYPolygon, xy_polygon_contains
    from lucene_kmp_spark.search.query import XYBoxQuery, XYDistanceQuery, XYPolygonQuery

    s, lats, lons, _ = geo_index
    # reuse lat/lon columns as cartesian x=lon, y=lat (float32-quantized)
    x32 = np.asarray(lons, dtype=np.float32).astype(np.float64)
    y32 = np.asarray(lats, dtype=np.float32).astype(np.float64)

    q = XYBoxQuery("lon", "lat", -60.25, 90.0, -20.0, 35.5)
    exp = [
        i for i in range(len(lats))
        if np.float32(-60.25) <= x32[i] <= np.float32(90.0)
        and np.float32(-20.0) <= y32[i] <= np.float32(35.5)
    ]
    assert _ids(s, q) == exp

    q = XYDistanceQuery("lon", "lat", -30.0, 12.0, 55.0)
    exp = [
        i for i in range(len(lats))
        if (x32[i] - (-30.0)) ** 2 + (y32[i] - 12.0) ** 2 <= 55.0 * 55.0
    ]
    got = _ids(s, q)
    assert got == exp and 0 < len(got) < len(lats)

    poly = XYPolygon(xs=(-100.0, 30.0, 80.0, -20.0), ys=(-40.0, -35.0, 20.0, 45.0))
    q = XYPolygonQuery("lon", "lat", (poly,))
    exp_mask = xy_polygon_contains(x32, y32, poly)
    assert _ids(s, q) == [i for i in range(len(lats)) if exp_mask[i]]


def test_latlonpoint_reference_goldens():
    """Exact decode(encode(x)) values from TestLatLonPoint.kt testToString —
    pins the quantization bit-for-bit against the reference."""
    assert geo.decode_latitude(geo.encode_latitude(18.313694)) == 18.313693958334625
    assert geo.decode_longitude(geo.encode_longitude(-65.227444)) == -65.22744401358068
    # newBoxQuery(18.0, 19.0, -66.0, -65.0) quantized bounds
    assert geo.decode_latitude(geo.encode_latitude_ceil(18.0)) == 18.000000016763806
    assert geo.decode_latitude(geo.encode_latitude(19.0)) == 18.999999999068677
    assert geo.decode_longitude(geo.encode_longitude_ceil(-66.0)) == -65.9999999217689
    assert geo.decode_longitude(geo.encode_longitude(-65.0)) == -65.00000006519258


def test_pnpoly_exact_orient_fallback():
    """GeoUtils.orient exact-arithmetic path (DEVIATIONS #13, closed):
    a point exactly collinear over the RATIONAL values of its doubles must
    register on-edge even when the double determinant rounds away from
    zero; a nearly-collinear point in the rounding band must not."""
    import numpy as np

    from lucene_kmp_spark.search.geo import _pnpoly_states

    # ring around the edge (0,0)-(0.1,0.3); 0.1/0.3 are binary-inexact so
    # the double det of the exact midpoint suffers cancellation
    px = np.array([0.0, 0.1, -1.0])
    py = np.array([0.0, 0.3, 1.0])
    mx, my = np.float64(0.1) / 2, np.float64(0.3) / 2  # exact halving
    # exact rational collinearity holds by construction
    from fractions import Fraction

    assert (Fraction(0.3) * Fraction(float(mx))
            == Fraction(0.1) * Fraction(float(my)))
    state = _pnpoly_states(np.array([float(mx)]), np.array([float(my)]), px, py)
    assert state[0] == 2  # ON_EDGE

    # 1-ulp off the edge: in the double band but exactly NOT collinear
    off = np.nextafter(my, 1.0)
    state2 = _pnpoly_states(np.array([float(mx)]), np.array([off]), px, py)
    assert state2[0] != 2
