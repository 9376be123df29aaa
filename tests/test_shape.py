"""Indexed-shape family tests: WKT parsing, tessellation invariants, and
relation queries (INTERSECTS/WITHIN/DISJOINT/CONTAINS) vs naive geometry
computed WITHOUT tessellation — the oracle never shares the code path under
test (TestLatLonShape / BaseShapeTestCase pattern: random shapes, brute
verify)."""

from __future__ import annotations

import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_kmp_spark.search import geo as _geo
from lucene_kmp_spark.search.shape import (
    ShapeBoxQuery,
    ShapeCircleQuery,
    ShapeCollection,
    ShapeLine,
    ShapePoint,
    ShapePolygon,
    ShapePolygonQuery,
    _orient1,
    _signed_area2,
    parse_wkt,
    shape_docset,
    shape_index,
    tessellate,
)

# ------------------------------------------------------------------- WKT


def test_parse_wkt_forms():
    p = parse_wkt("POINT (30 10)")
    assert p == ShapePoint(30.0, 10.0)

    l = parse_wkt("LINESTRING (30 10, 10 30, 40 40)")
    assert isinstance(l, ShapeLine) and l.xs == (30.0, 10.0, 40.0)

    poly = parse_wkt("POLYGON ((35 10, 45 45, 15 40, 10 20, 35 10), (20 30, 35 35, 30 20, 20 30))")
    assert isinstance(poly, ShapePolygon)
    assert len(poly.holes) == 1 and poly.holes[0].xs[0] == 20.0

    mp = parse_wkt("MULTIPOLYGON (((30 20, 45 40, 10 40, 30 20)), ((15 5, 40 10, 10 20, 5 10, 15 5)))")
    assert isinstance(mp, ShapeCollection) and len(mp.shapes) == 2

    env = parse_wkt("ENVELOPE (10, 20, 40, 30)")  # minLon, maxLon, maxLat, minLat
    assert isinstance(env, ShapePolygon)
    assert min(env.ys) == 30.0 and max(env.ys) == 40.0

    gc = parse_wkt("GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 1 1))")
    assert isinstance(gc, ShapeCollection) and len(gc.shapes) == 2


# ----------------------------------------------------------- tessellation


def _enc_ring(xs, ys):
    return [(_geo.encode_longitude(x), _geo.encode_latitude(y)) for x, y in zip(xs, ys)]


def test_tessellate_area_and_flags_convex():
    ring = _enc_ring([0.0, 10.0, 10.0, 0.0], [0.0, 0.0, 10.0, 10.0])
    tris = tessellate(ring, [])
    assert len(tris) == 2
    # all CCW, total area preserved exactly (integer arithmetic)
    total = 0
    boundary = set()
    n = len(ring)
    for i in range(n):
        boundary.add((ring[i], ring[(i + 1) % n]))
        boundary.add((ring[(i + 1) % n], ring[i]))
    for a, b, c, ab, bc, ca in tris:
        assert _orient1(a[0], a[1], b[0], b[1], c[0], c[1]) > 0
        total += (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
        # flags mirror membership in the original edge set
        assert ab == ((a, b) in boundary)
        assert bc == ((b, c) in boundary)
        assert ca == ((c, a) in boundary)
    assert total == _signed_area2(ring)


def test_tessellate_concave_and_random_area():
    # concave "arrow"
    ring = _enc_ring([0.0, 8.0, 4.0, 8.0, 0.0], [0.0, 0.0, 4.0, 8.0, 8.0])
    tris = tessellate(ring, [])
    total = sum(
        (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
        for a, b, c, *_ in tris
    )
    assert total == _signed_area2(ring)

    rnd = random.Random(42)
    for _ in range(25):
        # random convex polygon: points on a circle, dedup after quantization
        k = rnd.randint(3, 9)
        cx, cy = rnd.uniform(-90, 90), rnd.uniform(-40, 40)
        r = rnd.uniform(0.5, 20.0)
        angles = sorted(rnd.uniform(0, 2 * np.pi) for _ in range(k))
        xs = [cx + r * np.cos(t) for t in angles]
        ys = [cy + r * np.sin(t) for t in angles]
        ring = _enc_ring(xs, ys)
        seen = []
        for p in ring:
            if p not in seen:
                seen.append(p)
        if len(seen) < 3:
            continue
        tris = tessellate(ring, [])
        total = sum(
            (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
            for a, b, c, *_ in tris
        )
        assert total == _signed_area2(seen)


def test_tessellate_with_hole_area():
    outer = _enc_ring([0.0, 20.0, 20.0, 0.0], [0.0, 0.0, 20.0, 20.0])
    hole = _enc_ring([5.0, 12.0, 12.0, 5.0], [5.0, 5.0, 12.0, 12.0])
    tris = tessellate(outer, [hole])
    total = sum(
        (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
        for a, b, c, *_ in tris
    )
    # hole ring is CW inside the list -> its area subtracts
    assert total == _signed_area2(outer) - _signed_area2(hole)


# ----------------------------------------------------- naive relation oracle


def _naive_rect_box_relation(ex0, ex1, ey0, ey1, q: ShapeBoxQuery) -> dict:
    """Exact grid relations for an axis-aligned rectangle doc [e*] (encoded)
    vs a box query — pure interval logic, no tessellation."""
    qx0, qx1, qy0, qy1 = q.encoded()
    intersects = ex0 <= qx1 and ex1 >= qx0 and ey0 <= qy1 and ey1 >= qy0
    within = ex0 >= qx0 and ex1 <= qx1 and ey0 >= qy0 and ey1 <= qy1
    contains = ex0 < qx0 and ex1 > qx1 and ey0 < qy0 and ey1 > qy1
    return {
        "INTERSECTS": intersects,
        "DISJOINT": not intersects,
        "WITHIN": within,
        "CONTAINS": contains,
    }


@pytest.fixture(scope="module")
def rect_docs(spark):
    """120 deterministic rectangles as WKT polygons + their encoded bounds."""
    rows = []
    for i in range(120):
        x0 = ((i * 7919) % 3000) / 10.0 - 160.0
        y0 = ((i * 9973) % 1400) / 10.0 - 75.0
        dx = 0.5 + (i % 40) / 4.0
        dy = 0.5 + (i % 25) / 5.0
        x1, y1 = x0 + dx, y0 + dy
        wkt = f"POLYGON (({x0} {y0}, {x1} {y0}, {x1} {y1}, {x0} {y1}, {x0} {y0}))"
        rows.append(
            (
                i,
                wkt,
                _geo.encode_longitude(x0),
                _geo.encode_longitude(x1),
                _geo.encode_latitude(y0),
                _geo.encode_latitude(y1),
            )
        )
    df = spark.createDataFrame(rows, "doc_id long, wkt string, ex0 long, ex1 long, ey0 long, ey1 long")
    return rows, df


@pytest.fixture(scope="module")
def rect_triangles(rect_docs):
    _, df = rect_docs
    t = shape_index(df, "wkt").persist()
    t.count()
    return t


@pytest.mark.parametrize("relation", ["INTERSECTS", "DISJOINT", "WITHIN", "CONTAINS"])
def test_box_relations_vs_interval_oracle(rect_docs, rect_triangles, relation):
    rows, _ = rect_docs
    for box in (
        ShapeBoxQuery(-40.0, 60.0, -30.0, 50.0),
        ShapeBoxQuery(-160.5, -100.0, -75.5, -20.0),
        ShapeBoxQuery(0.25, 1.75, 0.25, 1.75),  # small box: CONTAINS candidates
    ):
        got = {r["doc_id"] for r in shape_docset(rect_triangles, box, relation).collect()}
        want = {
            i for (i, _, ex0, ex1, ey0, ey1) in rows
            if _naive_rect_box_relation(ex0, ex1, ey0, ey1, box)[relation]
        }
        assert got == want, (relation, box, sorted(got ^ want)[:10])


def test_point_and_line_docs_box_relations(spark):
    rows = [
        (0, "POINT (5 5)"),
        (1, "POINT (50 50)"),
        (2, "LINESTRING (0 0, 10 10)"),        # crosses the box
        (3, "LINESTRING (40 40, 60 60)"),      # outside
        (4, "LINESTRING (2 2, 3 3)"),          # fully inside
        (5, "MULTIPOINT (1 1, 90 0)"),          # one in, one out
    ]
    df = spark.createDataFrame(rows, "doc_id long, wkt string")
    tris = shape_index(df, "wkt")
    box = ShapeBoxQuery(0.5, 8.0, 0.5, 8.0)
    hits = {r["doc_id"] for r in shape_docset(tris, box, "INTERSECTS").collect()}
    assert hits == {0, 2, 4, 5}
    within = {r["doc_id"] for r in shape_docset(tris, box, "WITHIN").collect()}
    assert within == {0, 4}
    disjoint = {r["doc_id"] for r in shape_docset(tris, box, "DISJOINT").collect()}
    assert disjoint == {1, 3}


def test_polygon_with_hole_box_relations(spark):
    wkt = "POLYGON ((0 0, 20 0, 20 20, 0 20, 0 0), (6 6, 14 6, 14 14, 6 14, 6 6))"
    df = spark.createDataFrame([(0, wkt)], "doc_id long, wkt string")
    tris = shape_index(df, "wkt")
    # box fully inside the hole: disjoint from the shape
    in_hole = ShapeBoxQuery(8.0, 12.0, 8.0, 12.0)
    assert shape_docset(tris, in_hole, "INTERSECTS").count() == 0
    assert {r["doc_id"] for r in shape_docset(tris, in_hole, "DISJOINT").collect()} == {0}
    # box straddling the hole boundary intersects
    straddle = ShapeBoxQuery(4.0, 8.0, 4.0, 8.0)
    assert {r["doc_id"] for r in shape_docset(tris, straddle, "INTERSECTS").collect()} == {0}
    # box in the solid ring region, strictly inside: shape CONTAINS it
    solid = ShapeBoxQuery(1.0, 4.0, 1.0, 4.0)
    assert {r["doc_id"] for r in shape_docset(tris, solid, "CONTAINS").collect()} == {0}
    # box inside the hole is NOT contained
    assert shape_docset(tris, in_hole, "CONTAINS").count() == 0
    # whole shape within a big box
    big = ShapeBoxQuery(-1.0, 21.0, -1.0, 21.0)
    assert {r["doc_id"] for r in shape_docset(tris, big, "WITHIN").collect()} == {0}


def test_polygon_query_relations(rect_docs, rect_triangles):
    rows, _ = rect_docs
    # convex CCW quad query
    q = ShapePolygonQuery((-60.0, 40.0, 50.0, -70.0), (-40.0, -35.0, 45.0, 40.0))
    got = {r["doc_id"] for r in shape_docset(rect_triangles, q, "INTERSECTS").collect()}
    # naive: rectangle intersects convex polygon — separating-axis on the
    # decoded-double corners with generous sampling fallback
    import itertools

    qxs = [_geo.decode_longitude(_geo.encode_longitude(v)) for v in q.xs]
    qys = [_geo.decode_latitude(_geo.encode_latitude(v)) for v in q.ys]

    def rect_poly_intersects(x0, x1, y0, y1):
        # SAT for convex polygon vs axis-aligned rect (inclusive)
        edges = list(zip(zip(qxs, qys), zip(qxs[1:] + qxs[:1], qys[1:] + qys[:1])))
        axes = [(0.0, 1.0), (1.0, 0.0)] + [
            (-(ey1 - ey0), ex1 - ex0) for (ex0, ey0), (ex1, ey1) in edges
        ]
        rect_pts = list(itertools.product((x0, x1), (y0, y1)))
        poly_pts = list(zip(qxs, qys))
        for axx, axy in axes:
            r = [px * axx + py * axy for px, py in rect_pts]
            p = [px * axx + py * axy for px, py in poly_pts]
            if max(r) < min(p) or max(p) < min(r):
                return False
        return True

    want = set()
    for (i, _, ex0, ex1, ey0, ey1) in rows:
        x0, x1 = _geo.decode_longitude(int(ex0)), _geo.decode_longitude(int(ex1))
        y0, y1 = _geo.decode_latitude(int(ey0)), _geo.decode_latitude(int(ey1))
        if rect_poly_intersects(x0, x1, y0, y1):
            want.add(i)
    assert got == want, sorted(got ^ want)[:10]

    # WITHIN: every rect corner inside the polygon and no edge crossings —
    # for convex queries that's exactly all-corners-inside
    got_w = {r["doc_id"] for r in shape_docset(rect_triangles, q, "WITHIN").collect()}

    def inside_convex(px, py):
        n = len(qxs)
        for i in range(n):
            ex0, ey0 = qxs[i], qys[i]
            ex1, ey1 = qxs[(i + 1) % n], qys[(i + 1) % n]
            if (ex1 - ex0) * (py - ey0) - (ey1 - ey0) * (px - ex0) < 0:
                return False
        return True

    want_w = set()
    for (i, _, ex0, ex1, ey0, ey1) in rows:
        x0, x1 = _geo.decode_longitude(int(ex0)), _geo.decode_longitude(int(ex1))
        y0, y1 = _geo.decode_latitude(int(ey0)), _geo.decode_latitude(int(ey1))
        if all(inside_convex(px, py) for px in (x0, x1) for py in (y0, y1)):
            want_w.add(i)
    assert got_w == want_w, sorted(got_w ^ want_w)[:10]


def test_xy_shape_smoke(spark):
    rows = [(0, "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"), (1, "POINT (10 10)")]
    df = spark.createDataFrame(rows, "doc_id long, wkt string")
    tris = shape_index(df, "wkt", xy=True)
    box = ShapeBoxQuery(1.0, 3.0, 1.0, 3.0, xy=True)
    assert {r["doc_id"] for r in shape_docset(tris, box, "CONTAINS").collect()} == {0}
    assert {r["doc_id"] for r in shape_docset(tris, box, "DISJOINT").collect()} == {1}
    big = ShapeBoxQuery(-1.0, 11.0, -1.0, 11.0, xy=True)
    assert {r["doc_id"] for r in shape_docset(tris, big, "WITHIN").collect()} == {0, 1}


def test_shape_scan_prunes_on_bbox(rect_triangles, tmp_path):
    """Plan quality: the INTERSECTS scan must push the triangle-bbox
    predicate down to the Parquet reader."""
    path = str(tmp_path / "tris.parquet")
    rect_triangles.write.mode("overwrite").parquet(path)
    spark = rect_triangles.sparkSession
    tris = spark.read.parquet(path)
    box = ShapeBoxQuery(-40.0, 60.0, -30.0, 50.0)
    plan = shape_docset(tris, box, "INTERSECTS")._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "min_x" in plan
    # circle queries ride the same prefilter: encoded ball bbox pushed down
    circ = ShapeCircleQuery(10.0, 10.0, 500_000.0)
    plan = shape_docset(tris, circ, "INTERSECTS")._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "min_x" in plan


def test_shape_doc_values(spark):
    from lucene_kmp_spark.search.shape import shape_doc_values

    rows = [
        (0, "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"),   # square: centroid (5,5)
        (1, "LINESTRING (0 0, 4 0)"),                      # line: centroid (2,0)
        (2, "MULTIPOINT (1 1, 3 3)"),                      # points: mean (2,2)
        (3, "GEOMETRYCOLLECTION (POINT (9 9), POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0)))"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, wkt string")
    dv = {r["doc_id"]: r for r in shape_doc_values(shape_index(df, "wkt")).collect()}

    sq = dv[0]
    assert abs(sq["centroid_lat"] - 5.0) < 1e-5 and abs(sq["centroid_lon"] - 5.0) < 1e-5
    assert abs(sq["min_lon"] - 0.0) < 1e-5 and abs(sq["max_lon"] - 10.0) < 1e-5

    ln = dv[1]
    assert ln["highest_type"] == 2
    assert abs(ln["centroid_lon"] - 2.0) < 1e-5 and abs(ln["centroid_lat"] - 0.0) < 1e-5

    pt = dv[2]
    assert pt["highest_type"] == 1
    assert abs(pt["centroid_lon"] - 2.0) < 1e-5 and abs(pt["centroid_lat"] - 2.0) < 1e-5

    # highest-dimension wins: polygon centroid (1,1), point ignored
    mixed = dv[3]
    assert mixed["highest_type"] == 3
    assert abs(mixed["centroid_lat"] - 1.0) < 1e-5 and abs(mixed["centroid_lon"] - 1.0) < 1e-5
    assert abs(mixed["max_lon"] - 9.0) < 1e-5  # bbox still covers everything


# ------------------------------------- reference TestLatLonShape.kt ports


def test_lucene8736_within(spark):
    """TestLatLonShape.testLUCENE8736: four small quads all WITHIN the
    covering quad."""
    polys = [
        "POLYGON ((3 4, 4 4, 4 3, 3 3, 3 4))",
        "POLYGON ((6 2, 7 2, 7 1, 6 1, 6 2))",
        "POLYGON ((3 1, 4 1, 4 0, 3 0, 3 1))",
        "POLYGON ((0 2, 1 2, 1 1, 0 1, 0 2))",
    ]
    df = spark.createDataFrame(list(enumerate(polys)), "doc_id long, wkt string")
    tris = shape_index(df, "wkt")
    q = ShapePolygonQuery((0.0, 7.0, 7.0, 0.0), (4.0, 4.0, 0.0, 0.0))
    assert shape_docset(tris, q, "WITHIN").count() == 4


def test_basic_contains(spark):
    """TestLatLonShape.testBasicContains: 20-degree square polygon doc and a
    line doc over the same ring; only the polygon CONTAINS the inner square /
    the degenerate point box."""
    square = "POLYGON ((-10 -10, 10 -10, 10 10, -10 10, -10 -10))"
    ring_line = "LINESTRING (-10 -10, 10 -10, 10 10, -10 10)"
    df = spark.createDataFrame([(0, square), (1, ring_line)], "doc_id long, wkt string")
    tris = shape_index(df, "wkt")
    inner = ShapePolygonQuery((-5.0, 5.0, 5.0, -5.0), (-5.0, -5.0, 5.0, 5.0))
    assert {r["doc_id"] for r in shape_docset(tris, inner, "CONTAINS").collect()} == {0}
    zero_box = ShapeBoxQuery(0.0, 0.0, 0.0, 0.0)
    assert {r["doc_id"] for r in shape_docset(tris, zero_box, "CONTAINS").collect()} == {0}


def test_contains_geometry_collection_intersects(spark):
    """doTestContainsGeometryCollectionIntersects: a doc whose collection has
    a big containing polygon PLUS small shapes intersecting the query region
    must NOT match CONTAINS (any NOTWITHIN value kills the doc)."""
    big = "POLYGON ((-132 -64, 132 -64, 132 64, -132 64, -132 -64))"
    for inner in ("POINT (5 5)", "LINESTRING (5 5, 5.1 5.1)",
                  "POLYGON ((5 5, 5.1 5, 5.1 5.1, 5 5.1, 5 5))"):
        wkt = f"GEOMETRYCOLLECTION ({big}, {inner})"
        df = spark.createDataFrame([(0, wkt), (1, big)], "doc_id long, wkt string")
        tris = shape_index(df, "wkt")
        qpoly = ShapePolygonQuery((4.0, 6.0, 6.0, 4.0), (4.0, 4.0, 6.0, 6.0))
        got = {r["doc_id"] for r in shape_docset(tris, qpoly, "CONTAINS").collect()}
        assert got == {1}, (inner, got)  # plain big polygon contains; collection doesn't
        qbox = ShapeBoxQuery(4.0, 6.0, 4.0, 6.0)
        got = {r["doc_id"] for r in shape_docset(tris, qbox, "CONTAINS").collect()}
        assert got == {1}, (inner, got)
        # third leg of the reference test: Circle(5, 5, 10 km)
        qcircle = ShapeCircleQuery(5.0, 5.0, 10_000.0)
        got = {r["doc_id"] for r in shape_docset(tris, qcircle, "CONTAINS").collect()}
        assert got == {1}, (inner, got)


def test_lucene9239_circle_contains(spark):
    """TestLatLonShape.testLucene9239: tall narrow polygon strip vs a
    high-latitude circle whose lon bulge dwarfs the strip -> CONTAINS empty."""
    wkt = (
        "POLYGON ((49.931598911327825 -22.350172194105966, "
        "49.931598911327825 90, 51.40819689137876 90, "
        "51.408196891378765 -22.350172194105966, "
        "49.931598911327825 -22.350172194105966))"
    )
    df = spark.createDataFrame([(0, wkt)], "doc_id long, wkt string")
    tris = shape_index(df, "wkt")
    q = ShapeCircleQuery(0.9513280497489234, 78.01086555431775, 1097753.4254892308)
    assert shape_docset(tris, q, "CONTAINS").count() == 0


def test_point_distance_query_intersects_equals_within(spark):
    """TestLatLonShape.testPointIndexAndDistanceQuery: for point docs,
    INTERSECTS and WITHIN doc sets are identical and DISJOINT is the
    complement, for any circle."""
    rnd = random.Random(4242)
    rows = [
        (i, f"POINT ({rnd.uniform(-170, 170):.6f} {rnd.uniform(-80, 80):.6f})")
        for i in range(80)
    ]
    df = spark.createDataFrame(rows, "doc_id long, wkt string")
    tris = shape_index(df, "wkt").persist()
    tris.count()
    for (lon, lat, r) in ((10.0, 20.0, 3_000_000.0), (-150.0, -40.0, 8_000_000.0)):
        q = ShapeCircleQuery(lon, lat, r)
        inter = {x["doc_id"] for x in shape_docset(tris, q, "INTERSECTS").collect()}
        within = {x["doc_id"] for x in shape_docset(tris, q, "WITHIN").collect()}
        disjoint = {x["doc_id"] for x in shape_docset(tris, q, "DISJOINT").collect()}
        assert inter == within
        assert disjoint == set(range(80)) - inter
    tris.unpersist()


def test_triangle_crossing_polygon_vertices_kernel():
    """TestLatLonShape.testTriangleCrossingPolygonVertices — kernel-level
    intersectsTriangle where the triangle passes exactly through polygon
    vertices."""
    import pandas as pd

    from lucene_kmp_spark.search.shape import TYPE_LINE, TYPE_TRIANGLE, _poly_kernel

    def tri_row(ax, ay, bx, by, cx, cy, ttype):
        ex = [_geo.encode_longitude(v) for v in (ax, bx, cx)]
        ey = [_geo.encode_latitude(v) for v in (ay, by, cy)]
        return pd.DataFrame(
            {
                "ttype": [ttype],
                "ax": [ex[0]], "ay": [ey[0]], "bx": [ex[1]], "by": [ey[1]],
                "cx": [ex[2]], "cy": [ey[2]],
                "ab": [True], "bc": [True], "ca": [True],
                "min_x": [min(ex)], "max_x": [max(ex)],
                "min_y": [min(ey)], "max_y": [max(ey)],
            }
        )

    p = ShapePolygonQuery((-1.0, 1.0, 5.0, 0.0, -5.0), (0.0, 0.0, -5.0, -10.0, -5.0))
    row = tri_row(-5.0, 0.0, 10.0, 0.0, -5.0, -15.0, TYPE_TRIANGLE)
    assert bool(_poly_kernel(row, p, "intersects")[0])

    # testLineCrossingPolygonVertices: diamond polygon, horizontal line
    diamond = ShapePolygonQuery((-1.0, 0.0, 1.0, 0.0), (0.0, -1.0, 0.0, 1.0))
    line = tri_row(-1.5, 0.0, 1.5, 0.0, 1.5, 0.0, TYPE_LINE)
    assert bool(_poly_kernel(line, diamond, "intersects")[0])


def test_line_query_kernel():
    """Line2D relate logic at the kernel level (no Spark): TestLatLonShape
    testLUCENE9055 (the search line crosses both nested squares) and
    testLineSharedLine (collinear overlap counts as intersecting)."""
    import pandas as pd

    from lucene_kmp_spark.search.shape import (
        TYPE_LINE,
        TYPE_POINT,
        WITHIN_NOTWITHIN,
        ShapeLineQuery,
        _line_kernel,
    )

    def rows_for(wkt):
        from lucene_kmp_spark.search.shape import _shape_rows, parse_wkt

        cols = ["doc_id", "ttype", "ax", "ay", "bx", "by", "cx", "cy", "ab", "bc", "ca"]
        r = pd.DataFrame(_shape_rows(0, parse_wkt(wkt), False), columns=cols)
        r["min_x"] = r[["ax", "bx", "cx"]].min(axis=1)
        r["max_x"] = r[["ax", "bx", "cx"]].max(axis=1)
        r["min_y"] = r[["ay", "by", "cy"]].min(axis=1)
        r["max_y"] = r[["ay", "by", "cy"]].max(axis=1)
        return r

    # LUCENE-9055: line (0,0)->(5,5)->(7,7) intersects both polygons
    line = ShapeLineQuery((0.0, 5.0, 7.0), (0.0, 5.0, 7.0))
    poly1 = rows_for("POLYGON ((5 5, 10 6, 10 10, 5 10, 5 5))")
    poly2 = rows_for("POLYGON ((6 6, 9 6, 9 9, 6 9, 6 6))")
    assert _line_kernel(poly1, line, "intersects").any()
    assert _line_kernel(poly2, line, "intersects").any()

    # shared-line: doc line collinear-overlapping the query line intersects
    shared = rows_for("LINESTRING (-2 0, -1 0, 0 0, 1 0)")
    qline = ShapeLineQuery((-5.0, 5.0), (0.0, 0.0))
    assert _line_kernel(shared, qline, "intersects").any()

    # a point ON the line: intersects + within + NOTWITHIN for contains.
    # (axis-aligned line: the quantized grid preserves collinearity exactly;
    # a diagonal would quantize the point off the line — same as Lucene)
    pt = rows_for("POINT (2 1)")
    horiz = ShapeLineQuery((0.0, 5.0), (1.0, 1.0))
    assert _line_kernel(pt, horiz, "intersects")[0]
    assert _line_kernel(pt, horiz, "within")[0]
    assert _line_kernel(pt, horiz, "contains")[0] == WITHIN_NOTWITHIN
    far = rows_for("POINT (2 3)")
    assert not _line_kernel(far, horiz, "intersects")[0]
    assert not _line_kernel(far, horiz, "within")[0]

    # a triangle doc can never be WITHIN a line (containsTriangle == false)
    assert not _line_kernel(poly1, line, "within").any()


def test_line_query_docset(spark):
    """End-to-end line query over mixed docs (LUCENE-9055 shape)."""
    from lucene_kmp_spark.search.shape import ShapeLineQuery

    rows = [
        (0, "POLYGON ((5 5, 10 6, 10 10, 5 10, 5 5))"),
        (1, "POLYGON ((6 6, 9 6, 9 9, 6 9, 6 6))"),
        (2, "POLYGON ((20 20, 22 20, 22 22, 20 22, 20 20))"),  # far away
        (3, "POINT (3 1)"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, wkt string")
    tris = shape_index(df, "wkt")
    line = ShapeLineQuery((0.0, 5.0, 7.0), (0.0, 5.0, 7.0))
    got = {r["doc_id"] for r in shape_docset(tris, line, "INTERSECTS").collect()}
    assert got == {0, 1}
    disj = {r["doc_id"] for r in shape_docset(tris, line, "DISJOINT").collect()}
    assert disj == {2, 3}
    horiz = ShapeLineQuery((0.0, 5.0), (1.0, 1.0))
    within = {r["doc_id"] for r in shape_docset(tris, horiz, "WITHIN").collect()}
    assert within == {3}


def test_lucene8669_multi_polygon_query(spark):
    """testLUCENE8669: one doc holding polygons on both sides of the
    dateline; a two-component polygon query (ComponentTree union) relates
    WITHIN/INTERSECTS/not-DISJOINT."""
    from lucene_kmp_spark.search.shape import ShapeLineQuery  # noqa: F401

    gc = (
        "GEOMETRYCOLLECTION ("
        "POLYGON ((-180 -7.5, -180 15, -176 15, -176 0, -180 -7.5)), "
        "POLYGON ((180 15, 180 -7.5, 176 -15, 174 -10, 176 15, 180 15)))"
    )
    df = spark.createDataFrame([(0, gc)], "doc_id long, wkt string")
    tris = shape_index(df, "wkt")
    search = [
        ShapePolygonQuery((-180.0, -180.0, -170.0, -170.0), (-20.0, 20.0, 20.0, -20.0)),
        ShapePolygonQuery((180.0, 180.0, 170.0, 170.0), (20.0, -20.0, -20.0, 20.0)),
    ]
    assert shape_docset(tris, search, "WITHIN").count() == 1
    assert shape_docset(tris, search, "INTERSECTS").count() == 1
    assert shape_docset(tris, search, "DISJOINT").count() == 0


def test_contains_wrapping_boolean_query(spark):
    """testContainsWrappingBooleanQuery: multi-geometry CONTAINS = every
    component contained (per-component MUST)."""
    square = "POLYGON ((-30 -30, 30 -30, 30 30, -30 30, -30 -30))"
    df = spark.createDataFrame([(0, square)], "doc_id long, wkt string")
    tris = shape_index(df, "wkt")
    geoms = [ShapeBoxQuery(0.0, 1.0, 0.0, 1.0), ShapeBoxQuery(4.0, 4.0, 4.0, 4.0)]
    assert shape_docset(tris, geoms, "CONTAINS").count() == 1
    # one component outside the shape -> no hit
    geoms_out = [ShapeBoxQuery(0.0, 1.0, 0.0, 1.0), ShapeBoxQuery(40.0, 41.0, 40.0, 41.0)]
    assert shape_docset(tris, geoms_out, "CONTAINS").count() == 0


def test_point_index_and_query(spark):
    """testPointIndexAndQuery with a fixed point: a point doc matches the
    zero-extent box at its own (quantized) location."""
    lat = _geo.decode_latitude(_geo.encode_latitude(12.3))
    lon = _geo.decode_longitude(_geo.encode_longitude(45.6))
    df = spark.createDataFrame([(0, f"POINT ({lon} {lat})")], "doc_id long, wkt string")
    tris = shape_index(df, "wkt")
    assert shape_docset(tris, ShapeBoxQuery(lon, lon, lat, lat), "INTERSECTS").count() == 1
    off = _geo.decode_longitude(_geo.encode_longitude(45.6) + 5)
    assert shape_docset(tris, ShapeBoxQuery(off, off, lat, lat), "INTERSECTS").count() == 0


def test_lucene8679_kernel():
    """testLUCENE8679: near-degenerate triangle vs polygon intersects, both
    vertex orders."""
    import pandas as pd

    from lucene_kmp_spark.search.shape import TYPE_TRIANGLE, _poly_kernel

    alat, alon = 1.401298464324817e-45, 24.76789767911785
    blat, blon = 34.26468306870807, -52.67048754768767
    poly = ShapePolygonQuery(
        (0.9999999403953552, 0.9999999403953552, 124.50086371762484, 124.50086371762484),
        (-14.448264200949083, 0.0, 0.0, -14.448264200949083),
    )

    def row(pts):
        ex = [_geo.encode_longitude(x) for x, _ in pts]
        ey = [_geo.encode_latitude(y) for _, y in pts]
        return pd.DataFrame(
            {
                "ttype": [TYPE_TRIANGLE],
                "ax": [ex[0]], "ay": [ey[0]], "bx": [ex[1]], "by": [ey[1]],
                "cx": [ex[2]], "cy": [ey[2]],
                "ab": [True], "bc": [True], "ca": [True],
                "min_x": [min(ex)], "max_x": [max(ex)],
                "min_y": [min(ey)], "max_y": [max(ey)],
            }
        )

    t1 = row([(alon, blat), (blon, blat), (alon, alat)])
    t2 = row([(alon, blat), (alon, alat), (blon, blat)])
    assert bool(_poly_kernel(t1, poly, "intersects")[0])
    assert bool(_poly_kernel(t2, poly, "intersects")[0])


def test_lucene8454_disjoint(spark):
    """testLUCENE8454: quantization-boundary DISJOINT — the sliver triangle
    reaching lat 90 / lon 180 is disjoint from the sub-micro-degree box."""
    df = spark.createDataFrame(
        [(0, "POLYGON ((0 -1.490648725633769E-132, 0 90, 180 90, 0 -1.490648725633769E-132))")],
        "doc_id long, wkt string",
    )
    tris = shape_index(df, "wkt")
    q = ShapeBoxQuery(8.381903171539307e-8, 0.9999999403953552, -29.46555603761226, 0.0)
    assert shape_docset(tris, q, "DISJOINT").count() == 1


def test_check_shapes(spark, rect_triangles):
    """shape CheckIndex: clean table passes; injected corruptions caught."""
    from lucene_kmp_spark.search.shape import check_shapes

    assert check_shapes(rect_triangles, raise_on_fail=True)["ok"]

    # corrupt a bbox column: detected and named
    bad = rect_triangles.withColumn(
        "min_x", F.when(F.col("doc_id") == 3, F.col("min_x") + 10).otherwise(F.col("min_x"))
    )
    res = check_shapes(bad)
    assert not res["ok"] and any("tri_bbox" in v for v in res["violations"])
    with pytest.raises(ValueError):
        check_shapes(bad, raise_on_fail=True)

    # collapse a triangle: degenerate detected
    degen = rect_triangles.withColumn(
        "cx", F.when(F.col("doc_id") == 5, F.col("ax")).otherwise(F.col("cx"))
    ).withColumn(
        "cy", F.when(F.col("doc_id") == 5, F.col("ay")).otherwise(F.col("cy"))
    )
    res = check_shapes(degen)
    assert not res["ok"] and any("degenerate_triangle" in v for v in res["violations"])


def test_tessellate_rectilinear_with_holes_property():
    """Property: random rectilinear polygons with 0-2 disjoint rectangular
    holes either tessellate to EXACTLY the right signed area or raise —
    never a silently wrong mesh."""
    rnd = random.Random(123)
    ok = 0
    for _ in range(40):
        # staircase rectilinear outer ring (CCW)
        x0 = rnd.randint(-170, 120)
        y0 = rnd.randint(-80, 40)
        w = rnd.randint(10, 40)
        h = rnd.randint(10, 30)
        notch_w = rnd.randint(1, w // 3)
        notch_h = rnd.randint(1, h // 3)
        # rectangle with a notch cut from the top-right corner (concave)
        xs = [x0, x0 + w, x0 + w, x0 + w - notch_w, x0 + w - notch_w, x0]
        ys = [y0, y0, y0 + h - notch_h, y0 + h - notch_h, y0 + h, y0 + h]
        ring = _enc_ring([float(v) for v in xs], [float(v) for v in ys])
        holes = []
        for hidx in range(rnd.randint(0, 2)):
            hx = x0 + 2 + hidx * (w // 2 - 3)
            hy = y0 + 2
            hw = max(1, w // 6)
            hh = max(1, h // 4)
            holes.append(
                _enc_ring(
                    [float(hx), float(hx + hw), float(hx + hw), float(hx)],
                    [float(hy), float(hy), float(hy + hh), float(hy + hh)],
                )
            )
        try:
            tris = tessellate(ring, holes)
        except ValueError:
            continue  # loud failure is acceptable; silence is not
        total = sum(
            (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
            for a, b, c, *_ in tris
        )
        want = _signed_area2(ring) - sum(_signed_area2(hl) for hl in holes)
        assert total == want
        ok += 1
    assert ok >= 30  # the vast majority must tessellate cleanly


# --------------------------------------------------------- circle queries


def _naive_circle_rect(ex0, ex1, ey0, ey1, q: ShapeCircleQuery):
    """Independent scalar evaluation of a circle query against ONE
    rectangle doc, derived from the tessellation layout (two triangles,
    anti-diagonal (x1,y0)-(x0,y1)) and Circle2D.kt's decision procedure —
    no shared code with the vectorized kernel."""
    import math as m

    from lucene_kmp_spark.search.geo import (
        DEG_TO_RAD,
        EARTH_MEAN_RADIUS_METERS,
        LAT_DECODE,
        LON_DECODE,
    )

    if q.xy:
        raise AssertionError("geo-only helper")
    x0, x1 = ex0 * LON_DECODE, ex1 * LON_DECODE
    y0, y1 = ey0 * LAT_DECODE, ey1 * LAT_DECODE
    cx, cy, r = q.x, q.y, q.radius

    def hv(lat, lon):
        h = (1.0 - m.cos(lat * DEG_TO_RAD - m.radians(cy))) + m.cos(
            lat * DEG_TO_RAD
        ) * m.cos(m.radians(cy)) * (1.0 - m.cos((lon - cx) * DEG_TO_RAD))
        return EARTH_MEAN_RADIUS_METERS * 2.0 * m.asin(min(1.0, m.sqrt(h * 0.5)))

    def contains(px, py):
        return hv(py, px) <= r

    corners = [(x0, y0), (x1, y0), (x1, y1), (x0, y1)]
    corner_in = [contains(px, py) for px, py in corners]

    def proj_hit(ax, ay, bx, by):
        vab_x, vab_y = bx - ax, by - ay
        mag = vab_x * vab_x + vab_y * vab_y
        if mag <= 0:
            return False
        t = ((cx - ax) * vab_x + (cy - ay) * vab_y) / mag
        if t < 0 or t > 1:
            return False
        px, py = ax + vab_x * t, ay + vab_y * t
        if not (min(ax, bx) <= px <= max(ax, bx) and min(ay, by) <= py <= max(ay, by)):
            return False
        return contains(px, py)

    edges = [
        (x0, y0, x1, y0),
        (x1, y0, x1, y1),
        (x1, y1, x0, y1),
        (x0, y1, x0, y0),
    ]
    diagonal = (x1, y0, x0, y1)
    center_in_rect = x0 <= cx <= x1 and y0 <= cy <= y1
    intersects = (
        any(corner_in)
        or center_in_rect
        or any(proj_hit(*e) for e in edges)
        or proj_hit(*diagonal)
    )
    within = all(corner_in)
    # CONTAINS: no corner inside the ball, no original (rect) edge hit,
    # and the center inside the rect (center-in-triangle for one of the two)
    rel_contains = center_in_rect and not any(corner_in) and not any(
        proj_hit(*e) for e in edges
    )
    return {
        "INTERSECTS": intersects,
        "DISJOINT": not intersects,
        "WITHIN": within,
        "CONTAINS": rel_contains,
    }


@pytest.mark.parametrize("relation", ["INTERSECTS", "DISJOINT", "WITHIN", "CONTAINS"])
def test_circle_relations_vs_naive(rect_docs, rect_triangles, relation):
    rows, _ = rect_docs
    for q in (
        ShapeCircleQuery(-40.0, 10.0, 900_000.0),   # ~8 deg radius blob
        ShapeCircleQuery(-155.0, -60.0, 2_500_000.0),
        ShapeCircleQuery(10.0, 0.0, 60_000.0),      # small: CONTAINS candidates
        ShapeCircleQuery(-120.25, -35.4, 120_000.0),
    ):
        got = {r["doc_id"] for r in shape_docset(rect_triangles, q, relation).collect()}
        want = {
            i
            for (i, _, ex0, ex1, ey0, ey1) in rows
            if _naive_circle_rect(ex0, ex1, ey0, ey1, q)[relation]
        }
        assert got == want, (relation, q, sorted(got ^ want)[:10])


def test_circle_point_line_docs(spark):
    rows = [
        (0, "POINT (5 5)"),
        (1, "POINT (50 50)"),
        (2, "LINESTRING (0 0, 10 10)"),   # passes near (5,5)
        (3, "LINESTRING (40 40, 60 60)"),
        (4, "LINESTRING (4.5 4.5, 5.5 5.5)"),  # short, fully inside
    ]
    df = spark.createDataFrame(rows, "doc_id long, wkt string")
    tris = shape_index(df, "wkt")
    q = ShapeCircleQuery(5.0, 5.0, 200_000.0)  # ~1.8 deg
    hits = {r["doc_id"] for r in shape_docset(tris, q, "INTERSECTS").collect()}
    assert hits == {0, 2, 4}
    within = {r["doc_id"] for r in shape_docset(tris, q, "WITHIN").collect()}
    assert within == {0, 4}
    disjoint = {r["doc_id"] for r in shape_docset(tris, q, "DISJOINT").collect()}
    assert disjoint == {1, 3}
    # a point/line never CONTAINS a circle
    assert shape_docset(tris, q, "CONTAINS").count() == 0


def test_circle_contains_relation(spark):
    wkt = "POLYGON ((0 0, 20 0, 20 20, 0 20, 0 0), (6 6, 14 6, 14 14, 6 14, 6 6))"
    df = spark.createDataFrame([(0, wkt)], "doc_id long, wkt string")
    tris = shape_index(df, "wkt")
    # small circle in the solid ring region: shape CONTAINS it
    solid = ShapeCircleQuery(3.0, 3.0, 60_000.0)
    assert {r["doc_id"] for r in shape_docset(tris, solid, "CONTAINS").collect()} == {0}
    # circle inside the hole: not contained, disjoint
    in_hole = ShapeCircleQuery(10.0, 10.0, 60_000.0)
    assert shape_docset(tris, in_hole, "CONTAINS").count() == 0
    assert {r["doc_id"] for r in shape_docset(tris, in_hole, "DISJOINT").collect()} == {0}
    # circle straddling the outer boundary: intersects, not contained
    straddle = ShapeCircleQuery(0.0, 10.0, 120_000.0)
    assert {r["doc_id"] for r in shape_docset(tris, straddle, "INTERSECTS").collect()} == {0}
    assert shape_docset(tris, straddle, "CONTAINS").count() == 0
    # the whole shape within a huge circle
    big = ShapeCircleQuery(10.0, 10.0, 4_000_000.0)
    assert {r["doc_id"] for r in shape_docset(tris, big, "WITHIN").collect()} == {0}


def test_circle_dateline(spark):
    rows = [
        (0, "POLYGON ((-179.9 -1, -179.0 -1, -179.0 1, -179.9 1, -179.9 -1))"),
        (1, "POLYGON ((178.0 -1, 179.0 -1, 179.0 1, 178.0 1, 178.0 -1))"),
        (2, "POLYGON ((170.0 -1, 171.0 -1, 171.0 1, 170.0 1, 170.0 -1))"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, wkt string")
    tris = shape_index(df, "wkt")
    # circle at lon 179.5 with ~100 km radius wraps the dateline: reaches
    # doc 0 (across the line) and doc 1, not doc 2
    q = ShapeCircleQuery(179.5, 0.0, 100_000.0)
    hits = {r["doc_id"] for r in shape_docset(tris, q, "INTERSECTS").collect()}
    assert hits == {0, 1}
    assert {r["doc_id"] for r in shape_docset(tris, q, "DISJOINT").collect()} == {2}


def test_xy_circle_relations(spark):
    rows = []
    rnd = random.Random(77)
    for i in range(60):
        x0 = rnd.uniform(-500.0, 500.0)
        y0 = rnd.uniform(-500.0, 500.0)
        x1 = x0 + rnd.uniform(1.0, 120.0)
        y1 = y0 + rnd.uniform(1.0, 120.0)
        rows.append((i, f"POLYGON (({x0} {y0}, {x1} {y0}, {x1} {y1}, {x0} {y1}, {x0} {y0}))", x0, x1, y0, y1))
    df = spark.createDataFrame(rows, "doc_id long, wkt string, x0 double, x1 double, y0 double, y1 double")
    tris = shape_index(df, "wkt", xy=True).persist()
    tris.count()
    q = ShapeCircleQuery(30.0, -20.0, 150.0, xy=True)
    f32 = lambda v: float(np.float32(v))  # noqa: E731
    cx, cy, r = f32(q.x), f32(q.y), f32(q.radius)

    def naive(x0, x1, y0, y1):
        # decoded = float32 round of the raw corners
        x0, x1, y0, y1 = f32(x0), f32(x1), f32(y0), f32(y1)
        corners = [(x0, y0), (x1, y0), (x1, y1), (x0, y1)]
        inc = [((px - cx) ** 2 + (py - cy) ** 2) <= r * r for px, py in corners]

        def proj(ax, ay, bx, by):
            vx, vy = bx - ax, by - ay
            mag = vx * vx + vy * vy
            t = ((cx - ax) * vx + (cy - ay) * vy) / mag
            if t < 0 or t > 1:
                return False
            px, py = ax + vx * t, ay + vy * t
            return ((px - cx) ** 2 + (py - cy) ** 2) <= r * r

        edges = [(x0, y0, x1, y0), (x1, y0, x1, y1), (x1, y1, x0, y1), (x0, y1, x0, y0)]
        center_in = x0 <= cx <= x1 and y0 <= cy <= y1
        inter = any(inc) or center_in or any(proj(*e) for e in edges) or proj(x1, y0, x0, y1)
        return {
            "INTERSECTS": inter,
            "WITHIN": all(inc),
            "CONTAINS": center_in and not any(inc) and not any(proj(*e) for e in edges),
        }

    for relation in ("INTERSECTS", "WITHIN", "CONTAINS"):
        got = {row["doc_id"] for row in shape_docset(tris, q, relation).collect()}
        want = {i for (i, _, x0, x1, y0, y1) in rows if naive(x0, x1, y0, y1)[relation]}
        assert got == want, (relation, sorted(got ^ want)[:10])
    tris.unpersist()


def test_box_dateline_crossing(spark):
    rows = [
        (0, "POLYGON ((-179.9 -1, -179.0 -1, -179.0 1, -179.9 1, -179.9 -1))"),
        (1, "POLYGON ((178.0 -1, 179.0 -1, 179.0 1, 178.0 1, 178.0 -1))"),
        (2, "POLYGON ((170.0 -1, 171.0 -1, 171.0 1, 170.0 1, 170.0 -1))"),
        (3, "POINT (-179.5 0)"),
        (4, "POINT (179.5 0)"),
        (5, "POINT (0 0)"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, wkt string")
    tris = shape_index(df, "wkt")
    # box wrapping the dateline: lon in [177, -178.5]
    q = ShapeBoxQuery(177.0, -178.5, -2.0, 2.0)
    assert q.crosses_dateline()
    hits = {r["doc_id"] for r in shape_docset(tris, q, "INTERSECTS").collect()}
    assert hits == {0, 1, 3, 4}
    within = {r["doc_id"] for r in shape_docset(tris, q, "WITHIN").collect()}
    assert within == {0, 1, 3, 4}  # all hits fall inside one half each
    disjoint = {r["doc_id"] for r in shape_docset(tris, q, "DISJOINT").collect()}
    assert disjoint == {2, 5}
    # CONTAINS across the wrap = MUST of both halves (LatLonShape.newBoxQuery):
    # only a doc covering both sides of the line can contain it — none here
    assert shape_docset(tris, q, "CONTAINS").count() == 0
    # degenerate wrap minLon=180 collapses to -180 (Rectangle2D.create)
    q180 = ShapeBoxQuery(180.0, -178.5, -2.0, 2.0)
    assert not q180.crosses_dateline()
    hits180 = {r["doc_id"] for r in shape_docset(tris, q180, "INTERSECTS").collect()}
    assert hits180 == {0, 3}
