"""Indexed geo/XY shapes: tessellated-triangle storage + spatial relation queries.

Spark-first re-expression of the reference's shape family:

* ``document/LatLonShape.kt`` / ``XYShape.kt`` — a doc's geometry (point /
  line / polygon-with-holes / multi*) is decomposed into a triangular mesh
  and indexed one row per triangle.
* ``geo/Tessellator.kt`` — ear-clipping tessellation over the QUANTIZED
  (encoded int32) coordinates, holes bridged into the outer ring (David
  Eberly's visibility bridge), each triangle edge carrying an
  ``isEdgeFromPolygon`` flag (true iff the edge lies on the original shape
  boundary) — the flags drive CONTAINS semantics.
* ``document/ShapeField.kt`` — the 7-dim BKD point encoding of a triangle.
  Here the triangle is a typed Parquet row instead: the per-triangle bbox
  becomes four DOUBLE columns (the 4 "index dimensions" whose role —
  coarse pruning — Parquet row-group min/max stats play via Catalyst
  PushedFilters), the vertices six INT columns, the edge flags three
  BOOLEANs; a denormalized whole-shape bbox enables WITHIN/CONTAINS/
  DISJOINT candidate pruning at the scan.
* ``document/SpatialQuery.kt`` + ``geo/Rectangle2D.kt`` / ``Polygon2D.kt``
  / ``Component2D.kt`` — per-triangle relation predicates and the per-doc
  combination: INTERSECTS = any triangle intersects; DISJOINT = doc has the
  field and no triangle intersects; WITHIN = every triangle within (and
  ≥1); CONTAINS = some triangle CANDIDATE and none NOTWITHIN
  (Component2D.WithinRelation).

All geometry predicates run in EXACT integer arithmetic on the encoded
grid: a float64 orientation fast path with an exact Python-int recompute
where |det| falls under the rounding bound — equivalent to GeoUtils.orient's
double-with-BigDecimal-fallback on quantized inputs, without the doubles'
edge cases.

Scale shape: tessellation is a ``mapInPandas`` pass (per-row work, no
shuffle); INTERSECTS is one triangle scan with the query bbox pushed to
Parquet stats + an Arrow exact kernel on survivors + a distinct; WITHIN /
CONTAINS prune candidates by the doc-bbox columns then one hash aggregate
on doc_id; DISJOINT is the doc list minus the INTERSECTS set (left_anti).
No driver-side geometry loops — the only collect is the final result.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field as dc_field
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from lucene_kmp_spark.search import geo as _geo

# triangle row types (ShapeField.DecodedTriangle.TYPE)
TYPE_POINT = 1
TYPE_LINE = 2
TYPE_TRIANGLE = 3

# Component2D.WithinRelation encoded for per-doc max() aggregation:
# doc CONTAINS query  <=>  max(rel) == CANDIDATE (>=1 CANDIDATE, no NOTWITHIN)
WITHIN_DISJOINT = 0
WITHIN_CANDIDATE = 1
WITHIN_NOTWITHIN = 2


# --------------------------------------------------------------- geometries

@dataclass(frozen=True)
class ShapePoint:
    x: float  # lon
    y: float  # lat


@dataclass(frozen=True)
class ShapeLine:
    xs: tuple[float, ...]
    ys: tuple[float, ...]


@dataclass(frozen=True)
class ShapePolygon:
    """Outer ring + holes; rings closed or open (first==last optional)."""

    xs: tuple[float, ...]
    ys: tuple[float, ...]
    holes: tuple["ShapePolygon", ...] = dc_field(default=())


@dataclass(frozen=True)
class ShapeCollection:
    shapes: tuple = dc_field(default=())


# ------------------------------------------------------------------ WKT

_NUM = r"[-+]?\d+(?:\.\d+)?(?:[eE][-+]?\d+)?"
_WKT_TAG = re.compile(r"\s*([A-Za-z]+)\s*")


def parse_wkt(s: str):
    """SimpleWKTShapeParser.kt subset: POINT, LINESTRING, POLYGON (holes),
    MULTIPOINT, MULTILINESTRING, MULTIPOLYGON, ENVELOPE, GEOMETRYCOLLECTION.
    Coordinates are ``x y`` (lon lat) like the reference parser."""
    s = s.strip()
    m = _WKT_TAG.match(s)
    if not m:
        raise ValueError(f"cannot parse WKT: {s[:60]!r}")
    tag = m.group(1).upper()
    body = s[m.end():].strip()
    if tag == "POINT":
        (x, y), = _coords(_strip1(body))
        return ShapePoint(x, y)
    if tag == "MULTIPOINT":
        pts = [_coords(p)[0] if "(" not in p else _coords(_strip1(p))[0] for p in _split1(_strip1(body))]
        return ShapeCollection(tuple(ShapePoint(x, y) for x, y in pts))
    if tag == "LINESTRING":
        cs = _coords(_strip1(body))
        return ShapeLine(tuple(x for x, _ in cs), tuple(y for _, y in cs))
    if tag == "MULTILINESTRING":
        lines = []
        for part in _split1(_strip1(body)):
            cs = _coords(_strip1(part))
            lines.append(ShapeLine(tuple(x for x, _ in cs), tuple(y for _, y in cs)))
        return ShapeCollection(tuple(lines))
    if tag == "POLYGON":
        return _parse_polygon_body(_strip1(body))
    if tag == "MULTIPOLYGON":
        polys = tuple(_parse_polygon_body(_strip1(p)) for p in _split1(_strip1(body)))
        return ShapeCollection(polys)
    if tag == "ENVELOPE":
        # (minLon, maxLon, maxLat, minLat) — the reference's ENVELOPE order
        vals = [float(v) for v in _strip1(body).split(",")]
        x0, x1, y1, y0 = vals
        return ShapePolygon((x0, x1, x1, x0), (y0, y0, y1, y1))
    if tag == "GEOMETRYCOLLECTION":
        return ShapeCollection(tuple(parse_wkt(p) for p in _split1(_strip1(body))))
    raise ValueError(f"unsupported WKT type {tag}")


def _strip1(s: str) -> str:
    s = s.strip()
    if not (s.startswith("(") and s.endswith(")")):
        raise ValueError(f"expected parenthesized WKT body: {s[:40]!r}")
    return s[1:-1]


def _split1(s: str) -> list[str]:
    """Split on top-level commas."""
    out, depth, start = [], 0, 0
    for i, c in enumerate(s):
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == "," and depth == 0:
            out.append(s[start:i])
            start = i + 1
    out.append(s[start:])
    return out


def _coords(s: str) -> list[tuple[float, float]]:
    out = []
    for pair in s.split(","):
        parts = pair.split()
        out.append((float(parts[0]), float(parts[1])))
    return out


def _parse_polygon_body(body: str) -> ShapePolygon:
    rings = [_coords(_strip1(r)) for r in _split1(body)]
    outer = rings[0]
    holes = tuple(
        ShapePolygon(tuple(x for x, _ in r), tuple(y for _, y in r)) for r in rings[1:]
    )
    return ShapePolygon(tuple(x for x, _ in outer), tuple(y for _, y in outer), holes)


# ----------------------------------------------------- exact int orientation

def _orient1(ax: int, ay: int, bx: int, by: int, cx: int, cy: int) -> int:
    """Exact sign of the (b-a)x(c-a) cross product on integer coords."""
    v = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    return (v > 0) - (v < 0)


def _orient_vec(ax, ay, bx, by, cx, cy) -> np.ndarray:
    """Vectorized orientation sign with exact integer fallback where the
    float64 determinant could round across zero (|det| under the bound)."""
    f = lambda a: a.astype(np.float64)  # noqa: E731
    det = (f(bx) - f(ax)) * (f(cy) - f(ay)) - (f(by) - f(ay)) * (f(cx) - f(ax))
    out = np.sign(det).astype(np.int64)
    # error bound: products up to 2^64, rel err 2^-52 -> |det| < 2^13 unsafe
    unsafe = np.abs(det) < 8192.0
    if unsafe.any():
        idx = np.nonzero(unsafe)[0]
        for i in idx:
            out[i] = _orient1(int(ax[i]), int(ay[i]), int(bx[i]), int(by[i]), int(cx[i]), int(cy[i]))
    return out


def _cross_with_boundary(a1x, a1y, b1x, b1y, a2x, a2y, b2x, b2y) -> np.ndarray:
    """GeoUtils.lineCrossesLineWithBoundary vectorized over segment 1 arrays
    vs ONE segment 2 (touching counts)."""
    s2 = np.full_like(a1x, a2x), np.full_like(a1y, a2y), np.full_like(a1x, b2x), np.full_like(a1y, b2y)
    o1 = _orient_vec(s2[0], s2[1], s2[2], s2[3], a1x, a1y) * _orient_vec(s2[0], s2[1], s2[2], s2[3], b1x, b1y)
    o2 = _orient_vec(a1x, a1y, b1x, b1y, s2[0], s2[1]) * _orient_vec(a1x, a1y, b1x, b1y, s2[2], s2[3])
    return (o1 <= 0) & (o2 <= 0)


def _cross_strict(a1x, a1y, b1x, b1y, a2x, a2y, b2x, b2y) -> np.ndarray:
    """GeoUtils.lineCrossesLine — STRICT crossing, boundary touches excluded
    (the containsTriangle path uses includeBoundary=false)."""
    s2 = np.full_like(a1x, a2x), np.full_like(a1y, a2y), np.full_like(a1x, b2x), np.full_like(a1y, b2y)
    o1 = _orient_vec(s2[0], s2[1], s2[2], s2[3], a1x, a1y) * _orient_vec(s2[0], s2[1], s2[2], s2[3], b1x, b1y)
    o2 = _orient_vec(a1x, a1y, b1x, b1y, s2[0], s2[1]) * _orient_vec(a1x, a1y, b1x, b1y, s2[2], s2[3])
    return (o1 < 0) & (o2 < 0)


# ------------------------------------------------------------- tessellation

def _encode_pt(x: float, y: float, xy: bool) -> tuple[int, int]:
    if xy:
        return _xy_encode(x), _xy_encode(y)
    return _geo.encode_longitude(x), _geo.encode_latitude(y)


def _xy_encode(v: float) -> int:
    """XYEncodingUtils.encode: float32 bits, sortable-int mapped.
    checkVal semantics: NaN/inf rejected (XYEncodingUtils.kt checkVal)."""
    if not math.isfinite(v):
        raise ValueError(f"invalid XY value {v}: must be finite")
    b = np.float32(v).view(np.int32)
    return int(b ^ ((b >> 31) & 0x7FFFFFFF))


def _xy_decode(e: int) -> float:
    b = np.int32(e)
    return float(np.int32(b ^ ((b >> 31) & 0x7FFFFFFF)).view(np.float32))


def _dedup_closed(pts: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Drop the closing vertex and collapse consecutive duplicates after
    quantization (Tessellator filters coplanar/duplicate nodes)."""
    if len(pts) > 1 and pts[0] == pts[-1]:
        pts = pts[:-1]
    out = []
    for p in pts:
        if not out or out[-1] != p:
            out.append(p)
    if len(out) > 1 and out[0] == out[-1]:
        out.pop()
    return out


def _signed_area2(pts: list[tuple[int, int]]) -> int:
    s = 0
    n = len(pts)
    for i in range(n):
        x0, y0 = pts[i]
        x1, y1 = pts[(i + 1) % n]
        s += x0 * y1 - x1 * y0
    return s


def _point_in_tri(px, py, ax, ay, bx, by, cx, cy) -> bool:
    o1 = _orient1(ax, ay, bx, by, px, py)
    o2 = _orient1(bx, by, cx, cy, px, py)
    o3 = _orient1(cx, cy, ax, ay, px, py)
    return (o1 >= 0 and o2 >= 0 and o3 >= 0) or (o1 <= 0 and o2 <= 0 and o3 <= 0)


def tessellate(outer: list[tuple[int, int]], holes: list[list[tuple[int, int]]]):
    """Ear-clipping with hole bridging over integer coords (Tessellator.kt's
    algorithm family — earcut). Returns [(a, b, c, ab, bc, ca)] with
    vertices (x, y) int pairs and the original-boundary edge flags.

    The outer ring is normalized CCW and holes CW; each hole is joined to
    the ring via a two-way bridge from its rightmost vertex to a visible
    vertex (Eberly), the bridge edges flagged as NOT from the polygon."""
    outer = _dedup_closed(list(outer))
    if len(outer) < 3:
        raise ValueError("degenerate polygon after quantization")
    if _signed_area2(outer) < 0:
        outer = outer[::-1]

    # original boundary edge set (undirected), incl. hole rings
    boundary: set[tuple[tuple[int, int], tuple[int, int]]] = set()

    def _mark(ring):
        n = len(ring)
        for i in range(n):
            u, v = ring[i], ring[(i + 1) % n]
            boundary.add((u, v))
            boundary.add((v, u))

    _mark(outer)

    verts = list(outer)
    for hole in holes:
        h = _dedup_closed(list(hole))
        if len(h) < 3:
            continue
        if _signed_area2(h) > 0:
            h = h[::-1]  # holes CW
        _mark(h)
        verts = _bridge_hole(verts, h)

    tris = []
    n = len(verts)
    idx = list(range(n))
    guard = 0
    while len(idx) > 3 and guard < 2 * n * n:
        guard += 1
        ear_found = False
        m = len(idx)
        for k in range(m):
            i0, i1, i2 = idx[(k - 1) % m], idx[k], idx[(k + 1) % m]
            a, b, c = verts[i0], verts[i1], verts[i2]
            if _orient1(a[0], a[1], b[0], b[1], c[0], c[1]) <= 0:
                continue  # reflex or collinear
            # no other vertex inside the candidate ear
            ok = True
            for j in idx:
                if j in (i0, i1, i2):
                    continue
                p = verts[j]
                if p in (a, b, c):
                    continue
                if _point_in_tri(p[0], p[1], a[0], a[1], b[0], b[1], c[0], c[1]):
                    ok = False
                    break
            if not ok:
                continue
            tris.append(_emit_tri(a, b, c, boundary))
            idx.pop(k)
            ear_found = True
            break
        if not ear_found:
            # degenerate remainder: drop collinear spikes (orient == 0 with
            # both neighbors — duplicated bridge vertices produce these),
            # else the input is beyond this tessellator — fail LOUDLY rather
            # than emit a silently-wrong mesh (Tessellator.kt throws too)
            dropped = False
            for k in range(m):
                i0, i1, i2 = idx[(k - 1) % m], idx[k], idx[(k + 1) % m]
                a, b, c = verts[i0], verts[i1], verts[i2]
                if _orient1(a[0], a[1], b[0], b[1], c[0], c[1]) == 0:
                    idx.pop(k)
                    dropped = True
                    break
            if not dropped:
                raise ValueError(
                    "unable to tessellate polygon (possible self-intersection "
                    "or unsupported hole placement)"
                )
    if len(idx) == 3:
        a, b, c = (verts[i] for i in idx)
        if _orient1(a[0], a[1], b[0], b[1], c[0], c[1]) != 0:
            tris.append(_emit_tri(a, b, c, boundary))
    return tris


def _emit_tri(a, b, c, boundary):
    return (
        a, b, c,
        (a, b) in boundary,
        (b, c) in boundary,
        (c, a) in boundary,
    )


def _bridge_hole(verts: list[tuple[int, int]], hole: list[tuple[int, int]]):
    """Splice the hole into the outer list via a bridge from the hole's
    rightmost vertex to the nearest visible outer vertex with x >= it."""
    hi = max(range(len(hole)), key=lambda i: hole[i])
    hx, hy = hole[hi]
    # pick the outer vertex minimizing distance among those to the right;
    # fall back to global nearest (keeps the splice valid for our simple
    # synthetic shapes; Lucene runs the full visibility test)
    cands = [i for i, (x, _) in enumerate(verts) if x >= hx]
    pool = cands if cands else range(len(verts))
    oi = min(pool, key=lambda i: (verts[i][0] - hx) ** 2 + (verts[i][1] - hy) ** 2)
    rotated = hole[hi:] + hole[:hi]
    return verts[: oi + 1] + rotated + [rotated[0], verts[oi]] + verts[oi + 1:]


# ----------------------------------------------------------- triangle rows

def _shape_rows(doc_id: int, geom, xy: bool) -> list[tuple]:
    rows: list[tuple] = []
    if isinstance(geom, ShapeCollection):
        for g in geom.shapes:
            rows.extend(_shape_rows(doc_id, g, xy))
        return rows
    if isinstance(geom, ShapePoint):
        ex, ey = _encode_pt(geom.x, geom.y, xy)
        rows.append((doc_id, TYPE_POINT, ex, ey, ex, ey, ex, ey, True, True, True))
        return rows
    if isinstance(geom, ShapeLine):
        pts = [_encode_pt(x, y, xy) for x, y in zip(geom.xs, geom.ys)]
        for (ax, ay), (bx, by) in zip(pts, pts[1:]):
            rows.append((doc_id, TYPE_LINE, ax, ay, bx, by, bx, by, True, True, True))
        return rows
    if isinstance(geom, ShapePolygon):
        outer = [_encode_pt(x, y, xy) for x, y in zip(geom.xs, geom.ys)]
        holes = [
            [_encode_pt(x, y, xy) for x, y in zip(h.xs, h.ys)] for h in geom.holes
        ]
        for (a, b, c, ab, bc, ca) in tessellate(outer, holes):
            rows.append(
                (doc_id, TYPE_TRIANGLE, a[0], a[1], b[0], b[1], c[0], c[1], ab, bc, ca)
            )
        return rows
    raise ValueError(f"unsupported geometry {type(geom).__name__}")


_TRI_SCHEMA = (
    "doc_id long, ttype int, ax int, ay int, bx int, by int, cx int, cy int, "
    "ab boolean, bc boolean, ca boolean, "
    "min_x int, max_x int, min_y int, max_y int, "
    "doc_min_x int, doc_max_x int, doc_min_y int, doc_max_y int"
)


def shape_index(df: DataFrame, wkt_col: str = "wkt", doc_id_col: str = "doc_id",
                xy: bool = False) -> DataFrame:
    """Tessellate one WKT geometry per row into triangle rows (LatLonShape
    createIndexableFields analog). Pure per-row work in ``mapInPandas``;
    per-triangle AND per-doc encoded bboxes materialized as columns so
    Parquet min/max stats prune the relation scans."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "doc_id", "ttype", "ax", "ay", "bx", "by", "cx", "cy", "ab", "bc", "ca",
        ]
        for pdf in batches:
            # one row-tuple list per BATCH (a per-doc DataFrame costs ~100x
            # the geometry itself — measured 21.6s -> ~2s at 101k docs)
            rows: list[tuple] = []
            for doc_id, wkt in zip(pdf[doc_id_col], pdf[wkt_col]):
                rows.extend(_shape_rows(int(doc_id), parse_wkt(wkt), xy))
            if not rows:
                continue
            r = pd.DataFrame(rows, columns=cols)
            xs = r[["ax", "bx", "cx"]].to_numpy(np.int64)
            ys = r[["ay", "by", "cy"]].to_numpy(np.int64)
            r["min_x"] = xs.min(axis=1)
            r["max_x"] = xs.max(axis=1)
            r["min_y"] = ys.min(axis=1)
            r["max_y"] = ys.max(axis=1)
            g = r.groupby("doc_id")
            r["doc_min_x"] = g["min_x"].transform("min")
            r["doc_max_x"] = g["max_x"].transform("max")
            r["doc_min_y"] = g["min_y"].transform("min")
            r["doc_max_y"] = g["max_y"].transform("max")
            yield r

    return df.select(doc_id_col, wkt_col).mapInPandas(gen, _TRI_SCHEMA)


# ------------------------------------------------------------ query shapes

@dataclass(frozen=True)
class ShapeBoxQuery:
    """LatLonShapeBoundingBoxQuery / XYShape box analog. Coordinates are
    quantized like Rectangle2D.create: min edges ceil-encoded, max edges
    floor-encoded, then all tests run on the integer grid."""

    min_x: float
    max_x: float
    min_y: float
    max_y: float
    xy: bool = False

    def __post_init__(self):
        if self.xy and self.min_x > self.max_x:
            raise ValueError("XY boxes cannot wrap: min_x > max_x")

    def crosses_dateline(self) -> bool:
        # Rectangle2D.create: minLon == 180 with wrap degenerates to -180
        return (not self.xy) and self.min_x > self.max_x and self.min_x != 180.0

    def encoded(self) -> tuple[int, int, int, int]:
        if self.crosses_dateline():
            raise ValueError("encode after _normalize_query splits the wrap")
        if self.xy:
            # XYEncodingUtils float32 quantization of the box edges
            return (
                _xy_encode(self.min_x),
                _xy_encode(self.max_x),
                _xy_encode(self.min_y),
                _xy_encode(self.max_y),
            )
        # Rectangle2D.create: minLon==180 with wrap degenerates to -180
        min_x = -180.0 if (self.min_x == 180.0 and self.min_x > self.max_x) else self.min_x
        return (
            _geo.encode_longitude_ceil(min_x),
            _geo.encode_longitude(self.max_x),
            _geo.encode_latitude_ceil(self.min_y),
            _geo.encode_latitude(self.max_y),
        )


@dataclass(frozen=True)
class ShapePolygonQuery:
    """LatLonShapeQuery with a polygon geometry (Polygon2D relate logic)."""

    xs: tuple[float, ...]
    ys: tuple[float, ...]
    holes: tuple = ()
    xy: bool = False


@dataclass(frozen=True)
class ShapeCircleQuery:
    """LatLonShape distance query (geo/Circle2D.kt HaversinDistance) or
    XYShape circle (CartesianDistance) over the triangle table.

    ``x``/``y`` = center lon/lat (geo) or cartesian x/y (xy=True);
    ``radius`` = meters (geo) or units (xy; quantized to float32 like
    XYCircle's fields).

    Semantics follow Circle2D.kt exactly — intersectsTriangle =
    vertex-contained | center-in-triangle | per-edge planar projection
    (Circle2D.kt:509-548) with the dateline shifted-center retry
    (Circle2D.kt:397-406); containsTriangle = all vertices contained;
    withinTriangle = NOTWITHIN on contained vertices / flagged-edge
    crossings, CANDIDATE when the center lies in the triangle
    (Circle2D.kt:148-196) — with ONE documented precision stance:
    ``contains(x, y)`` is the exact-trig haversine ball (resp. exact double
    cartesian distance), not gated by the float-rect shortcut, per the
    repo-wide geo protocol (DEVIATIONS #12)."""

    x: float
    y: float
    radius: float
    xy: bool = False

    def __post_init__(self):
        if not (math.isfinite(self.radius) and self.radius > 0):
            raise ValueError(f"invalid circle radius {self.radius}")
        if self.xy:
            if not (math.isfinite(self.x) and math.isfinite(self.y)):
                raise ValueError("invalid XY circle center: must be finite")
        else:
            _geo._check_lat(self.y)
            _geo._check_lon(self.x)

    def _crosses_dateline(self) -> bool:
        if self.xy:
            return False
        _, _, min_lon, max_lon = _geo.circle_bbox(self.y, self.x, self.radius)
        full = min_lon <= _geo.MIN_LON_INCL and max_lon >= _geo.MAX_LON_INCL
        # full-range lon from circle_bbox means dateline wrap OR pole overlap;
        # either way the shifted-center line retry is harmless and faithful
        return full

    def bbox_encoded(self) -> tuple[int, int, int, int]:
        """Conservative OUTER box on the int grid (prefilter for INTERSECTS /
        WITHIN candidate pruning)."""
        if self.xy:
            cx, cy, r = np.float32(self.x), np.float32(self.y), np.float32(self.radius)
            lo_x = float(np.nextafter(cx - r, np.float32("-inf")))
            hi_x = float(np.nextafter(cx + r, np.float32("inf")))
            lo_y = float(np.nextafter(cy - r, np.float32("-inf")))
            hi_y = float(np.nextafter(cy + r, np.float32("inf")))
            return (_xy_encode(lo_x), _xy_encode(hi_x), _xy_encode(lo_y), _xy_encode(hi_y))
        min_lat, max_lat, min_lon, max_lon = _geo.circle_bbox(self.y, self.x, self.radius)
        return (
            _geo.encode_longitude(min_lon),
            _geo.encode_longitude_ceil(max_lon),
            _geo.encode_latitude(min_lat),
            _geo.encode_latitude_ceil(max_lat),
        )

    def bbox_encoded_inner(self) -> tuple[int, int, int, int]:
        """A grid box guaranteed ⊆ the exact distance ball — the CONTAINS
        candidate prefilter needs doc_bbox ⊇ (a subset of) the query shape,
        so the padded outer box would over-prune docs that barely contain
        the circle."""
        if self.xy:
            cx, cy = float(np.float32(self.x)), float(np.float32(self.y))
            r = float(np.float32(self.radius))
            def enc_min(v):
                e = _xy_encode(v)
                return e + 1 if _xy_decode(e) < v else e
            def enc_max(v):
                e = _xy_encode(v)
                return e - 1 if _xy_decode(e) > v else e
            return (enc_min(cx - r), enc_max(cx + r), enc_min(cy - r), enc_max(cy + r))
        rad = self.radius / _geo.EARTH_MEAN_RADIUS_METERS
        d_lat = math.degrees(rad)
        min_lat, max_lat = self.y - d_lat, self.y + d_lat
        if min_lat < _geo.MIN_LAT_INCL or max_lat > _geo.MAX_LAT_INCL or self._crosses_dateline():
            # pole/dateline overlap: degenerate to the center point (⊆ ball)
            e_x, e_y = _geo.encode_longitude(self.x), _geo.encode_latitude(self.y)
            return (e_x, e_x, e_y, e_y)
        # lon extent AT the center's latitude: a point on the ball, hence a
        # lower bound of the ball's true lon extremes
        s = math.sin(rad / 2.0) / max(math.cos(math.radians(self.y)), 1e-12)
        d_lon = math.degrees(2.0 * math.asin(min(1.0, s)))
        return (
            _geo.encode_longitude_ceil(max(self.x - d_lon, _geo.MIN_LON_INCL)),
            _geo.encode_longitude(min(self.x + d_lon, _geo.MAX_LON_INCL)),
            _geo.encode_latitude_ceil(min_lat),
            _geo.encode_latitude(max_lat),
        )


@dataclass(frozen=True)
class ShapeLineQuery:
    """LatLonShapeQuery with a polyline geometry (Line2D relate logic):
    INTERSECTS = crossings-with-boundary or a line vertex inside the
    triangle; WITHIN matches only point docs ON the line (Line2D.
    containsLine/containsTriangle return false — 'can be improved?' in the
    reference too); CONTAINS uses the flag-aware withinTriangle/Line/Point."""

    xs: tuple[float, ...]
    ys: tuple[float, ...]
    xy: bool = False


# ------------------------------------------------- per-triangle kernels

def _box_kernel(pdf: pd.DataFrame, q: tuple[int, int, int, int], mode: str) -> np.ndarray:
    """Rectangle2D.{intersects,contains,within}Triangle/Line/Point on encoded
    ints, vectorized over the batch. mode: 'intersects' | 'within' |
    'contains' (returns WithinRelation codes)."""
    qminx, qmaxx, qminy, qmaxy = (int(v) for v in q)
    ax = pdf["ax"].to_numpy(np.int64)
    ay = pdf["ay"].to_numpy(np.int64)
    bx = pdf["bx"].to_numpy(np.int64)
    by = pdf["by"].to_numpy(np.int64)
    cx = pdf["cx"].to_numpy(np.int64)
    cy = pdf["cy"].to_numpy(np.int64)
    tmin_x = pdf["min_x"].to_numpy(np.int64)
    tmax_x = pdf["max_x"].to_numpy(np.int64)
    tmin_y = pdf["min_y"].to_numpy(np.int64)
    tmax_y = pdf["max_y"].to_numpy(np.int64)
    ttype = pdf["ttype"].to_numpy(np.int64)

    bbox_overlap = (
        (tmin_x <= qmaxx) & (tmax_x >= qminx) & (tmin_y <= qmaxy) & (tmax_y >= qminy)
    )

    def inside(px, py):
        return (px >= qminx) & (px <= qmaxx) & (py >= qminy) & (py <= qmaxy)

    if mode == "within":
        # Rectangle2D.containsTriangle/Line/Point: triangle bbox within box
        return (
            (tmin_x >= qminx) & (tmax_x <= qmaxx) & (tmin_y >= qminy) & (tmax_y <= qmaxy)
        )

    corners = ((qminx, qmaxy, qmaxx, qmaxy), (qmaxx, qmaxy, qmaxx, qminy),
               (qmaxx, qminy, qminx, qminy), (qminx, qminy, qminx, qmaxy))

    def edge_hits_box(px, py, rx, ry):
        # bbox-of-edge vs box shortcut, then 4 boundary crossing tests
        emin_x, emax_x = np.minimum(px, rx), np.maximum(px, rx)
        emin_y, emax_y = np.minimum(py, ry), np.maximum(py, ry)
        alive = (emax_x >= qminx) & (emin_x <= qmaxx) & (emax_y >= qminy) & (emin_y <= qmaxy)
        hit = np.zeros(len(px), bool)
        for (sx, sy, tx, ty) in corners:
            hit |= _cross_with_boundary(px, py, rx, ry, sx, sy, tx, ty)
        return alive & hit

    if mode == "intersects":
        res = inside(ax, ay)
        is_line = ttype >= TYPE_LINE
        is_tri = ttype == TYPE_TRIANGLE
        res |= is_line & inside(bx, by)
        res |= is_tri & inside(cx, cy)
        # query corner inside the triangle (Component2D.pointInTriangle)
        px = np.full_like(ax, qminx)
        py = np.full_like(ay, qminy)
        o1 = _orient_vec(px, py, ax, ay, bx, by)
        o2 = _orient_vec(px, py, bx, by, cx, cy)
        o3 = _orient_vec(px, py, cx, cy, ax, ay)
        corner_in = (
            ((o1 >= 0) & (o2 >= 0) & (o3 >= 0)) | ((o1 <= 0) & (o2 <= 0) & (o3 <= 0))
        ) & (qminx >= tmin_x) & (qminx <= tmax_x) & (qminy >= tmin_y) & (qminy <= tmax_y)
        res |= is_tri & corner_in
        res |= is_line & edge_hits_box(ax, ay, bx, by)
        res |= is_tri & (edge_hits_box(bx, by, cx, cy) | edge_hits_box(cx, cy, ax, ay))
        return res & bbox_overlap

    if mode == "contains":
        rel = np.full(len(ax), WITHIN_DISJOINT, np.int64)
        # any shape vertex inside the box -> NOTWITHIN
        vert_in = inside(ax, ay)
        vert_in |= (ttype >= TYPE_LINE) & inside(bx, by)
        vert_in |= (ttype == TYPE_TRIANGLE) & inside(cx, cy)
        ab = pdf["ab"].to_numpy(bool)
        bc = pdf["bc"].to_numpy(bool)
        ca = pdf["ca"].to_numpy(bool)
        e_ab = edge_hits_box(ax, ay, bx, by) & (ttype >= TYPE_LINE)
        e_bc = edge_hits_box(bx, by, cx, cy) & (ttype == TYPE_TRIANGLE)
        e_ca = edge_hits_box(cx, cy, ax, ay) & (ttype == TYPE_TRIANGLE)
        notwithin = vert_in | (e_ab & ab) | (e_bc & bc) | (e_ca & ca)
        candidate = (e_ab & ~ab) | (e_bc & ~bc) | (e_ca & ~ca)
        # box fully inside the triangle: its min corner is in the triangle
        px = np.full_like(ax, qminx)
        py = np.full_like(ay, qminy)
        o1 = _orient_vec(px, py, ax, ay, bx, by)
        o2 = _orient_vec(px, py, bx, by, cx, cy)
        o3 = _orient_vec(px, py, cx, cy, ax, ay)
        corner_in = (
            ((o1 >= 0) & (o2 >= 0) & (o3 >= 0)) | ((o1 <= 0) & (o2 <= 0) & (o3 <= 0))
        ) & (qminx >= tmin_x) & (qminx <= tmax_x) & (qminy >= tmin_y) & (qminy <= tmax_y)
        candidate |= (ttype == TYPE_TRIANGLE) & corner_in
        rel[candidate & bbox_overlap] = WITHIN_CANDIDATE
        rel[notwithin & bbox_overlap] = WITHIN_NOTWITHIN
        return rel

    raise ValueError(mode)


def _polygon_arrays(q: ShapePolygonQuery):
    if q.xy:
        xs = np.array([_xy_encode(v) for v in q.xs], np.int64)
        ys = np.array([_xy_encode(v) for v in q.ys], np.int64)
    else:
        xs = np.array([_geo.encode_longitude(v) for v in q.xs], np.int64)
        ys = np.array([_geo.encode_latitude(v) for v in q.ys], np.int64)
    if xs[0] == xs[-1] and ys[0] == ys[-1] and len(xs) > 1:
        xs, ys = xs[:-1], ys[:-1]
    return xs, ys


def _pnpoly_int(px: np.ndarray, py: np.ndarray, xs: np.ndarray, ys: np.ndarray) -> np.ndarray:
    """Point-in-polygon on integer coords: crossing count with on-edge =
    contained (EdgeTree contains semantics)."""
    n = len(xs)
    inside = np.zeros(len(px), bool)
    on_edge = np.zeros(len(px), bool)
    for i in range(n):
        x0, y0 = int(xs[i]), int(ys[i])
        x1, y1 = int(xs[(i + 1) % n]), int(ys[(i + 1) % n])
        # on-segment test (exact)
        within_bb = (
            (px >= min(x0, x1)) & (px <= max(x0, x1))
            & (py >= min(y0, y1)) & (py <= max(y0, y1))
        )
        col = _orient_vec(
            np.full_like(px, x0), np.full_like(py, y0),
            np.full_like(px, x1), np.full_like(py, y1), px, py,
        ) == 0
        on_edge |= within_bb & col
        cond = ((y0 > py) != (y1 > py))
        if not cond.any():
            continue
        # ray-cast "point strictly left of edge" is an exact orientation
        # sign: upward edge -> orient(e0, e1, p) > 0, downward -> < 0
        o = _orient_vec(
            np.full_like(px, x0), np.full_like(py, y0),
            np.full_like(px, x1), np.full_like(py, y1), px, py,
        )
        cmp = (o > 0) if y1 > y0 else (o < 0)
        inside ^= cond & cmp
    return inside | on_edge


def _poly_kernel(pdf: pd.DataFrame, q: ShapePolygonQuery, mode: str) -> np.ndarray:
    """Polygon2D.{intersects,contains}Triangle analog on encoded ints."""
    xs, ys = _polygon_arrays(q)
    qminx, qmaxx = int(xs.min()), int(xs.max())
    qminy, qmaxy = int(ys.min()), int(ys.max())
    ax = pdf["ax"].to_numpy(np.int64)
    ay = pdf["ay"].to_numpy(np.int64)
    bx = pdf["bx"].to_numpy(np.int64)
    by = pdf["by"].to_numpy(np.int64)
    cx = pdf["cx"].to_numpy(np.int64)
    cy = pdf["cy"].to_numpy(np.int64)
    ttype = pdf["ttype"].to_numpy(np.int64)
    bbox_overlap = (
        (pdf["min_x"].to_numpy(np.int64) <= qmaxx)
        & (pdf["max_x"].to_numpy(np.int64) >= qminx)
        & (pdf["min_y"].to_numpy(np.int64) <= qmaxy)
        & (pdf["max_y"].to_numpy(np.int64) >= qminy)
    )

    in_a = _pnpoly_int(ax, ay, xs, ys)
    in_b = _pnpoly_int(bx, by, xs, ys)
    in_c = _pnpoly_int(cx, cy, xs, ys)
    if mode == "contains":
        # Polygon2D.withinTriangle: shape vertices inside the query polygon
        # -> NOTWITHIN; polygon edges crossing a FLAGGED (original) triangle
        # edge -> NOTWITHIN, an unflagged one -> CANDIDATE; polygon's first
        # vertex inside the triangle -> CANDIDATE
        vert_in = in_a | ((ttype >= TYPE_LINE) & in_b) | ((ttype == TYPE_TRIANGLE) & in_c)
        ab = pdf["ab"].to_numpy(bool)
        bc = pdf["bc"].to_numpy(bool)
        ca = pdf["ca"].to_numpy(bool)
        e_ab = np.zeros(len(ax), bool)
        e_bc = np.zeros(len(ax), bool)
        e_ca = np.zeros(len(ax), bool)
        n = len(xs)
        for i in range(n):
            sx, sy = int(xs[i]), int(ys[i])
            tx, ty = int(xs[(i + 1) % n]), int(ys[(i + 1) % n])
            e_ab |= _cross_with_boundary(ax, ay, bx, by, sx, sy, tx, ty)
            e_bc |= _cross_with_boundary(bx, by, cx, cy, sx, sy, tx, ty)
            e_ca |= _cross_with_boundary(cx, cy, ax, ay, sx, sy, tx, ty)
        e_ab &= ttype >= TYPE_LINE
        e_bc &= ttype == TYPE_TRIANGLE
        e_ca &= ttype == TYPE_TRIANGLE
        notwithin = vert_in | (e_ab & ab) | (e_bc & bc) | (e_ca & ca)
        candidate = (e_ab & ~ab) | (e_bc & ~bc) | (e_ca & ~ca)
        px = np.full_like(ax, int(xs[0]))
        py = np.full_like(ay, int(ys[0]))
        o1 = _orient_vec(px, py, ax, ay, bx, by)
        o2 = _orient_vec(px, py, bx, by, cx, cy)
        o3 = _orient_vec(px, py, cx, cy, ax, ay)
        first_in_tri = (
            ((o1 >= 0) & (o2 >= 0) & (o3 >= 0)) | ((o1 <= 0) & (o2 <= 0) & (o3 <= 0))
        ) & (px >= pdf["min_x"].to_numpy(np.int64)) & (px <= pdf["max_x"].to_numpy(np.int64)) \
          & (py >= pdf["min_y"].to_numpy(np.int64)) & (py <= pdf["max_y"].to_numpy(np.int64))
        candidate |= (ttype == TYPE_TRIANGLE) & first_in_tri
        rel = np.full(len(ax), WITHIN_DISJOINT, np.int64)
        rel[candidate & bbox_overlap] = WITHIN_CANDIDATE
        rel[notwithin & bbox_overlap] = WITHIN_NOTWITHIN
        return rel
    if mode == "within":
        res = in_a.copy()
        res &= np.where(ttype >= TYPE_LINE, in_b, True)
        res &= np.where(ttype == TYPE_TRIANGLE, in_c, True)
        # no polygon edge may STRICTLY cross the triangle (containsTriangle
        # passes includeBoundary=false — shared boundary stays within); a
        # hole sitting inside the triangle is caught by the crossing test
        # on its ring edges
        edge_cross = _poly_edges_cross(pdf, xs, ys, strict=True)
        return res & ~edge_cross & bbox_overlap

    # intersects: any vertex inside, or any edge crossing, or the triangle
    # containing the polygon's first vertex
    res = in_a | ((ttype >= TYPE_LINE) & in_b) | ((ttype == TYPE_TRIANGLE) & in_c)
    res |= _poly_edges_cross(pdf, xs, ys)
    px = np.full_like(ax, int(xs[0]))
    py = np.full_like(ay, int(ys[0]))
    o1 = _orient_vec(px, py, ax, ay, bx, by)
    o2 = _orient_vec(px, py, bx, by, cx, cy)
    o3 = _orient_vec(px, py, cx, cy, ax, ay)
    first_in_tri = (
        ((o1 >= 0) & (o2 >= 0) & (o3 >= 0)) | ((o1 <= 0) & (o2 <= 0) & (o3 <= 0))
    )
    res |= (ttype == TYPE_TRIANGLE) & first_in_tri
    return res & bbox_overlap


def _line_arrays(q: ShapeLineQuery):
    if q.xy:
        xs = np.array([_xy_encode(v) for v in q.xs], np.int64)
        ys = np.array([_xy_encode(v) for v in q.ys], np.int64)
    else:
        xs = np.array([_geo.encode_longitude(v) for v in q.xs], np.int64)
        ys = np.array([_geo.encode_latitude(v) for v in q.ys], np.int64)
    return xs, ys


def _point_on_polyline(px: np.ndarray, py: np.ndarray, xs, ys) -> np.ndarray:
    """Line2D.contains: point exactly ON some segment (collinear + in bbox)."""
    on = np.zeros(len(px), bool)
    for i in range(len(xs) - 1):
        x0, y0, x1, y1 = int(xs[i]), int(ys[i]), int(xs[i + 1]), int(ys[i + 1])
        bb = (
            (px >= min(x0, x1)) & (px <= max(x0, x1))
            & (py >= min(y0, y1)) & (py <= max(y0, y1))
        )
        col = _orient_vec(
            np.full_like(px, x0), np.full_like(py, y0),
            np.full_like(px, x1), np.full_like(py, y1), px, py,
        ) == 0
        on |= bb & col
    return on


def _line_kernel(pdf: pd.DataFrame, q: ShapeLineQuery, mode: str) -> np.ndarray:
    """Line2D.{intersects,contains,within}Triangle/Line/Point analog."""
    xs, ys = _line_arrays(q)
    qminx, qmaxx = int(xs.min()), int(xs.max())
    qminy, qmaxy = int(ys.min()), int(ys.max())
    ax = pdf["ax"].to_numpy(np.int64)
    ay = pdf["ay"].to_numpy(np.int64)
    bx = pdf["bx"].to_numpy(np.int64)
    by = pdf["by"].to_numpy(np.int64)
    cx = pdf["cx"].to_numpy(np.int64)
    cy = pdf["cy"].to_numpy(np.int64)
    ttype = pdf["ttype"].to_numpy(np.int64)
    bbox_overlap = (
        (pdf["min_x"].to_numpy(np.int64) <= qmaxx)
        & (pdf["max_x"].to_numpy(np.int64) >= qminx)
        & (pdf["min_y"].to_numpy(np.int64) <= qmaxy)
        & (pdf["max_y"].to_numpy(np.int64) >= qminy)
    )
    if mode == "within":
        # only POINT docs lying on the polyline can be within a line
        return (ttype == TYPE_POINT) & _point_on_polyline(ax, ay, xs, ys) & bbox_overlap

    def seg_crossings(strict: bool = False):
        cross = _cross_strict if strict else _cross_with_boundary
        e_ab = np.zeros(len(ax), bool)
        e_bc = np.zeros(len(ax), bool)
        e_ca = np.zeros(len(ax), bool)
        for i in range(len(xs) - 1):
            sx, sy = int(xs[i]), int(ys[i])
            tx, ty = int(xs[i + 1]), int(ys[i + 1])
            e_ab |= cross(ax, ay, bx, by, sx, sy, tx, ty)
            e_bc |= cross(bx, by, cx, cy, sx, sy, tx, ty)
            e_ca |= cross(cx, cy, ax, ay, sx, sy, tx, ty)
        return (
            e_ab & (ttype >= TYPE_LINE),
            e_bc & (ttype == TYPE_TRIANGLE),
            e_ca & (ttype == TYPE_TRIANGLE),
        )

    px = np.full_like(ax, int(xs[0]))
    py = np.full_like(ay, int(ys[0]))
    o1 = _orient_vec(px, py, ax, ay, bx, by)
    o2 = _orient_vec(px, py, bx, by, cx, cy)
    o3 = _orient_vec(px, py, cx, cy, ax, ay)
    first_in_tri = (
        ((o1 >= 0) & (o2 >= 0) & (o3 >= 0)) | ((o1 <= 0) & (o2 <= 0) & (o3 <= 0))
    ) & (px >= pdf["min_x"].to_numpy(np.int64)) & (px <= pdf["max_x"].to_numpy(np.int64)) \
      & (py >= pdf["min_y"].to_numpy(np.int64)) & (py <= pdf["max_y"].to_numpy(np.int64))

    if mode == "intersects":
        e_ab, e_bc, e_ca = seg_crossings()
        res = e_ab | e_bc | e_ca
        res |= (ttype == TYPE_TRIANGLE) & first_in_tri
        res |= (ttype == TYPE_POINT) & _point_on_polyline(ax, ay, xs, ys)
        return res & bbox_overlap

    if mode == "contains":
        ab = pdf["ab"].to_numpy(bool)
        bc = pdf["bc"].to_numpy(bool)
        ca = pdf["ca"].to_numpy(bool)
        e_ab, e_bc, e_ca = seg_crossings()
        # POINT doc: contains(point) -> NOTWITHIN (withinPoint)
        pt_hit = (ttype == TYPE_POINT) & _point_on_polyline(ax, ay, xs, ys)
        notwithin = pt_hit | (e_ab & ab) | (e_bc & bc) | (e_ca & ca)
        candidate = (e_ab & ~ab) | (e_bc & ~bc) | (e_ca & ~ca)
        candidate |= (ttype == TYPE_TRIANGLE) & first_in_tri
        rel = np.full(len(ax), WITHIN_DISJOINT, np.int64)
        rel[candidate & bbox_overlap] = WITHIN_CANDIDATE
        rel[notwithin & bbox_overlap] = WITHIN_NOTWITHIN
        return rel

    raise ValueError(mode)


def _poly_edges_cross(pdf: pd.DataFrame, xs: np.ndarray, ys: np.ndarray,
                      strict: bool = False) -> np.ndarray:
    ax = pdf["ax"].to_numpy(np.int64)
    ay = pdf["ay"].to_numpy(np.int64)
    bx = pdf["bx"].to_numpy(np.int64)
    by = pdf["by"].to_numpy(np.int64)
    cx = pdf["cx"].to_numpy(np.int64)
    cy = pdf["cy"].to_numpy(np.int64)
    ttype = pdf["ttype"].to_numpy(np.int64)
    hit = np.zeros(len(ax), bool)
    cross = _cross_strict if strict else _cross_with_boundary
    n = len(xs)
    for i in range(n):
        sx, sy = int(xs[i]), int(ys[i])
        tx, ty = int(xs[(i + 1) % n]), int(ys[(i + 1) % n])
        hit |= (ttype >= TYPE_LINE) & cross(ax, ay, bx, by, sx, sy, tx, ty)
        tri = ttype == TYPE_TRIANGLE
        if tri.any():
            hit |= tri & cross(bx, by, cx, cy, sx, sy, tx, ty)
            hit |= tri & cross(cx, cy, ax, ay, sx, sy, tx, ty)
    return hit


def _haversin_meters_vec(lat1: np.ndarray, lon1: np.ndarray, lat2: float, lon2: float) -> np.ndarray:
    """Vector haversine meters with the exact op order of
    geo.haversin_meters / haversin_meters_sql (the cross-engine float
    protocol: same `1-cos` shape, center trig folded to scalars)."""
    x1 = lat1 * _geo.DEG_TO_RAD
    x2 = math.radians(lat2)
    h = (1.0 - np.cos(x1 - x2)) + np.cos(x1) * math.cos(x2) * (
        1.0 - np.cos((lon1 - float(lon2)) * _geo.DEG_TO_RAD)
    )
    return (_geo.EARTH_MEAN_RADIUS_METERS * 2.0) * np.arcsin(
        np.minimum(1.0, np.sqrt(h * 0.5))
    )


def _decode_xy_vec(e: np.ndarray) -> np.ndarray:
    b = e.astype(np.int32)
    return (b ^ ((b >> np.int32(31)) & np.int32(0x7FFFFFFF))).view(np.float32).astype(np.float64)


def _circle_kernel(pdf: pd.DataFrame, q: ShapeCircleQuery, mode: str) -> np.ndarray:
    """Circle2D.{intersects,contains,within}Triangle/Line/Point vectorized
    over the batch, on DECODED double coordinates (Circle2D works on decoded
    values, unlike the grid-interval box/poly kernels)."""
    if q.xy:
        dec_x = dec_y = _decode_xy_vec
        ccx = float(np.float32(q.x))
        ccy = float(np.float32(q.y))
        r = float(np.float32(q.radius))
        r2 = float(r) * float(r)

        def contains(px, py):
            dx = px - ccx
            dy = py - ccy
            return dx * dx + dy * dy <= r2
    else:
        dec_x = lambda e: e.astype(np.float64) * _geo.LON_DECODE  # noqa: E731
        dec_y = lambda e: e.astype(np.float64) * _geo.LAT_DECODE  # noqa: E731
        ccx, ccy, r = float(q.x), float(q.y), float(q.radius)

        def contains(px, py):
            return _haversin_meters_vec(py, px, ccy, ccx) <= r

    vax = dec_x(pdf["ax"].to_numpy(np.int64))
    vay = dec_y(pdf["ay"].to_numpy(np.int64))
    vbx = dec_x(pdf["bx"].to_numpy(np.int64))
    vby = dec_y(pdf["by"].to_numpy(np.int64))
    vcx = dec_x(pdf["cx"].to_numpy(np.int64))
    vcy = dec_y(pdf["cy"].to_numpy(np.int64))
    ttype = pdf["ttype"].to_numpy(np.int64)
    is_line = ttype >= TYPE_LINE
    is_tri = ttype == TYPE_TRIANGLE

    def iline_at(center_x, pax, pay, pbx, pby):
        # Circle2D.intersectsLine (companion, Circle2D.kt:509-548): planar
        # closest-point projection; contains() evaluated with the ORIGINAL
        # center (the shifted retry only moves the projection geometry)
        vap_x = center_x - pax
        vap_y = ccy - pay
        vab_x = pbx - pax
        vab_y = pby - pay
        mag = vab_x * vab_x + vab_y * vab_y
        dot = vap_x * vab_x + vap_y * vab_y
        with np.errstate(divide="ignore", invalid="ignore"):
            t = np.where(mag > 0, dot / mag, -1.0)
        px = pax + vab_x * t
        py = pay + vab_y * t
        ok = (t >= 0) & (t <= 1)
        ok &= (px >= np.minimum(pax, pbx)) & (px <= np.maximum(pax, pbx))
        ok &= (py >= np.minimum(pay, pby)) & (py <= np.maximum(pay, pby))
        return ok & contains(px, py)

    shift = None
    if not q.xy and q._crosses_dateline():
        shift = ccx - 360.0 if ccx > 0 else ccx + 360.0

    def iline(pax, pay, pbx, pby):
        hit = iline_at(ccx, pax, pay, pbx, pby)
        if shift is not None:
            hit = hit | iline_at(shift, pax, pay, pbx, pby)
        return hit

    c_a = contains(vax, vay)
    c_b = contains(vbx, vby)
    c_c = contains(vcx, vcy)

    def center_in_tri():
        # Component2D.pointInTriangle: bbox gate + orientation signs (doubles;
        # boundary-inclusive, matching the SQL BETWEEN mirror)
        o1 = (vbx - vax) * (ccy - vay) - (vby - vay) * (ccx - vax)
        o2 = (vcx - vbx) * (ccy - vby) - (vcy - vby) * (ccx - vbx)
        o3 = (vax - vcx) * (ccy - vcy) - (vay - vcy) * (ccx - vcx)
        inside = ((o1 >= 0) & (o2 >= 0) & (o3 >= 0)) | ((o1 <= 0) & (o2 <= 0) & (o3 <= 0))
        tmin_x = np.minimum(np.minimum(vax, vbx), vcx)
        tmax_x = np.maximum(np.maximum(vax, vbx), vcx)
        tmin_y = np.minimum(np.minimum(vay, vby), vcy)
        tmax_y = np.maximum(np.maximum(vay, vby), vcy)
        gate = (ccx >= tmin_x) & (ccx <= tmax_x) & (ccy >= tmin_y) & (ccy <= tmax_y)
        return inside & gate

    if mode == "intersects":
        res = c_a | (is_line & c_b) | (is_tri & c_c)
        res |= is_tri & center_in_tri()
        il_ab = iline(vax, vay, vbx, vby)
        res |= is_line & il_ab
        tri_rows = is_tri
        if tri_rows.any():
            res |= tri_rows & (iline(vbx, vby, vcx, vcy) | iline(vcx, vcy, vax, vay))
        return res

    if mode == "within":
        # Circle2D.containsTriangle/Line/Point: every vertex contained
        return c_a & (~is_line | c_b) & (~is_tri | c_c)

    if mode == "contains":
        # Circle2D.withinTriangle/Line/Point -> WithinRelation codes
        rel = np.full(len(vax), WITHIN_DISJOINT, np.int64)
        vert_in = c_a | (is_line & c_b) | (is_tri & c_c)
        ab = pdf["ab"].to_numpy(bool)
        bc = pdf["bc"].to_numpy(bool)
        ca = pdf["ca"].to_numpy(bool)
        notwithin = vert_in
        notwithin |= is_line & ab & iline(vax, vay, vbx, vby)
        if is_tri.any():
            notwithin |= is_tri & bc & iline(vbx, vby, vcx, vcy)
            notwithin |= is_tri & ca & iline(vcx, vcy, vax, vay)
        candidate = is_tri & center_in_tri()
        rel[candidate] = WITHIN_CANDIDATE
        rel[notwithin] = WITHIN_NOTWITHIN
        return rel

    raise ValueError(mode)


# ------------------------------------------------------------ the doc sets

def _exact_flag_df(tris: DataFrame, q, mode: str) -> DataFrame:
    """(doc_id, flag) rows: the exact per-triangle predicate via Arrow."""

    comps = list(q) if isinstance(q, (list, tuple)) else [q]

    def _one(pdf, comp):
        if isinstance(comp, ShapeBoxQuery):
            return _box_kernel(pdf, comp.encoded(), mode)
        if isinstance(comp, ShapeLineQuery):
            return _line_kernel(pdf, comp, mode)
        if isinstance(comp, ShapeCircleQuery):
            return _circle_kernel(pdf, comp, mode)
        return _poly_kernel(pdf, comp, mode)

    if mode == "contains" and len(comps) > 1:
        raise ValueError("multi-geometry CONTAINS is combined per component in shape_docset")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            # multi-geometry = ComponentTree union: a triangle intersects /
            # is-within the union iff it does for SOME component
            # (ComponentTree.kt delegates per side and ORs)
            flag = _one(pdf, comps[0])
            for comp in comps[1:]:
                flag = flag | _one(pdf, comp)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "flag": np.asarray(flag).astype(np.int64)})

    return tris.mapInPandas(gen, "doc_id long, flag long")


def _box_overlap_pred(q: ShapeBoxQuery):
    qminx, qmaxx, qminy, qmaxy = q.encoded()
    return (
        (F.col("min_x") <= F.lit(int(qmaxx)))
        & (F.col("max_x") >= F.lit(int(qminx)))
        & (F.col("min_y") <= F.lit(int(qmaxy)))
        & (F.col("max_y") >= F.lit(int(qminy)))
    )


def _query_bbox(q, inner: bool = False) -> tuple[int, int, int, int]:
    """Encoded query bbox. ``inner=True`` (the CONTAINS prefilter) returns a
    box guaranteed ⊆ the query shape's extent — identical to the outer box
    for exact-extent geometries, smaller for circles (whose outer box is
    padded conservatively)."""
    if isinstance(q, (list, tuple)):
        boxes = [_query_bbox(c, inner) for c in q]
        return (
            min(b[0] for b in boxes), max(b[1] for b in boxes),
            min(b[2] for b in boxes), max(b[3] for b in boxes),
        )
    if isinstance(q, ShapeBoxQuery):
        return q.encoded()
    if isinstance(q, ShapeCircleQuery):
        return q.bbox_encoded_inner() if inner else q.bbox_encoded()
    xs, ys = _line_arrays(q) if isinstance(q, ShapeLineQuery) else _polygon_arrays(q)
    return int(xs.min()), int(xs.max()), int(ys.min()), int(ys.max())


def check_shapes(tris: DataFrame, raise_on_fail: bool = False) -> dict:
    """CheckIndex analog for the triangle table (index/check.py ethos):
    verifies the storage invariants every relation plan relies on —
    per-triangle bbox columns match the vertices, the denormalized doc bbox
    covers every triangle of the doc, vertex/type consistency (POINT:
    a==b==c; LINE: b==c), and TRIANGLE rows are non-degenerate. Returns
    ``{"ok": bool, "violations": [...]}`` without collecting data rows
    (one aggregate pass)."""
    l = lambda c: F.col(c).cast("long")  # noqa: E731
    bad_tri_bbox = (
        (F.col("min_x") != F.least(l("ax"), l("bx"), l("cx")))
        | (F.col("max_x") != F.greatest(l("ax"), l("bx"), l("cx")))
        | (F.col("min_y") != F.least(l("ay"), l("by"), l("cy")))
        | (F.col("max_y") != F.greatest(l("ay"), l("by"), l("cy")))
    )
    bad_doc_bbox = (
        (F.col("min_x") < F.col("doc_min_x")) | (F.col("max_x") > F.col("doc_max_x"))
        | (F.col("min_y") < F.col("doc_min_y")) | (F.col("max_y") > F.col("doc_max_y"))
    )
    bad_point = (F.col("ttype") == TYPE_POINT) & (
        (F.col("ax") != F.col("bx")) | (F.col("ay") != F.col("by"))
        | (F.col("ax") != F.col("cx")) | (F.col("ay") != F.col("cy"))
    )
    bad_line = (F.col("ttype") == TYPE_LINE) & (
        (F.col("bx") != F.col("cx")) | (F.col("by") != F.col("cy"))
    )
    orient2 = (l("bx") - l("ax")) * (l("cy") - l("ay")) - (l("by") - l("ay")) * (l("cx") - l("ax"))
    bad_degenerate = (F.col("ttype") == TYPE_TRIANGLE) & (orient2 == 0)
    bad_type = ~F.col("ttype").isin(TYPE_POINT, TYPE_LINE, TYPE_TRIANGLE)
    counts = tris.agg(
        F.sum(bad_tri_bbox.cast("long")).alias("tri_bbox"),
        F.sum(bad_doc_bbox.cast("long")).alias("doc_bbox"),
        F.sum(bad_point.cast("long")).alias("point_shape"),
        F.sum(bad_line.cast("long")).alias("line_shape"),
        F.sum(bad_degenerate.cast("long")).alias("degenerate_triangle"),
        F.sum(bad_type.cast("long")).alias("unknown_type"),
    ).collect()[0].asDict()
    violations = [f"{k}: {v}" for k, v in counts.items() if v]
    if violations and raise_on_fail:
        raise ValueError("shape index corrupt: " + "; ".join(violations))
    return {"ok": not violations, "violations": violations}


def shape_doc_values(tris: DataFrame, xy: bool = False) -> DataFrame:
    """ShapeDocValues analog (document/ShapeDocValues.kt:150-222 running
    stats): per-doc bounding box + centroid, one hash aggregate. The
    centroid uses the doc's HIGHEST-dimension geometry type — triangles
    weighted by signed area, else lines by length, else points by count —
    exactly the reference's tree-root midX/midY computation. Output
    coordinates decoded back to degrees (or raw XY floats)."""
    _l = lambda name: F.col(name).cast("long")  # noqa: E731 — avoid int32 overflow
    sa = (
        (_l("bx") - _l("ax")) * (_l("cy") - _l("ay"))
        - (_l("by") - _l("ay")) * (_l("cx") - _l("ax"))
    ).cast("double") / 2.0
    ln = F.sqrt(
        ((_l("bx") - _l("ax")) * (_l("bx") - _l("ax"))
         + (_l("by") - _l("ay")) * (_l("by") - _l("ay"))).cast("double")
    )
    tri_mid_x = (_l("ax") + _l("bx") + _l("cx")).cast("double") / 3.0
    tri_mid_y = (_l("ay") + _l("by") + _l("cy")).cast("double") / 3.0
    lin_mid_x = (_l("ax") + _l("bx")).cast("double") / 2.0
    lin_mid_y = (_l("ay") + _l("by")).cast("double") / 2.0
    is_t = F.col("ttype") == TYPE_TRIANGLE
    is_l = F.col("ttype") == TYPE_LINE
    is_p = F.col("ttype") == TYPE_POINT
    agg = tris.groupBy("doc_id").agg(
        F.min("min_x").alias("emin_x"),
        F.max("max_x").alias("emax_x"),
        F.min("min_y").alias("emin_y"),
        F.max("max_y").alias("emax_y"),
        F.max("ttype").alias("highest"),
        F.sum(F.when(is_t, sa).otherwise(0.0)).alias("area"),
        F.sum(F.when(is_t, tri_mid_x * sa).otherwise(0.0)).alias("px"),
        F.sum(F.when(is_t, tri_mid_y * sa).otherwise(0.0)).alias("py"),
        F.sum(F.when(is_l, ln).otherwise(0.0)).alias("len"),
        F.sum(F.when(is_l, lin_mid_x * ln).otherwise(0.0)).alias("lx"),
        F.sum(F.when(is_l, lin_mid_y * ln).otherwise(0.0)).alias("ly"),
        F.count(F.when(is_p, 1)).alias("np"),
        F.sum(F.when(is_p, F.col("ax").cast("double")).otherwise(0.0)).alias("sx"),
        F.sum(F.when(is_p, F.col("ay").cast("double")).otherwise(0.0)).alias("sy"),
    )
    cx = (
        F.when(F.col("highest") == TYPE_TRIANGLE,
               F.when(F.col("area") != 0.0, F.col("px") / F.col("area")).otherwise(F.col("px")))
        .when(F.col("highest") == TYPE_LINE,
              F.when(F.col("len") != 0.0, F.col("lx") / F.col("len")).otherwise(F.col("lx")))
        .otherwise(F.col("sx") / F.col("np"))
    )
    cy = (
        F.when(F.col("highest") == TYPE_TRIANGLE,
               F.when(F.col("area") != 0.0, F.col("py") / F.col("area")).otherwise(F.col("py")))
        .when(F.col("highest") == TYPE_LINE,
              F.when(F.col("len") != 0.0, F.col("ly") / F.col("len")).otherwise(F.col("ly")))
        .otherwise(F.col("sy") / F.col("np"))
    )
    if xy:
        # XY decode of a fractional centroid has no closed column form
        # (float32 bit tricks); report encoded-space doubles
        dec_x = lambda c: c  # noqa: E731
        dec_y = lambda c: c  # noqa: E731
    else:
        dec_x = lambda c: c * F.lit(_geo.LON_DECODE)  # noqa: E731
        dec_y = lambda c: c * F.lit(_geo.LAT_DECODE)  # noqa: E731
    return agg.select(
        "doc_id",
        dec_y(F.col("emin_y")).alias("min_lat"),
        dec_y(F.col("emax_y")).alias("max_lat"),
        dec_x(F.col("emin_x")).alias("min_lon"),
        dec_x(F.col("emax_x")).alias("max_lon"),
        dec_y(cy).alias("centroid_lat"),
        dec_x(cx).alias("centroid_lon"),
        F.col("highest").alias("highest_type"),
    )


def _normalize_query(q):
    """Expand dateline-crossing geo boxes into the reference's two-component
    form (Rectangle2D.create → ComponentTree of [MIN_LON, maxLon] and
    [minLon, MAX_LON]; LatLonShape.newBoxQuery CONTAINS → MUST of the two
    halves — both exactly what the multi-geometry paths below implement)."""
    if isinstance(q, (list, tuple)):
        out = []
        for comp in q:
            norm = _normalize_query(comp)
            out.extend(norm if isinstance(norm, list) else [norm])
        return out
    if isinstance(q, ShapeBoxQuery) and q.crosses_dateline():
        return [
            ShapeBoxQuery(-180.0, q.max_x, q.min_y, q.max_y),
            ShapeBoxQuery(q.min_x, 180.0, q.min_y, q.max_y),
        ]
    return q


def shape_docset(tris: DataFrame, q, relation: str = "INTERSECTS") -> DataFrame:
    """SpatialQuery relation evaluation over the triangle table → doc_id set.

    Plans (SpatialQuery.kt scorer strategies re-expressed relationally):
    * INTERSECTS — triangle-bbox prefilter (Parquet-prunable) → exact kernel
      → distinct(doc_id). Only intersecting row groups are read.
    * DISJOINT — all shape docs ``left_anti`` the INTERSECTS set.
    * WITHIN — candidates pruned by doc-bbox ⊆ query-bbox (prunable — a
      necessary condition) → per-doc ``min(flag) = 1`` over ALL the doc's
      triangles.
    * CONTAINS — candidates pruned by doc-bbox ⊇ query-bbox → per-doc
      WithinRelation codes: ``max = CANDIDATE`` (≥1 candidate, none
      NOTWITHIN). Box queries only (Rectangle2D.withinTriangle; the
      polygon-query ComponentTree within path is recorded in DEVIATIONS).
    """
    relation = relation.upper()
    q = _normalize_query(q)
    qminx, qmaxx, qminy, qmaxy = _query_bbox(q)
    if relation == "INTERSECTS":
        cand = tris.filter(
            (F.col("min_x") <= F.lit(qmaxx)) & (F.col("max_x") >= F.lit(qminx))
            & (F.col("min_y") <= F.lit(qmaxy)) & (F.col("max_y") >= F.lit(qminy))
        )
        flags = _exact_flag_df(cand, q, "intersects")
        return flags.filter(F.col("flag") == 1).select("doc_id").distinct()
    if relation == "DISJOINT":
        hit = shape_docset(tris, q, "INTERSECTS")
        return tris.select("doc_id").distinct().join(hit, "doc_id", "left_anti")
    if relation == "WITHIN":
        cand = tris.filter(
            (F.col("doc_min_x") >= F.lit(qminx)) & (F.col("doc_max_x") <= F.lit(qmaxx))
            & (F.col("doc_min_y") >= F.lit(qminy)) & (F.col("doc_max_y") <= F.lit(qmaxy))
        )
        flags = _exact_flag_df(cand, q, "within")
        return (
            flags.groupBy("doc_id").agg(F.min("flag").alias("all_in"))
            .filter(F.col("all_in") == 1).select("doc_id")
        )
    if relation == "CONTAINS":
        comps = list(q) if isinstance(q, (list, tuple)) else [q]
        out = None
        for comp in comps:
            # multi-geometry CONTAINS = every component contained — Lucene
            # wraps per-component SpatialQuerys in a MUST boolean
            # (LatLonShape.newGeometryQuery CONTAINS path); here: inner-join
            cminx, cmaxx, cminy, cmaxy = _query_bbox(comp, inner=True)
            cand = tris.filter(
                (F.col("doc_min_x") <= F.lit(cminx)) & (F.col("doc_max_x") >= F.lit(cmaxx))
                & (F.col("doc_min_y") <= F.lit(cminy)) & (F.col("doc_max_y") >= F.lit(cmaxy))
            )
            rel = _exact_flag_df(cand, comp, "contains")
            agg = rel.groupBy("doc_id").agg(F.max("flag").alias("rel"))
            one = agg.filter(F.col("rel") == WITHIN_CANDIDATE).select("doc_id")
            out = one if out is None else out.join(one, "doc_id")
        return out
    raise ValueError(f"unknown relation {relation}")
