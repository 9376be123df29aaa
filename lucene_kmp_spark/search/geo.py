"""Geo-point and IP-address query support (LatLonPoint / InetAddressPoint).

Reference semantics reproduced here:

* 32-bit quantized lat/lon encoding — ``geo/GeoEncodingUtils.kt:16-130``
  (floor quantization toward -90/-180 for stored points, ceil for query
  lower bounds, the ``90.0``/``180.0`` nextDown special case).
* box query construction incl. dateline split —
  ``document/LatLonPoint.kt:210-276``.
* distance query = haversine-meters ``<= radius`` over the DECODED
  (quantized) point — ``document/LatLonPointDistanceQuery.kt`` +
  ``util/SloppyMath.kt:38-66``. We evaluate the haversine with exact libm
  trig instead of SloppyMath's table-driven cos/asin (documented in
  DEVIATIONS.md: the reference's own javadoc bounds that approximation's
  error at 4e-1 m; doc sets can differ only for points within that band of
  the radius boundary).
* polygon containment = Franklin pnpoly crossing test with on-edge points
  contained, holes subtracted with on-hole-edge excluded —
  ``geo/EdgeTree.kt:33-115``, ``geo/Polygon2D.kt:62-67``.
* distance feature score = ``boost * pivot / (pivot + distance)`` —
  ``document/LatLonPointDistanceFeatureQuery.kt``.
* InetAddressPoint 16-byte IPv6-mapped encoding, inclusive byte-wise
  ranges, CIDR prefix -> range — ``document/InetAddressPoint.kt:86-210``.

Spark-first execution model: encoded coordinates and the box/distance
bounding-box prefilters are pure Catalyst column expressions (predicate
pushdown to the Parquet scan replaces the reference's BKD-tree cell
pruning, exactly as SURVEY §1.3 maps points); only the final polygon
crossing test runs in an Arrow-vectorized pandas UDF over the prefiltered
survivors.
"""

from __future__ import annotations

import ipaddress
import math
from dataclasses import dataclass

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

# GeoEncodingUtils.kt:17-23 — BITS=32; note DECODE constants are defined as
# 1/SCALE and encode divides by DECODE (not multiply by SCALE): the float
# rounding of those two forms differs, so we keep the reference's shape.
BITS = 32
LAT_SCALE = float(1 << BITS) / 180.0
LAT_DECODE = 1.0 / LAT_SCALE
LON_SCALE = float(1 << BITS) / 360.0
LON_DECODE = 1.0 / LON_SCALE

MIN_LAT_INCL, MAX_LAT_INCL = -90.0, 90.0
MIN_LON_INCL, MAX_LON_INCL = -180.0, 180.0

# GeoUtils.kt:42
EARTH_MEAN_RADIUS_METERS = 6371008.7714


def _check_lat(lat: float) -> None:
    if not (MIN_LAT_INCL <= lat <= MAX_LAT_INCL):
        raise ValueError(f"invalid latitude {lat}")


def _check_lon(lon: float) -> None:
    if not (MIN_LON_INCL <= lon <= MAX_LON_INCL):
        raise ValueError(f"invalid longitude {lon}")


def encode_latitude(latitude: float) -> int:
    """GeoEncodingUtils.encodeLatitude — floor toward -90."""
    _check_lat(latitude)
    if latitude == 90.0:
        latitude = math.nextafter(latitude, -math.inf)
    return int(math.floor(latitude / LAT_DECODE))


def encode_latitude_ceil(latitude: float) -> int:
    _check_lat(latitude)
    if latitude == 90.0:
        latitude = math.nextafter(latitude, -math.inf)
    return int(math.ceil(latitude / LAT_DECODE))


def encode_longitude(longitude: float) -> int:
    _check_lon(longitude)
    if longitude == 180.0:
        longitude = math.nextafter(longitude, -math.inf)
    return int(math.floor(longitude / LON_DECODE))


def encode_longitude_ceil(longitude: float) -> int:
    _check_lon(longitude)
    if longitude == 180.0:
        longitude = math.nextafter(longitude, -math.inf)
    return int(math.ceil(longitude / LON_DECODE))


def decode_latitude(encoded: int) -> float:
    return encoded * LAT_DECODE


def decode_longitude(encoded: int) -> float:
    return encoded * LON_DECODE


def encode_lat_col(col: Column) -> Column:
    """Column form of encodeLatitude. The 90.0 literal special case folds to
    the max encodable value (everything else floors below it anyway)."""
    enc_top = encode_latitude(90.0)
    return (
        F.when(col == F.lit(90.0), F.lit(enc_top))
        .otherwise(F.floor(col / F.lit(LAT_DECODE)))
        .cast("int")
    )


def encode_lon_col(col: Column) -> Column:
    enc_top = encode_longitude(180.0)
    return (
        F.when(col == F.lit(180.0), F.lit(enc_top))
        .otherwise(F.floor(col / F.lit(LON_DECODE)))
        .cast("int")
    )


def decode_lat_col(col: Column) -> Column:
    return col.cast("double") * F.lit(LAT_DECODE)


def decode_lon_col(col: Column) -> Column:
    return col.cast("double") * F.lit(LON_DECODE)


# ---------------------------------------------------------------------------
# haversine distance (SloppyMath.haversinMeters semantics, exact-trig eval)
# ---------------------------------------------------------------------------


def haversin_meters(lat1: float, lon1: float, lat2: float, lon2: float) -> float:
    """Scalar haversine meters (SloppyMath.kt:38-66 formula shape)."""
    x1, x2 = math.radians(lat1), math.radians(lat2)
    h = (1 - math.cos(x1 - x2)) + math.cos(x1) * math.cos(x2) * (
        1 - math.cos(math.radians(lon1 - lon2))
    )
    return EARTH_MEAN_RADIUS_METERS * 2 * math.asin(min(1.0, math.sqrt(h * 0.5)))


# Shared degree->radian constant: both engines multiply by this exact
# double, avoiding radians() whose op order differs between JVM (x/180*pi)
# and libm engines (x*(pi/180)).
DEG_TO_RAD = math.pi / 180.0


def haversin_meters_expr(lat_col: Column, lon_col: Column, lat: float, lon: float) -> Column:
    """Column haversine meters to a fixed center — whole-stage-codegen'd JVM
    math, no Python in the loop. Same ``1-cos`` formula shape as
    SloppyMath.haversinSortKey, with the center's radians/cos folded to
    Python-computed literals so the DuckDB oracle's mirror SQL
    (:func:`haversin_meters_sql`) evaluates the identical expression —
    residual cross-engine delta is <=1 ulp of libm cos/asin."""
    x1 = lat_col * F.lit(DEG_TO_RAD)
    x2 = math.radians(lat)
    h = (F.lit(1.0) - F.cos(x1 - F.lit(x2))) + F.cos(x1) * F.lit(math.cos(x2)) * (
        F.lit(1.0) - F.cos((lon_col - F.lit(lon)) * F.lit(DEG_TO_RAD))
    )
    return F.lit(EARTH_MEAN_RADIUS_METERS * 2.0) * F.asin(
        F.least(F.lit(1.0), F.sqrt(h * F.lit(0.5)))
    )


def haversin_meters_sql(lat_expr: str, lon_expr: str, lat: float, lon: float) -> str:
    """The identical formula as ANSI SQL (oracle side of the float protocol)."""
    c = repr(DEG_TO_RAD)
    x2 = repr(math.radians(lat))
    cx2 = repr(math.cos(math.radians(lat)))
    two_r = repr(EARTH_MEAN_RADIUS_METERS * 2.0)
    h = (
        f"(1.0 - cos(({lat_expr}) * {c} - {x2})) + "
        f"cos(({lat_expr}) * {c}) * {cx2} * "
        f"(1.0 - cos((({lon_expr}) - {repr(float(lon))}) * {c}))"
    )
    return f"{two_r} * asin(least(1.0, sqrt(({h}) * 0.5)))"


def circle_bbox(lat: float, lon: float, radius_m: float) -> tuple[float, float, float, float]:
    """Conservative bounding rectangle for a circle (Rectangle.fromPointDistance
    analog, widened): returns (min_lat, max_lat, min_lon, max_lon); lon
    bounds are (-180, 180) i.e. no constraint when the circle crosses the
    dateline or a pole — a coarser but always-correct prefilter, since the
    exact haversine test runs on every survivor."""
    rad_dist = radius_m / EARTH_MEAN_RADIUS_METERS
    # widen by 2 encoding quanta: the exact test runs on the decoded
    # QUANTIZED point, which can sit a quantum outside the raw-coord box
    pad = 2.0 * LON_DECODE
    d_lat = math.degrees(rad_dist) * 1.0000001 + pad
    min_lat, max_lat = lat - d_lat, lat + d_lat
    if min_lat <= MIN_LAT_INCL or max_lat >= MAX_LAT_INCL:
        return (MIN_LAT_INCL, MAX_LAT_INCL, MIN_LON_INCL, MAX_LON_INCL)
    min_lat = max(min_lat, MIN_LAT_INCL)
    max_lat = min(max_lat, MAX_LAT_INCL)
    s = math.sin(rad_dist) / math.cos(math.radians(max(abs(min_lat), abs(max_lat))))
    if abs(s) >= 1.0:
        return (min_lat, max_lat, MIN_LON_INCL, MAX_LON_INCL)
    d_lon = math.degrees(math.asin(s)) * 1.0000001 + pad
    if lon - d_lon < MIN_LON_INCL or lon + d_lon > MAX_LON_INCL:
        return (min_lat, max_lat, MIN_LON_INCL, MAX_LON_INCL)
    return (min_lat, max_lat, lon - d_lon, lon + d_lon)


# ---------------------------------------------------------------------------
# polygon containment (EdgeTree.containsPnPoly / Polygon2D.contains)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class GeoPolygon:
    """A closed ring of (lat, lon) vertices plus optional holes
    (``geo/Polygon.kt``). The ring need not repeat the first vertex."""

    lats: tuple[float, ...]
    lons: tuple[float, ...]
    holes: tuple["GeoPolygon", ...] = ()

    def __post_init__(self):
        if len(self.lats) != len(self.lons) or len(self.lats) < 3:
            raise ValueError("polygon needs >=3 (lat, lon) vertices")

    def bbox(self) -> tuple[float, float, float, float]:
        return (min(self.lats), max(self.lats), min(self.lons), max(self.lons))


def _pnpoly_states(xs: np.ndarray, ys: np.ndarray, px: np.ndarray, py: np.ndarray) -> np.ndarray:
    """Vectorized Franklin pnpoly over points (xs=lon, ys=lat) against the
    closed ring (px, py). Returns int8 states: 0 outside, 1 inside (odd
    crossings), 2 on an edge — the FALSE/TRUE/ON_EDGE bytes of
    ``EdgeTree.kt:79-115``. Loop is over EDGES (few); point math is numpy."""
    n = len(px)
    res = np.zeros(len(xs), dtype=np.int8)
    on_edge = np.zeros(len(xs), dtype=bool)
    for i in range(n):
        x1, y1 = px[i], py[i]
        x2, y2 = px[(i + 1) % n], py[(i + 1) % n]
        # on-edge: point within the edge's bbox and exactly collinear
        # (GeoUtils.orient == 0), EdgeTree.kt:84-92
        in_y = ((ys <= y1) & (ys >= y2)) != ((ys >= y1) & (ys <= y2))
        both_y = (ys == y1) & (ys == y2)
        in_x = ((xs <= x1) & (xs >= x2)) != ((xs >= x1) & (xs <= x2))
        both_x = (xs == x1) & (xs == x2)
        orient = (y2 - y1) * (xs - x2) - (x2 - x1) * (ys - y2)
        # exact-arithmetic fallback for near-degenerate collinearity
        # (GeoUtils.orient's adaptive/BigDecimal path, GeoUtils.kt): a
        # double det within the rounding band is recomputed over exact
        # rationals (every double IS a rational), so on-edge detection can
        # neither miss a truly-collinear point nor accept a nearly-collinear
        # one. Candidates are bounded to points already inside the edge's
        # bbox, so the per-point exact pass is tiny.
        band = np.abs(orient) < 1e-9
        cand = band & (in_y | both_y) & in_x & ~both_x
        if cand.any():
            from fractions import Fraction

            fx2, fy2 = Fraction(float(x2)), Fraction(float(y2))
            fy21 = fy2 - Fraction(float(y1))
            fx21 = fx2 - Fraction(float(x1))
            for j in np.nonzero(cand)[0]:
                exact = fy21 * (Fraction(float(xs[j])) - fx2) - fx21 * (
                    Fraction(float(ys[j])) - fy2
                )
                orient[j] = 0.0 if exact == 0 else (1.0 if exact > 0 else -1.0)
        on_edge |= (in_y | both_y) & (both_x | (in_x & (orient == 0.0)))
        # crossing parity (EdgeTree.kt:93-99)
        crosses = (y1 > ys) != (y2 > ys)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = (x2 - x1) * (ys - y1) / np.where(y2 == y1, 1.0, (y2 - y1)) + x1
        res ^= (crosses & (xs < xint)).astype(np.int8)
    res[on_edge] = 2
    return res


def polygon_contains(lats: np.ndarray, lons: np.ndarray, polygon: GeoPolygon) -> np.ndarray:
    """Polygon2D.contains(x, y): inside-or-on-edge of the outer ring, minus
    points contained in (or on the edge of) any hole (Polygon2D.kt:62-67)."""
    outer = _pnpoly_states(lons, lats, np.asarray(polygon.lons), np.asarray(polygon.lats)) > 0
    for hole in polygon.holes:
        hole_in = _pnpoly_states(lons, lats, np.asarray(hole.lons), np.asarray(hole.lats)) > 0
        outer &= ~hole_in
    return outer


# ---------------------------------------------------------------------------
# InetAddressPoint encoding (document/InetAddressPoint.kt:86-210)
# ---------------------------------------------------------------------------

IPV4_PREFIX = bytes([0] * 10 + [0xFF, 0xFF])


def encode_inet(value: str) -> bytes:
    """16-byte encoding: IPv4 mapped to ::ffff:a.b.c.d (InetAddressPoint.encode)."""
    addr = ipaddress.ip_address(value)
    packed = addr.packed
    if len(packed) == 4:
        return IPV4_PREFIX + packed
    return packed


def inet_prefix_range(value: str, prefix_length: int) -> tuple[bytes, bytes]:
    """CIDR prefix -> inclusive [lower, upper] (InetAddressPoint.newPrefixQuery:
    zero the host bits for lower, fill them for upper; bit i counts from the
    MSB of the RAW address, so IPv4 prefixes are 0-32 over the 4 raw bytes
    before mapping)."""
    addr = ipaddress.ip_address(value)
    raw = bytearray(addr.packed)
    if not (0 <= prefix_length <= 8 * len(raw)):
        raise ValueError(f"illegal prefixLength {prefix_length}")
    lower, upper = bytearray(raw), bytearray(raw)
    for i in range(prefix_length, 8 * len(raw)):
        m = 1 << (7 - (i & 7))
        lower[i >> 3] &= ~m & 0xFF
        upper[i >> 3] |= m
    if len(raw) == 4:
        return IPV4_PREFIX + bytes(lower), IPV4_PREFIX + bytes(upper)
    return bytes(lower), bytes(upper)


def encode_inet_col(ip_col: Column) -> Column:
    """Pure-column 16-byte encoding for dotted-quad IPv4 string columns
    (the bulk case) — stays in whole-stage codegen. Mixed/IPv6 columns
    should pre-encode with :func:`encode_inet` in an Arrow UDF instead."""
    parts = F.split(ip_col, r"\.")
    as_int = (
        parts.getItem(0).cast("long") * F.lit(16777216)
        + parts.getItem(1).cast("long") * F.lit(65536)
        + parts.getItem(2).cast("long") * F.lit(256)
        + parts.getItem(3).cast("long")
    )
    return F.to_binary(
        F.concat(F.lit("00000000000000000000ffff"), F.lpad(F.hex(as_int), 8, "0")),
        F.lit("hex"),
    )


# ---------------------------------------------------------------------------
# execution (called from search.executor over index.docs)
# ---------------------------------------------------------------------------


def box_predicate(q) -> Column | None:
    """Catalyst predicate for LatLonBoxQuery (LatLonPoint.kt:210-276
    construction rules). Returns None when the box cannot match."""
    min_lon = q.min_lon
    if q.min_lat == 90.0:
        return None
    if min_lon == 180.0:
        if q.max_lon == 180.0:
            return None
        if q.max_lon < min_lon:
            min_lon = -180.0
    lower_lat = encode_latitude_ceil(q.min_lat)
    upper_lat = encode_latitude(q.max_lat)
    lower_lon = encode_longitude_ceil(min_lon)
    upper_lon = encode_longitude(q.max_lon)
    enc_lat = encode_lat_col(F.col(q.lat_col))
    enc_lon = encode_lon_col(F.col(q.lon_col))
    # raw-column prefilter FIRST: the encoded comparison is a computed
    # expression Parquet stats can't see, but enc ∈ [lo, hi] implies
    # raw ∈ [decode(lo), decode(hi) + quantum] — a plain BETWEEN Catalyst
    # pushes into the scan (row-group pruning = the BKD inner-node cut)
    raw_lat = F.col(q.lat_col).between(
        F.lit(decode_latitude(lower_lat)), F.lit(decode_latitude(upper_lat) + LAT_DECODE)
    )
    lat_pred = raw_lat & enc_lat.between(F.lit(lower_lat), F.lit(upper_lat))
    if q.max_lon < min_lon:
        # dateline crossing: OR of the two open-ended boxes
        return lat_pred & ((enc_lon >= F.lit(lower_lon)) | (enc_lon <= F.lit(upper_lon)))
    raw_lon = F.col(q.lon_col).between(
        F.lit(decode_longitude(lower_lon)), F.lit(decode_longitude(upper_lon) + LON_DECODE)
    )
    return lat_pred & raw_lon & enc_lon.between(F.lit(lower_lon), F.lit(upper_lon))


def _decoded_cols(q):
    """The doc point the reference tests: decode(encode(lat/lon))."""
    dlat = decode_lat_col(encode_lat_col(F.col(q.lat_col)))
    dlon = decode_lon_col(encode_lon_col(F.col(q.lon_col)))
    return dlat, dlon


def distance_predicate(q) -> Column:
    """bbox prefilter (pushdown-able) AND exact haversine test over the
    decoded quantized point (LatLonPointDistanceQuery semantics)."""
    min_lat, max_lat, min_lon, max_lon = circle_bbox(q.lat, q.lon, q.radius_meters)
    pre = F.col(q.lat_col).between(F.lit(min_lat), F.lit(max_lat))
    if (min_lon, max_lon) != (MIN_LON_INCL, MAX_LON_INCL):
        pre = pre & F.col(q.lon_col).between(F.lit(min_lon), F.lit(max_lon))
    dlat, dlon = _decoded_cols(q)
    dist = haversin_meters_expr(dlat, dlon, q.lat, q.lon)
    return pre & (dist <= F.lit(float(q.radius_meters)))


def distance_feature_scores(docs, q):
    """LatLonPointDistanceFeatureQuery: every doc with a point matches,
    score = boost * pivot / (pivot + distance)."""
    dlat, dlon = _decoded_cols(q)
    dist = haversin_meters_expr(dlat, dlon, q.lat, q.lon)
    score = F.lit(float(q.boost)) * F.lit(float(q.pivot_meters)) / (
        F.lit(float(q.pivot_meters)) + dist
    )
    return (
        docs.filter(F.col(q.lat_col).isNotNull() & F.col(q.lon_col).isNotNull())
        .select("doc_id", score.cast("double").alias("score"))
    )


def polygon_docset(docs, q):
    """bbox Catalyst prefilter, then Arrow-vectorized pnpoly over survivors."""
    import pandas as pd

    polys = tuple(q.polygons)
    min_lat = min(p.bbox()[0] for p in polys)
    max_lat = max(p.bbox()[1] for p in polys)
    min_lon = min(p.bbox()[2] for p in polys)
    max_lon = max(p.bbox()[3] for p in polys)
    dlat, dlon = _decoded_cols(q)
    # raw-column bbox first (Parquet-pushdown-able; decoded <= raw <
    # decoded + quantum, so pad the upper bounds), then the decoded bbox
    pre = docs.filter(
        F.col(q.lat_col).isNotNull()
        & F.col(q.lon_col).isNotNull()
        & F.col(q.lat_col).between(F.lit(min_lat), F.lit(max_lat + LAT_DECODE))
        & F.col(q.lon_col).between(F.lit(min_lon), F.lit(max_lon + LON_DECODE))
        & dlat.between(F.lit(min_lat), F.lit(max_lat))
        & dlon.between(F.lit(min_lon), F.lit(max_lon))
    ).select("doc_id", dlat.alias("_dlat"), dlon.alias("_dlon"))

    def _contains(batches):
        for pdf in batches:
            lats = pdf["_dlat"].to_numpy()
            lons = pdf["_dlon"].to_numpy()
            keep = np.zeros(len(pdf), dtype=bool)
            for p in polys:
                keep |= polygon_contains(lats, lons, p)
            yield pd.DataFrame({"doc_id": pdf["doc_id"][keep]})

    return pre.mapInPandas(_contains, schema="doc_id long")


def inet_range_predicate(q) -> Column:
    """Inclusive byte-range over the IPv6-mapped encoding. The doc column may
    be a dotted-quad string (encoded JVM-side via encode_inet_col) or a
    pre-encoded 16-byte binary column."""
    lower = encode_inet(q.lower)
    upper = encode_inet(q.upper)
    col = F.col(q.ip_col)
    enc = F.when(col.cast("string").contains("."), encode_inet_col(col.cast("string"))).otherwise(
        col.cast("binary")
    )
    return enc.between(F.lit(bytearray(lower)), F.lit(bytearray(upper)))


def geo_docset(docs, q):
    """Docset execution for the geo/IP query family (doc_id column only)."""
    from .query import (
        InetAddressRangeQuery,
        LatLonBoxQuery,
        LatLonDistanceQuery,
        LatLonPolygonQuery,
        XYBoxQuery,
        XYDistanceQuery,
        XYPolygonQuery,
    )

    if isinstance(q, XYBoxQuery):
        return docs.filter(
            F.col(q.x_col).isNotNull() & F.col(q.y_col).isNotNull() & xy_box_predicate(q)
        ).select("doc_id")
    if isinstance(q, XYDistanceQuery):
        return docs.filter(
            F.col(q.x_col).isNotNull() & F.col(q.y_col).isNotNull() & xy_distance_predicate(q)
        ).select("doc_id")
    if isinstance(q, XYPolygonQuery):
        return xy_polygon_docset(docs, q)
    if isinstance(q, LatLonBoxQuery):
        pred = box_predicate(q)
        if pred is None:
            return docs.filter(F.lit(False)).select("doc_id")
        return docs.filter(F.col(q.lat_col).isNotNull() & F.col(q.lon_col).isNotNull() & pred).select("doc_id")
    if isinstance(q, LatLonDistanceQuery):
        return docs.filter(
            F.col(q.lat_col).isNotNull() & F.col(q.lon_col).isNotNull() & distance_predicate(q)
        ).select("doc_id")
    if isinstance(q, LatLonPolygonQuery):
        return polygon_docset(docs, q)
    if isinstance(q, InetAddressRangeQuery):
        return docs.filter(F.col(q.ip_col).isNotNull() & inet_range_predicate(q)).select("doc_id")
    raise TypeError(f"not a geo docset query: {type(q).__name__}")


# ---------------------------------------------------------------------------
# XY (cartesian) variants — document/XYPointField.kt + geo/XY*.kt
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class XYPolygon:
    """Closed cartesian ring + holes (``geo/XYPolygon.kt``)."""

    xs: tuple[float, ...]
    ys: tuple[float, ...]
    holes: tuple["XYPolygon", ...] = ()

    def __post_init__(self):
        if len(self.xs) != len(self.ys) or len(self.xs) < 3:
            raise ValueError("polygon needs >=3 (x, y) vertices")

    def bbox(self) -> tuple[float, float, float, float]:
        return (min(self.xs), max(self.xs), min(self.ys), max(self.ys))


def xy_polygon_contains(xs: np.ndarray, ys: np.ndarray, polygon: XYPolygon) -> np.ndarray:
    """Polygon2D.contains over cartesian coords (same pnpoly semantics)."""
    outer = _pnpoly_states(xs, ys, np.asarray(polygon.xs), np.asarray(polygon.ys)) > 0
    for hole in polygon.holes:
        hole_in = _pnpoly_states(xs, ys, np.asarray(hole.xs), np.asarray(hole.ys)) > 0
        outer &= ~hole_in
    return outer


def _f32(col: Column) -> Column:
    """XYEncodingUtils.encode quantization: values are float32; the sortable
    int transform is order-preserving, so float comparison == encoded
    comparison and the decoded point IS the float32 value."""
    return col.cast("float")


def xy_box_predicate(q) -> Column:
    x = _f32(F.col(q.x_col))
    y = _f32(F.col(q.y_col))
    return (
        x.between(F.lit(float(np.float32(q.min_x))), F.lit(float(np.float32(q.max_x))))
        & y.between(F.lit(float(np.float32(q.min_y))), F.lit(float(np.float32(q.max_y))))
    )


def xy_distance_predicate(q) -> Column:
    # Circle2D.CartesianDistance.contains: double math over the float point
    dx = _f32(F.col(q.x_col)).cast("double") - F.lit(float(np.float32(q.x)))
    dy = _f32(F.col(q.y_col)).cast("double") - F.lit(float(np.float32(q.y)))
    r = float(np.float32(q.radius))
    return (dx * dx + dy * dy) <= F.lit(r * r)


def xy_polygon_docset(docs, q):
    import pandas as pd

    polys = tuple(q.polygons)
    min_x = min(p.bbox()[0] for p in polys)
    max_x = max(p.bbox()[1] for p in polys)
    min_y = min(p.bbox()[2] for p in polys)
    max_y = max(p.bbox()[3] for p in polys)
    x = _f32(F.col(q.x_col)).cast("double")
    y = _f32(F.col(q.y_col)).cast("double")
    pre = docs.filter(
        F.col(q.x_col).isNotNull()
        & F.col(q.y_col).isNotNull()
        & x.between(F.lit(min_x), F.lit(max_x))
        & y.between(F.lit(min_y), F.lit(max_y))
    ).select("doc_id", x.alias("_x"), y.alias("_y"))

    def _contains(batches):
        for pdf in batches:
            xs = pdf["_x"].to_numpy()
            ys = pdf["_y"].to_numpy()
            keep = np.zeros(len(pdf), dtype=bool)
            for p in polys:
                keep |= xy_polygon_contains(xs, ys, p)
            yield pd.DataFrame({"doc_id": pdf["doc_id"][keep]})

    return pre.mapInPandas(_contains, schema="doc_id long")


def nearest_neighbors(docs, lat_col: str, lon_col: str, lat: float, lon: float, k: int = 10):
    """LatLonPoint.nearest (``document/NearestNeighbor.kt``): the k points
    closest to the origin, nearest first (ties by doc_id asc). The
    reference runs best-first BKD traversal; the distributed analog is one
    Catalyst scan with per-partition top-k heaps merged on the driver
    (TakeOrderedAndProject) over the haversine of the quantized point —
    no shuffle, scales linearly with partitions."""
    dlat = decode_lat_col(encode_lat_col(F.col(lat_col)))
    dlon = decode_lon_col(encode_lon_col(F.col(lon_col)))
    dist = haversin_meters_expr(dlat, dlon, lat, lon)
    return (
        docs.filter(F.col(lat_col).isNotNull() & F.col(lon_col).isNotNull())
        .select("doc_id", dist.cast("double").alias("distance_m"))
        .orderBy(F.asc("distance_m"), F.asc("doc_id"))
        .limit(int(k))
    )
