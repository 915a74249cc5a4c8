"""Polygon → WKT without shapely (P4).

The reference converts GeoJSON-ish polygon mappings to WKT with
``shapely.Polygon(...).to_wkt()`` and falls back to an empty polygon on any
parse error (reference: detected_objects_processing.py:10-15). shapely isn't
a dependency here; the WKT grammar for simple polygons is small enough to
emit directly, with shapely-2 formatting semantics (trimmed floats, closed
ring, ``POLYGON EMPTY`` fallback).
"""

from __future__ import annotations


def _fmt(v: float) -> str:
    """shapely-2 trim=True float formatting: no trailing zeros, ints bare."""
    f = float(v)
    if f == int(f):
        return str(int(f))
    return repr(f)


def polygon_to_wkt(coordinates) -> str:
    """GeoJSON polygon ``coordinates`` (list of rings) → WKT string.

    Mirrors ``Polygon(coords[0]).to_wkt()`` with the reference's fallback:
    anything malformed (None, <3 points, non-numeric) → ``POLYGON EMPTY``.
    The ring is closed (first point appended) when the input leaves it open,
    matching shapely's constructor behavior.
    """
    try:
        ring = coordinates[0]
        pts = [(float(p[0]), float(p[1])) for p in ring]
        if len(pts) < 3:
            return "POLYGON EMPTY"
        if pts[0] != pts[-1]:
            pts.append(pts[0])
        body = ", ".join(f"{_fmt(x)} {_fmt(y)}" for x, y in pts)
        return f"POLYGON (({body}))"
    except Exception:
        return "POLYGON EMPTY"
