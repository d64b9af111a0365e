"""Pure-NumPy geometry core (no GEOS/shapely/QGIS available in env).

Ragged-array geometry encoding used engine-wide (FIXTURES.md T2):
``kind:int8`` (0=Point, 1=LineString, 2=Polygon), ``xs/ys:float64[]``
concatenated ring/line coordinates, ``ring_offsets:int32[]`` prefix
offsets with the exterior ring first (mirrors RbPolygon,
reduce_bend_algorithm.py:322-335).
"""

from .epsilon import Epsilon
from . import primitives

__all__ = ["Epsilon", "primitives"]
