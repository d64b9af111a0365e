"""Data-dependent epsilon rule, reproduced exactly from the reference.

The reference derives a relative zero from the dynamic (extent) of the
global bounding box of all input features
(reduce_bend_algorithm.py:1045-1088):

    delta_x = |xmin| + |xmax|;  delta_y = |ymin| + |ymax|
    dynamic_xy = max(delta_x, delta_y)
    log_loss = int(log10(dynamic_xy) + 1)
    ZERO_RELATIVE = 10 ** -(15 - log_loss - 2)
    ZERO_ABSOLUTE = 10 ** -(15 - 2) = 1e-13
    ZERO_ANGLE = radians(0.0001)

Empty input uses bbox (0, 0, 1, 1) (reduce_bend_algorithm.py:1060).
This rule must be byte-exact for vertex-sequence parity (SURVEY.md §1.1).
"""

from __future__ import annotations

import math


class Epsilon:
    """Holds the three zero tolerances for one engine run.

    Unlike the reference (class-level mutable globals,
    reduce_bend_algorithm.py:1039-1041) this is an immutable value
    object passed into kernels explicitly — required for thread/task
    safety inside Spark executors.
    """

    __slots__ = ("zero_relative", "zero_absolute", "zero_angle")

    def __init__(self, bbox: tuple[float, float, float, float] | None):
        """``bbox`` is (xmin, ymin, xmax, ymax) of ALL input features,
        or None for empty input."""
        if bbox is None:
            bbox = (0.0, 0.0, 1.0, 1.0)
        xmin, ymin, xmax, ymax = bbox
        delta_x = abs(xmin) + abs(xmax)
        delta_y = abs(ymin) + abs(ymax)
        dynamic_xy = max(delta_x, delta_y)
        # Reference: int(math.log(dynamic_xy, 10) + 1)
        # (raises for dynamic_xy == 0 in the reference too; callers must
        # guard degenerate all-at-origin inputs the same way QGIS does —
        # by the bbox never being a zero point in practice.)
        log_loss = int(math.log(dynamic_xy, 10) + 1)
        max_digit = 15
        security = 2
        abs_digit = max_digit - security
        rel_digit = max_digit - log_loss - security
        self.zero_relative = 1.0 / (10 ** rel_digit)
        self.zero_absolute = 1.0 / (10 ** abs_digit)
        self.zero_angle = math.radians(0.0001)

    @classmethod
    def from_coords(cls, coords_list) -> "Epsilon":
        """Build from an iterable of (n,2) float arrays (may be empty)."""
        xmin = ymin = math.inf
        xmax = ymax = -math.inf
        seen = False
        for c in coords_list:
            if len(c) == 0:
                continue
            seen = True
            x0, y0 = c[:, 0].min(), c[:, 1].min()
            x1, y1 = c[:, 0].max(), c[:, 1].max()
            xmin = min(xmin, x0)
            ymin = min(ymin, y0)
            xmax = max(xmax, x1)
            ymax = max(ymax, y1)
        return cls((xmin, ymin, xmax, ymax) if seen else None)
