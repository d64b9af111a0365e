"""FIXTURES.md §5.2.1 second half: the reference golden cases run
THROUGH Spark applyInPandas (same kernel, Arrow transport, tile
machinery) and produce the identical exact vertex sequences as the
pure-NumPy path.  One representative case per behavior class (the full
31 run in-process in test_reduce_bend_golden.py); epsilon is derived
per tile from the inputs exactly like the reference's global pass."""

import numpy as np
import pandas as pd
import pytest

from geo_sim_processing_a_spark.plans.pipeline import (
    KERNEL_OUT_SCHEMA, _reduce_bend_kernel)
from geo_sim_processing_a_spark.kernels.reduce_bend import (
    KIND_LINE, KIND_POINT, KIND_POLYGON)

# (name, tolerance, smooth, [(kind, rings)], [(kind, expected_rings)])
# coords may be a list of rings (multi-ring polygon) or a bare coord list
CASES = [
    ("pivot_on_bend", 3, False,
     [(KIND_POLYGON, [(5, 10), (5, 11), (6, 11), (6, 10), (10, 10), (10, 0), (0, 0), (0, 10), (5, 10)])],
     [(KIND_POLYGON, [(10, 0), (0, 0), (0, 10), (10, 10), (10, 0)])]),
    ("multi_bend_line", 3, False,
     [(KIND_LINE, [(0, 10), (30, 10), (30, 11), (31, 11), (31, 10), (40, 10),
                   (50, 10), (50, 11), (51, 10), (60, 10)])],
     [(KIND_LINE, [(0, 10), (60, 10)])]),
    ("point_blocks_bend", 3, False,
     [(KIND_POLYGON, [(0, 0), (0, 20), (10, 20), (10, 21), (11, 21), (11, 20), (20, 20), (20, 0), (0, 0)]),
      (KIND_POINT, [(10.1, 20.5)])],
     [(KIND_POLYGON, [(0, 0), (0, 20), (10, 20), (10, 21), (11, 21), (11, 20), (20, 20), (20, 0), (0, 0)]),
      (KIND_POINT, [(10.1, 20.5)])]),
    ("wave_alternates", 10, False,
     [(KIND_LINE, [(0, 0), (50, 0), (50, 2), (49, 2), (49, 1), (48, 1), (48, 3),
                   (51, 3), (51, 0), (100, 0)])],
     [(KIND_LINE, [(0, 0), (100, 0)])]),
    ("smoothing", 3.9, True,
     [(KIND_LINE, [(0, -25), (25, 0), (25, 1), (29, 1), (29, 0), (50, -25)])],
     [(KIND_LINE, [(0, -25), (25, 0), (26.33333333333333215, 0.76980035891950094),
                   (27.66666666666666785, 0.76980035891950094), (29, 0), (50, -25)])]),
    # reference golden case 16 (reduce_bend_unittest.py): a holed polygon
    # through the DISTRIBUTED kernel — the exterior's bend reduces, the
    # interior ring survives untouched and comes back as ring 2
    ("polygon_with_bend_and_hole", 300, False,
     [(KIND_POLYGON,
       [[(0, 0), (0, 20), (10, 20), (10, 21), (11, 21), (11, 20), (20, 20), (20, 0), (0, 0)],
        [(5, 5), (5, 6), (6, 6), (6, 5), (5, 5)]])],
     [(KIND_POLYGON,
       [[(20, 20), (20, 0), (0, 0), (0, 20), (20, 20)],
        [(5, 5), (5, 6), (6, 6), (6, 5), (5, 5)]])]),
    # reference golden case 17 shape: a hole sitting inside the bend
    # BLOCKS its reduction (sidedness constraint sees the other ring)
    ("hole_blocks_bend", 3, False,
     [(KIND_POLYGON,
       [[(0, 0), (0, 20), (10, 20), (10, 21), (11, 21), (11, 20), (20, 20), (20, 0), (0, 0)],
        [(10.1, 20.1), (10.1, 20.2), (10.2, 20.2), (10.2, 20.1), (10.1, 20.1)]])],
     [(KIND_POLYGON,
       [[(0, 0), (0, 20), (10, 20), (10, 21), (11, 21), (11, 20), (20, 20), (20, 0), (0, 0)],
        [(10.1, 20.1), (10.1, 20.2), (10.2, 20.2), (10.2, 20.1), (10.1, 20.1)]])]),
]


def _rings_of(coords):
    if isinstance(coords[0][0], (tuple, list)):  # list of rings
        return [np.array(r, dtype=np.float64) for r in coords]
    return [np.array(coords, dtype=np.float64)]


def _case_pdf(geoms):
    rows = {"cell": [], "salt": [], "url": [], "kind": [], "xs": [], "ys": [],
            "ring_offsets": [], "is_owner": []}
    for i, (kind, coords) in enumerate(geoms):
        rings = _rings_of(coords)
        rows["cell"].append(1)
        rows["salt"].append(0)
        rows["url"].append(f"f{i}")
        rows["kind"].append(kind)
        rows["xs"].append([float(v) for r in rings for v in r[:, 0]])
        rows["ys"].append([float(v) for r in rings for v in r[:, 1]])
        offs, acc = [], 0
        for r in rings:
            offs.append(acc)
            acc += len(r)
        rows["ring_offsets"].append(offs)
        rows["is_owner"].append(True)
    return pd.DataFrame(rows)


@pytest.mark.parametrize("name,tol,smooth,geoms,expected",
                         CASES, ids=[c[0] for c in CASES])
def test_golden_through_spark(spark, name, tol, smooth, geoms, expected):
    pdf = _case_pdf(geoms)
    df = spark.createDataFrame(
        pdf, "cell long, salt int, url string, kind tinyint, xs array<double>, "
             "ys array<double>, ring_offsets array<int>, is_owner boolean")

    def kernel(batch):
        return _reduce_bend_kernel(batch, tol, smooth, epsilon=None)

    out = df.groupBy("cell").applyInPandas(kernel, KERNEL_OUT_SCHEMA)
    got = {r["url"]: (r["kind"], list(zip(r["xs"], r["ys"])), list(r["ring_offsets"]))
           for r in out.collect()}
    for i, (kind, coords) in enumerate(expected):
        exp_rings = _rings_of(coords)
        exp = [(float(x), float(y)) for r in exp_rings for x, y in r]
        offs, acc = [], 0
        for r in exp_rings:
            offs.append(acc)
            acc += len(r)
        assert got[f"f{i}"][0] == kind
        assert got[f"f{i}"][2] == offs, f"{name} f{i} ring_offsets {got[f'f{i}'][2]} vs {offs}"
        assert got[f"f{i}"][1] == exp, f"{name} f{i}:\n{got[f'f{i}'][1]}\nvs\n{exp}"
