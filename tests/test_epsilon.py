"""G4 — epsilon / numeric parity fixtures (FIXTURES.md §G4,
reference reduce_bend_algorithm.py:1045-1088)."""

import math

import numpy as np

from geo_sim_processing_a_spark.geom.epsilon import Epsilon


def test_unit_extent():
    # bbox dynamic D ~ 20 (typical unit-test extent)
    e = Epsilon((0.0, 0.0, 20.0, 20.0))
    d = 20.0
    assert e.zero_relative == 10 ** -(15 - int(math.log10(d) + 1) - 2)
    assert e.zero_absolute == 1e-13
    assert e.zero_angle == math.radians(1e-4)


def test_web_mercator_extent():
    e = Epsilon((-2e7, -2e7, 2e7, 2e7))
    d = 4e7
    assert e.zero_relative == 10 ** -(15 - int(math.log10(d) + 1) - 2)


def test_empty_input_bbox():
    # reference uses QgsRectangle(0, 0, 1, 1) for empty input (:1060)
    e = Epsilon(None)
    assert e.zero_relative == 1e-12


def test_from_coords():
    e = Epsilon.from_coords([np.array([[0.0, 0.0], [20.0, 5.0]])])
    assert e.zero_relative == Epsilon((0.0, 0.0, 20.0, 5.0)).zero_relative
    assert Epsilon.from_coords([]).zero_relative == 1e-12
