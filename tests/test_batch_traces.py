"""Batch trace generator is bit-identical to the scalar one."""

import numpy as np

from geo_sim_processing_a_spark.functions.hashing import xxhash64_long_signed
from geo_sim_processing_a_spark.sources.pages import (
    geocode_hashes, trace_polyline, trace_polylines_batch)


def test_bit_identical():
    h = xxhash64_long_signed(np.arange(300))
    lon, lat, _, _ = geocode_hashes(h)
    batch = trace_polylines_batch(h, lon, lat)
    for i in range(300):
        assert np.array_equal(trace_polyline(int(h[i]), lon[i], lat[i]), batch[i])
