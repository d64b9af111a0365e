"""geo_sim_processing_a_spark — a from-scratch PySpark-native spatial engine.

Reproduces the capabilities of the geo_sim_processing QGIS plugin
(reference at /root/reference: Sherbend bend reduction, chordal-axis
skeleton extraction, topology-preserving Douglas-Peucker) re-expressed
Spark-first, fused with an H3/S2-style tiling + spatial-join layer over
Common-Crawl-style web pages, plus training-data pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing).

All geometry math is vectorized NumPy inside Arrow/pandas UDFs —
no per-row Python in any hot path.
"""

__version__ = "0.1.0"
