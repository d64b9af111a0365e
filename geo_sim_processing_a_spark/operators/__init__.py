"""Distributed operators: cell index / tiling, spatial joins, dedup,
similarity search, text analysis — the layers BASELINE.json's
north_rule adds on top of the reference's simplification kernels."""
