"""Scalar/vectorized functions shared between the NumPy kernels and the
Spark SQL expressions (hashing, geocoding, text analysis)."""
