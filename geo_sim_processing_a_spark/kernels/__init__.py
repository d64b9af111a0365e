"""Geometry kernels (pure NumPy; executed per tile inside applyInPandas).

Each kernel is a deterministic function of its inputs — no globals, no
entropy — so per-tile Spark tasks are idempotent and resumable.
"""
