"""Sources/sinks: the deterministic synthetic Common-Crawl-style pages
table (BASELINE.json input_hint), parquet IO helpers, and the
checkpoint/lineage manifest (SURVEY.md S7)."""
