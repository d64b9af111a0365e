"""Structured Streaming surface.

Neither the reference nor BASELINE.json's north_rule requires streaming
(checkpoint/resume is batch-level, SURVEY.md §2.8); this module exists
because a Common-Crawl-scale ingest is naturally incremental: new WARC
drops arrive as files, and the tiling pipeline is
idempotent-per-tile, so foreachBatch + the batch manifest gives
exactly-once tile outputs."""
