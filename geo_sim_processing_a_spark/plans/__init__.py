"""Logical-plan assembly: session config, the flagship geo pipeline,
and resume orchestration.  All plans are plain DataFrame compositions —
Catalyst owns optimization (SURVEY.md §4.2); no custom rules."""
