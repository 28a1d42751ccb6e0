"""Structured Streaming jobs: the reference's continuous ingest path
(E1) with the semantics it lacks — watermarks, stateful dedup,
exactly-once via checkpointed idempotent sinks (SURVEY.md §2a/M4)."""
