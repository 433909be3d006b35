"""Structured Streaming surface.

The reference is batch-only (SURVEY.md §1.2 — no streaming semantics exist
in it); this package adds the incremental-ingest operators a continuously
crawled corpus needs: stateless per-doc featurization on a stream and
incremental exact dedup against persistent state via foreachBatch.
"""
