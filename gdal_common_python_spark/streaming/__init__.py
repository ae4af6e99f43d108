"""Incremental execution: checkpoint/lineage table + idempotent resume.

The reference is a batch file-to-file library with zero streaming surface
(SURVEY §2.10); the north rule's incremental requirement is *resumability* —
implemented here as deterministic bucket keying + an anti-join against the
checkpoint table, not Structured Streaming.
"""
