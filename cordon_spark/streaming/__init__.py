"""Structured Streaming adapters (graft extension; the reference is
strictly batch — SURVEY.md §2.1 'Streaming: none')."""
