"""Structured Streaming surface.

The reference is strictly batch (SURVEY 2.8), so streaming here serves the
training-pipeline side: incremental ingest of event/doc streams with the same
operators the batch engine exposes. Every streaming job has a batch twin with
identical semantics (tested: availableNow streaming run == batch result).
"""
