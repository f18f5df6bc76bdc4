"""Structured Streaming layer: the reference pipeline as streaming queries.

Batch and streaming share the same operator functions (transform() over the
canonical CDC frame); this package adds the streaming-only concerns —
sources, watermark gating, epoch-ordered sinks, stateful transaction
assembly.
"""
