"""Structured Streaming operators: the reference's stream lifecycle
(poll loop, bounded replay, graceful shutdown, idempotent sink) plus the
EXT windowed/stateful closure."""
