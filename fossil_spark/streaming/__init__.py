"""Structured Streaming: fire-and-forget ingest and live rollups —
the Spark-native equivalent of the reference's TCP append path
(/root/reference/pkg/server, APPEND command)."""
