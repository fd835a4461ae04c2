"""Custom connectors (SURVEY §2.1) built on the Spark 4 Python
DataSource API — the engine-native replacement for the reference's
Quix Source subclasses (WebSocket S1/S2, REST-poll S3)."""
