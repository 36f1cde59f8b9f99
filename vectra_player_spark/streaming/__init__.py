"""Structured Streaming pipeline (SURVEY §2.11 T1-T11).

The reference's live path is CDP WebSocket → Socket.IO parse → EventBus →
stateful handlers → Parquet. Here the same stages are a Structured
Streaming job: file/Kafka source → from_json → stateful operators
(applyInPandasWithState) → partitioned lake sink. Watermarks are introduced
where the reference relied on implicit recency (SURVEY §2.11 note).
"""
