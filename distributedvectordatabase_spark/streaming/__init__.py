"""Structured Streaming surface (SURVEY §2.2: absent in the reference —
"integration with real-time data streams" is its future work,
generate_report.py:299 — built here as the Spark-native extension)."""

from distributedvectordatabase_spark.streaming.ingest import (  # noqa: F401
    stream_dedup_documents,
    stream_ingest_vectors,
    stream_ivf_ingest,
    stream_knn_serve,
    stream_neardup_ingest,
    stream_text_index_ingest,
    stream_tokenizer_ingest,
    windowed_event_counts,
    sessionize_events,
)
