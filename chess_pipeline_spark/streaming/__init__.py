from chess_pipeline_spark.streaming.jobs import (  # noqa: F401
    read_events_stream,
    stream_dedup_latest,
    stream_session_counts,
    stream_tumbling_counts,
    stream_upsert_foreach_batch,
)
