from ferenda_spark.streaming.ingest import (  # noqa: F401
    stream_pipeline,
    windowed_event_counts,
)
