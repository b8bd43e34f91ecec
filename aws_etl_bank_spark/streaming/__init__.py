from aws_etl_bank_spark.streaming.runner import (  # noqa: F401
    for_each_batch,
    sample_streaming_frame,
    windowed_event_counts,
)
