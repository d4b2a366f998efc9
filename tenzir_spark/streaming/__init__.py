from tenzir_spark.streaming.stream import (
    follow_parquet,
    follow_json,
    windowed_summarize,
    stream_cdc_apply,
    stream_deduplicate,
    stream_sessionize,
)

__all__ = ["follow_parquet", "follow_json", "windowed_summarize",
           "stream_cdc_apply", "stream_deduplicate", "stream_sessionize"]
