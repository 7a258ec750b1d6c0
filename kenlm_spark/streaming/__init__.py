from kenlm_spark.streaming.jobs import (
    filtered_captions_stream,
    hourly_event_rollup_stream,
)

__all__ = ["filtered_captions_stream", "hourly_event_rollup_stream"]
