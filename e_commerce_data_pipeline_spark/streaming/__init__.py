from .stream_processor import (  # noqa: F401
    bronze_ingest_query,
    parse_topic_stream,
    read_event_stream,
)
