"""Sources & sinks (SURVEY.md §2.1)."""

from stream_reader_mzxml_spark.sources.readers import (  # noqa: F401
    read_sequences,
    read_sequences_stream,
    read_table,
    sequences_from_events,
    spread_scan,
)
