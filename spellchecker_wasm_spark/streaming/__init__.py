from .dedup import stream_exact_dedup
from .ingest import stream_dictionary_ingest, windowed_event_counts
from .sessions import sessionize_stream

__all__ = ["stream_dictionary_ingest", "windowed_event_counts",
           "sessionize_stream", "stream_exact_dedup"]
