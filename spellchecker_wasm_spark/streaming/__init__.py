from .ingest import stream_dictionary_ingest, windowed_event_counts
from .sessions import sessionize_stream

__all__ = ["stream_dictionary_ingest", "windowed_event_counts",
           "sessionize_stream"]
