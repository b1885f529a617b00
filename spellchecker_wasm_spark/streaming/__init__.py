from .ingest import stream_dictionary_ingest, windowed_event_counts

__all__ = ["stream_dictionary_ingest", "windowed_event_counts"]
