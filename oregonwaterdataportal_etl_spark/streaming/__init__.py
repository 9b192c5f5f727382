from .stream import start_cdc_stream, windowed_event_counts

__all__ = ["start_cdc_stream", "windowed_event_counts"]
