from .stateful import conversation_progress
from .stream import start_cdc_stream, start_cdc_stream_zx, windowed_event_counts

__all__ = [
    "conversation_progress",
    "start_cdc_stream",
    "start_cdc_stream_zx",
    "windowed_event_counts",
]
