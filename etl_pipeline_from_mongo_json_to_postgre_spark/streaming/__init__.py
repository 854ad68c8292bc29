from .events import events_stream, run_stream_to_memory, windowed_counts

__all__ = ["events_stream", "run_stream_to_memory", "windowed_counts"]
