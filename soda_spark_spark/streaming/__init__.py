from .scan_stream import scan_stream, windowed_rollup

__all__ = ["scan_stream", "windowed_rollup"]
