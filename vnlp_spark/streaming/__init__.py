from . import stream_kg  # noqa: F401
