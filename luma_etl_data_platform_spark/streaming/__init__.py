from .microbatch import (  # noqa: F401
    incremental_ingest,
    session_window_agg,
    windowed_event_counts,
)
