from .microbatch import (  # noqa: F401
    incremental_ingest,
    session_window_agg,
    stream_stream_interval_join,
    streaming_dedupe,
    windowed_event_counts,
)
from .stateful import running_user_totals  # noqa: F401
