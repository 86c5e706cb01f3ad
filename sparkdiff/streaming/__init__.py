from sparkdiff.streaming.validate import (  # noqa: F401
    incremental_validation,
    windowed_event_counts,
)
