from .events_stream import (
    click_purchase_stream_join,
    dedup_events_stream,
    enrich_stream_with_dim,
    enriched_tumbling_counts_stream,
    run_cdc_stream_to_managed_table,
    run_stream_to_managed_table,
    session_window_stream,
    sliding_counts_stream,
    stream_events,
    tumbling_counts_stream,
)
from .stateful import running_user_profiles

__all__ = [
    "stream_events",
    "sliding_counts_stream",
    "tumbling_counts_stream",
    "session_window_stream",
    "run_stream_to_managed_table",
    "run_cdc_stream_to_managed_table",
    "dedup_events_stream",
    "enrich_stream_with_dim",
    "enriched_tumbling_counts_stream",
    "click_purchase_stream_join",
    "running_user_profiles",
]
