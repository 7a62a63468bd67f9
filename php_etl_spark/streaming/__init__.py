from php_etl_spark.streaming.events import (  # noqa: F401
    events_stream,
    run_to_memory,
    tumbling_agg,
    sliding_agg,
    session_agg,
    dedup_keys,
    stateful_counts,
)
