from manage_versions_of_data_in_data_lake_using_lakefs_spark.streaming.source import (  # noqa: F401
    register_lake_stream_source,
    stream_table_from_repo,
)
from manage_versions_of_data_in_data_lake_using_lakefs_spark.streaming.ops import (  # noqa: F401
    EVENTS_SCHEMA,
    run_to_memory,
    sessionize,
    stream_events_from_dir,
    stream_refresh_agg,
    streaming_dedup,
    streaming_simhash_neardup,
    windowed_counts,
)
