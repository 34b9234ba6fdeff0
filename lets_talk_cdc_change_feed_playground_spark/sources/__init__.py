from lets_talk_cdc_change_feed_playground_spark.sources.testdata import (
    TABLES,
    load_events,
    load_table,
    load_tables,
    register_views,
)

__all__ = ["TABLES", "load_events", "load_table", "load_tables", "register_views"]
