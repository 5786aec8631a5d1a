from big_data_analytics_cse545_spark.sources.tables import (
    TABLE_NAMES,
    load_table,
    load_tables,
    register_views,
    spread_scan,
)

__all__ = [
    "TABLE_NAMES",
    "load_table",
    "load_tables",
    "register_views",
    "spread_scan",
]
