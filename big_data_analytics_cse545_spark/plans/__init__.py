from big_data_analytics_cse545_spark.plans.explain import (
    explain_str,
    has_broadcast_join,
    pushed_filters,
    runtime_shuffle_exchanges,
    scan_read_schema,
    shuffle_exchanges,
    wholestage_codegen_spans,
)

__all__ = [
    "explain_str",
    "has_broadcast_join",
    "pushed_filters",
    "runtime_shuffle_exchanges",
    "scan_read_schema",
    "shuffle_exchanges",
    "wholestage_codegen_spans",
]
