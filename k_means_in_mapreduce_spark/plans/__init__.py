from .explain import explain_string, pushed_filters, read_schemas, has_broadcast_join, count_exchanges

__all__ = [
    "explain_string",
    "pushed_filters",
    "read_schemas",
    "has_broadcast_join",
    "count_exchanges",
]
