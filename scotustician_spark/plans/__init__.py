from .registry import QUERY_REGISTRY, Query, register  # noqa: F401
