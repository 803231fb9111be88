from .registry import QuerySpec, all_queries, register

__all__ = ["QuerySpec", "all_queries", "register"]
