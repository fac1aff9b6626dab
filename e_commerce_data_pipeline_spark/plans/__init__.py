from .queries import QUERIES, QuerySpec, entry_query  # noqa: F401
