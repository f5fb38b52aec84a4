from .registry import REGISTRY, QuerySpec, oracle_sql, queries

# Importing the modules populates REGISTRY.
from . import relational  # noqa: E402,F401
from . import extensions  # noqa: E402,F401
from . import streaming_q  # noqa: E402,F401
from . import tpch  # noqa: E402,F401
from . import recursive_sql  # noqa: E402,F401
from . import search_q  # noqa: E402,F401
from . import stats_q  # noqa: E402,F401

__all__ = ["REGISTRY", "QuerySpec", "queries", "oracle_sql"]
