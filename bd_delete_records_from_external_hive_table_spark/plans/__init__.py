"""Declared-query plans: the engine's DuckDB-oracle-checked query surface.

Importing this package populates the registry; modules self-register via
the :func:`registry.register` decorator.
"""

from . import analytics  # noqa: F401
from . import analytics_ext  # noqa: F401
from . import analytics_wave3  # noqa: F401
from . import analytics_wave4  # noqa: F401
from . import llm_ops  # noqa: F401
from . import reference_queries  # noqa: F401
from .registry import REGISTRY, oracle_sql, queries, register  # noqa: F401

__all__ = ["REGISTRY", "queries", "oracle_sql", "register"]
