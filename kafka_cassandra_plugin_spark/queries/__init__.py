"""Declared query registry.

Every implemented operator from SURVEY.md §2 is represented by at least one
named query: a Spark DataFrame build function plus (where SQL-expressible)
the equivalent DuckDB oracle SQL.  ``__spark_entry__.queries()`` /
``oracle_sql()`` are thin exports of this registry; the pytest suite runs
the same pairs through the in-repo oracle harness.

Naming convention: ``<area>_<short name>`` where area hints at the SURVEY
§2 tier rows the query exercises (the mapping is in each Query.tags).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Query:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    sql: Optional[str]  # DuckDB oracle SQL; None => rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)  # SURVEY §2 row ids
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    sql: Optional[str],
    tags: tuple[str, ...] = (),
    doc: str = "",
):
    """Decorator: register a build function under ``name``."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name=name, build=fn, sql=sql, tags=tags, doc=doc or fn.__doc__ or "")
        return fn

    return deco


def load_all() -> dict[str, Query]:
    """Import all query modules (side effect: fills REGISTRY) and return it."""
    from . import relational  # noqa: F401
    from . import scalar_fns  # noqa: F401
    from . import reference_ops  # noqa: F401
    from . import llm_ops  # noqa: F401
    from . import coverage  # noqa: F401

    return REGISTRY
