"""Named query library: every operator from SURVEY.md §2 (plus the
training-data extensions) gets a named PySpark query and, where
SQL-expressible, a DuckDB oracle string.

``all_queries()`` is the single source of truth consumed by
``__spark_entry__.py``.
"""

from __future__ import annotations

from etl_8million_data__spark.plans.registry import Query, all_queries, get_query

__all__ = ["Query", "all_queries", "get_query"]
