"""Driver-contract query registry.

Each registered entry: name -> (spark_fn, oracle_sql | None).
spark_fn(spark, sf_dir) returns a DataFrame built with the engine's
operators; oracle_sql is the equivalent ANSI SQL DuckDB runs on the same
parquet views. Column names (and rounded float values) must match - the
driver sorts columns by name and hashes values.

Submodules register themselves on import:
  timeseries   the reference pipeline's operators (SURVEY.md section 2)
  relational   star-schema joins/aggs/windows/set-ops (section 2.9 ext)
  text         documents-table dedup + text analysis extensions
  similarity   embeddings-table similarity search extensions
"""

from __future__ import annotations

from .registry import REGISTRY, q


def queries():
    return {name: fn for name, (fn, _) in REGISTRY.items()}


def oracle_sql():
    return {name: sql for name, (_, sql) in REGISTRY.items() if sql is not None}


from . import timeseries  # noqa: E402,F401
from . import relational  # noqa: E402,F401
from . import text  # noqa: E402,F401
from . import similarity  # noqa: E402,F401
