"""The declared query surface (SURVEY.md §2.3) — driver-gradable.

Each registered query is a pair: a Spark implementation (DataFrame API,
Catalyst-optimized) and an equivalent ANSI-SQL oracle string DuckDB runs
on the same parquet tables. The grading driver compares row count,
schema, and an order-insensitive value hash at sf0.01 — so every
computed column is aliased identically on both sides, and floating-point
aggregation is routed through exact decimal arithmetic with a final
IEEE-double cast (identical bits on both engines) rather than raw double
sums (whose accumulation order differs).

Registry modules:
- ``dedupe_index``  — DQ1-DQ12: the reference's index queries, expressed
  over a SQL-derivable chunk index of the ``documents`` table
- ``relational``    — DQ13-DQ20: joins/aggs/windows/setops/scalar fns
- ``events``        — event-time windows (tumbling/sliding/session) and
  dedup — batch equivalents of the streaming module
- ``llm_pipeline``  — exact/near dedup, text analysis, similarity search
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None => not SQL-expressible; driver does rows-only
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        _REGISTRY[name] = QuerySpec(name=name, spark=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    # import for side effect of registration
    from watsondedupe_spark.queries import (  # noqa: F401
        curation_ext,
        dedupe_index,
        dq_ops,
        engine_native,
        events,
        export_ops,
        llm_pipeline,
        pipeline_ext,
        relational,
        relational_ext,
        scale_ops,
        tpch_full,
    )

    return dict(_REGISTRY)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.spark for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in all_queries().items() if spec.oracle is not None
    }
