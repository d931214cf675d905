"""Driver-contract query catalog.

CATALOG maps query name -> QueryDef(spark_fn, oracle_sql).  Each
spark_fn takes (spark, sf_dir) and returns a DataFrame; oracle_sql is
the equivalent ANSI SQL DuckDB runs over the same parquet tables
(pre-registered views), or None for non-SQL-expressible ops (the
driver then records a weaker rows-only check).

Column names are aliased identically on both sides: the driver sorts
columns by name before value-hashing.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QueryDef:
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle_sql: Optional[str]


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def build_catalog() -> dict[str, QueryDef]:
    from . import relational, textops

    catalog: dict[str, QueryDef] = {}
    catalog.update(relational.CATALOG)
    catalog.update(textops.CATALOG)
    return catalog
