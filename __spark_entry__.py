"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship query (the engine's LWW CDC-replay law expressed
over the events table). ``queries``/``oracle_sql`` expose one entry per
implemented operator family from SURVEY.md §2 plus the training-data ops
(dedup / similarity / text analysis); each is validated against DuckDB at
sf=0.01 by the driver.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_warehouse_etl_spark.operators import PARITY_ORACLE, PARITY_QUERIES
from data_warehouse_etl_spark.functions import (
    SIM_ORACLE,
    SIM_QUERIES,
    TEXT_ORACLE,
    TEXT_QUERIES,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the CDC apply law as a query — replay the events change feed
    with last-writer-wins and drop deleted keys (SURVEY.md §2.5 W2 / §2.9 M2)."""
    return PARITY_QUERIES["m2_cdc_lww_replay"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(PARITY_QUERIES)
    out.update(TEXT_QUERIES)
    out.update(SIM_QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(PARITY_ORACLE)
    out.update(TEXT_ORACLE)
    out.update(SIM_ORACLE)
    return out
