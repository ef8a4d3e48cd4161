"""Testdata table catalog: parquet loaders for the driver-generated tables.

The ``events`` table stores ``ts`` as parquet TIMESTAMP(NANOS), which Spark
cannot represent (TimestampType is microsecond-precision). We read nanos as
``long`` (``spark.sql.legacy.parquet.nanosAsLong`` in session.py) and floor
to microseconds with ``timestamp_micros(ts div 1000)``. Flooring preserves
every comparison against microsecond-aligned literals (for bound B aligned
to 1 µs: floor_us(v) >= B ⇔ v >= B), so filters/windows at second
granularity are exact; only sub-µs display precision is lost. Queries that
*return* ts values truncate to a common granularity on both the Spark and
oracle sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["TABLES", "load_table", "register_views"]

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str,
                   names: tuple[str, ...] = TABLES) -> None:
    """Register each table as a temp view named after itself."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
