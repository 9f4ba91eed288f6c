"""JDBC source/sink (SURVEY.md §2.1 S10).

The reference bulk-loads staging rows over a DB connection in 1,000-row
batches (cbddl/src/etl/pipeline.py:161-203) and upserts per event from
the stream (cbddl/src/big_data/streaming_processor.py:534-550). The
engine-native form is ``df.write.jdbc`` — every executor opens its own
connection and writes its partitions in ``batchsize``-row batches, so
sink parallelism = DataFrame partitions (bound it with
``df.repartition(n)`` to respect the database's connection budget).

Reads scale the same way: a naive ``read.jdbc`` is ONE connection
pulling the whole table through the driver; passing
``partitionColumn/lowerBound/upperBound/numPartitions`` shards the scan
into parallel range queries, and Catalyst pushes filters into the
remote SQL (visible as PushedFilters in the plan).

Tests exercise the full round trip against the Derby embedded driver
that ships with Spark (no server needed); against Postgres et al. only
the URL/driver strings change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def derby_url(db_dir: str) -> str:
    """Embedded-Derby URL rooted at a directory (created on first use)."""
    return f"jdbc:derby:{db_dir};create=true"


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "overwrite",
    batch_size: int = 1000,
    driver: str = DERBY_DRIVER,
    max_connections: int | None = None,
) -> None:
    """Batched parallel JDBC sink (S10).

    ``batch_size`` mirrors the reference's 1,000-row insert batches;
    ``max_connections`` caps sink parallelism by coalescing the
    DataFrame first (each partition is one connection).
    """
    out = df.coalesce(max_connections) if max_connections else df
    (
        out.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", driver)
        .option("batchsize", str(batch_size))
        .mode(mode)
        .save()
    )


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    driver: str = DERBY_DRIVER,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """JDBC scan; pass the partition quadruple for a sharded parallel read."""
    partition_opts = (partition_column, lower_bound, upper_bound, num_partitions)
    if any(o is not None for o in partition_opts) and any(
        o is None for o in partition_opts
    ):
        raise ValueError(
            "sharded JDBC reads need ALL of partition_column/lower_bound/"
            f"upper_bound/num_partitions; got {partition_opts!r}"
        )
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", driver)
    )
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    return reader.load()
