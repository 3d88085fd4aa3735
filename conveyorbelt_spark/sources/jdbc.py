"""SQL/JDBC shard scan (S3) — the reference's SqlShardKeyQuery re-expressed
as a predicate-partitioned ``spark.read.jdbc``.

Reference parity (src/ConveyorBelt.Tooling/Querying/SqlShardKeyQuery.cs):
- :36  ``SELECT * FROM {table} WHERE {shardField} = '{minute-key}'`` — one
  server-side-filtered scan per shard key. Here every shard key becomes one
  JDBC predicate partition, so N keys = N parallel partitioned reads with
  the filter pushed into the database (Spark's JDBC predicates API).
- :48-66 EAV typing of the returned rows — subsumed by the JDBC source's
  typed ResultSet schema; ``eav_to_doc``/``apply_mapping`` handle any
  further stringly projection.

Environment-gated like the reference's IntegrationTests (no database in the
sandbox): predicate construction is pure and unit-tested; ``read_sql_shards``
only touches the network when invoked against a real url.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _sql_quote(value: str) -> str:
    """Escape a literal for a SQL string (single quotes doubled)."""
    return value.replace("'", "''")


def sql_shard_predicates(shard_field: str, keys: list[str]) -> list[str]:
    """One pushdown predicate per shard key → one JDBC partition each
    (SqlShardKeyQuery.cs:36's WHERE clause, N keys in parallel)."""
    if not shard_field.replace("_", "").isalnum():
        raise ValueError(f"unsafe shard field name: {shard_field!r}")
    return [f"{shard_field} = '{_sql_quote(k)}'" for k in keys]


def sql_range_predicate(shard_field: str, lo: str, hi: str) -> str:
    """Inclusive range scan (ShardRangeActor.cs:48-52 analogue)."""
    if not shard_field.replace("_", "").isalnum():
        raise ValueError(f"unsafe shard field name: {shard_field!r}")
    return f"{shard_field} >= '{_sql_quote(lo)}' AND {shard_field} <= '{_sql_quote(hi)}'"


def read_sql_shards(
    spark: SparkSession,
    url: str,
    table: str,
    shard_field: str,
    keys: list[str],
    **options: str,
) -> DataFrame:
    """Partitioned JDBC scan: each shard key's predicate is pushed into the
    database and read by its own task. ``options`` pass through to the JDBC
    source (user, password, driver, fetchsize, ...)."""
    properties = {k: str(v) for k, v in options.items()}
    return spark.read.jdbc(
        url=url,
        table=table,
        predicates=sql_shard_predicates(shard_field, keys),
        properties=properties,
    )


def read_sql_range(
    spark: SparkSession,
    url: str,
    table: str,
    shard_field: str,
    lo: str,
    hi: str,
    num_partitions: int = 8,
    **options: str,
) -> DataFrame:
    """Range scan pushed into a derived-table read; Spark splits it into
    ``num_partitions`` by the shard field when bounds are numeric, else one
    filtered read."""
    pred = sql_range_predicate(shard_field, lo, hi)
    dbtable = f"(SELECT * FROM {table} WHERE {pred}) cb_range"
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", dbtable)
        .option("numPartitions", str(num_partitions))
    )
    for k, v in options.items():
        reader = reader.option(k, str(v))
    return reader.load()
