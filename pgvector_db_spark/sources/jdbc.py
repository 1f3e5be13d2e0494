"""JDBC connector configuration (reference A18 / Tier B "JDBC table").

The reference connects to Postgres/RDS with psycopg2, resolving an IAM
auth token when no password is set and forcing ``sslmode=require``
(utils.py:65-79, pg_insert.py:45-49). In Spark the engine core stays
storage-agnostic; external DBs are a connector concern, so this module
only builds the ``spark.read.jdbc`` / ``write.jdbc`` call — URL, ssl
options, fetch/batch sizing, and the token-provider hook that replaces
the static password exactly like the reference's RDS path.

No *Postgres* driver jar ships in this image, so Postgres tests cover
option construction and the token path; the live read/write path itself
IS executed in tests against the embedded Derby engine that ships inside
Spark's own jars (``url_override`` + ``driver`` point the same
read_jdbc/write_jdbc code at ``jdbc:derby:``) — see
tests/test_utils_connectors.py.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class JDBCConfig:
    host: str
    database: str
    user: str
    port: int = 5432
    schema_name: str = "public"
    password: str | None = None
    # IAM-style ephemeral credential hook (reference utils.py:65-79):
    # called at connect time when no static password is configured.
    token_provider: Callable[[], str] | None = None
    sslmode: str | None = "require"
    fetch_size: int = 10_000
    batch_size: int = 1_000  # reference pg_insert.py:23 default
    extra_options: dict[str, str] = field(default_factory=dict)
    # non-Postgres engines (embedded Derby in tests, any warehouse in
    # production): point the SAME read/write code elsewhere
    driver: str = "org.postgresql.Driver"
    url_override: str | None = None

    @property
    def url(self) -> str:
        if self.url_override is not None:
            return self.url_override
        return f"jdbc:postgresql://{self.host}:{self.port}/{self.database}"

    def qualified(self, table: str) -> str:
        return f"{self.schema_name}.{table}"

    def resolve_password(self) -> str:
        if self.password is not None:
            return self.password
        if self.token_provider is not None:
            return self.token_provider()
        raise ValueError("JDBCConfig needs a password or a token_provider")

    def options(self, table: str) -> dict[str, str]:
        opts = {
            "url": self.url,
            "dbtable": self.qualified(table),
            "user": self.user,
            "password": self.resolve_password(),
            "driver": self.driver,
            "fetchsize": str(self.fetch_size),
            "batchsize": str(self.batch_size),
        }
        if self.sslmode is not None:
            opts["sslmode"] = self.sslmode
        opts.update(self.extra_options)
        return opts


def read_jdbc(
    spark: SparkSession,
    config: JDBCConfig,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
) -> DataFrame:
    """Parallel JDBC scan. Without a partition column the read is a single
    task (fine for dims); with one, Spark issues ``num_partitions`` range
    queries — the scale path for large tables."""
    reader = spark.read.format("jdbc")
    for k, v in config.options(table).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    return reader.load()


def write_jdbc(
    df: DataFrame, config: JDBCConfig, table: str, mode: str = "append"
) -> None:
    writer = df.write.format("jdbc").mode(mode)
    for k, v in config.options(table).items():
        writer = writer.option(k, v)
    writer.save()
