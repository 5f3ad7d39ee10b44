"""JDBC sinks: overwrite / append / upsert (reference K5-K7).

The reference's upsert stages a temp table over JDBC, then runs a psycopg2
`INSERT ... ON CONFLICT ... DO UPDATE` merge on the driver
(streaming_to_analytics_mart_realtime.py:78-155). Spark has no upsert sink,
so this engine keeps that shape as a library op — but behind an injectable
merge executor, so tests verify the generated SQL and the staging protocol
without a live Postgres, and production plugs any DB-API connection factory.

Contract (reference mart/mart.md:56-62): idempotent per primary key — same
micro-batch replayed converges to the same mart state.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class JdbcConfig:
    url: str
    user: str = ""
    password: str = ""
    driver: str = "org.postgresql.Driver"

    def options(self) -> dict[str, str]:
        opts = {"url": self.url, "driver": self.driver}
        if self.user:
            opts["user"] = self.user
        if self.password:
            opts["password"] = self.password
        return opts


def write_jdbc(
    df: DataFrame, table: str, cfg: JdbcConfig, mode: str = "append", truncate: bool = False
) -> None:
    """Full overwrite (K5, `truncate=True` keeps DDL/indexes — reference
    load_to_postgres.py:46-64) or append (K6)."""
    writer = df.write.format("jdbc").options(**cfg.options()).option("dbtable", table)
    if truncate:
        writer = writer.option("truncate", "true")
    writer.mode(mode).save()


def upsert_merge_sql(table: str, staging: str, columns: Sequence[str], keys: Sequence[str]) -> str:
    """The merge statement the upsert runs after staging (Postgres dialect)."""
    collist = ", ".join(columns)
    conflict = ", ".join(keys)
    updates = ", ".join(f"{c} = EXCLUDED.{c}" for c in columns if c not in keys)
    return (
        f"INSERT INTO {table} ({collist})\n"
        f"SELECT {collist} FROM {staging}\n"
        f"ON CONFLICT ({conflict}) DO UPDATE SET {updates}"
    )


def upsert_to_jdbc(
    df: DataFrame,
    table: str,
    keys: Sequence[str],
    cfg: JdbcConfig,
    merge_executor: Callable[[str], None],
    staging_suffix: str = "_staging",
) -> None:
    """K7: stage via JDBC append, then execute the merge + cleanup.

    `merge_executor(sql)` runs one statement on the target DB (psycopg2 /
    any DB-API cursor in production; a recorder in tests). Driver-side merge
    single-threads only the final mart-sized statement — the bulk transfer
    stays distributed through the JDBC staging write.
    """
    staging = f"{table}{staging_suffix}"
    write_jdbc(df, staging, cfg, mode="overwrite")
    merge_executor(upsert_merge_sql(table, staging, df.columns, keys))
    merge_executor(f"DROP TABLE IF EXISTS {staging}")
