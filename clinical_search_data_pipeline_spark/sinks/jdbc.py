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

from clinical_search_data_pipeline_spark.plans.introspect import (
    collect_stream_lint,
)


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


def delete_using_sql(table: str, staging: str, keys: Sequence[str]) -> str:
    """The keyed delete the CDC apply runs after staging the net-delete
    keys (Postgres `DELETE ... USING`; DuckDB accepts the same form)."""
    cond = " AND ".join(f"{table}.{k} = {staging}.{k}" for k in keys)
    return f"DELETE FROM {table} USING {staging} WHERE {cond}"


def apply_changes_to_jdbc(
    changes: DataFrame,
    table: str,
    keys: Sequence[str],
    cfg: JdbcConfig | None,
    merge_executor: Callable[[str], None],
    staging_suffix: str = "_cdc_staging",
    stage_writer: Callable[[DataFrame, str], None] | None = None,
) -> None:
    """CDC apply: ship a `sinks/manifest.snapshot_change_feed` frame to a
    keyed serving table — the incremental successor of the reference's
    full-reload `mart_load_job` for tables whose upstream evolves by
    merge/replace commits.

    Each key's changes NET OUT on the Spark side first (latest commit
    wins; within one commit the insert post-image beats its own delete
    pre-image), so the serving DB sees at most one statement-row per key
    regardless of how many commits the range spans. Net deletes stage and
    apply as one keyed `DELETE ... USING`; net inserts go through the K7
    staged `ON CONFLICT` merge. Replay-idempotent like the K7 path: the
    same feed applied twice converges.

    `stage_writer(df, staging_table)` defaults to the distributed JDBC
    overwrite (`cfg` required); tests inject a DuckDB writer."""
    from pyspark.sql import functions as F

    from clinical_search_data_pipeline_spark.sinks.manifest import net_changes

    if stage_writer is None:
        if cfg is None:
            raise ValueError("apply_changes_to_jdbc needs cfg or stage_writer")
        stage_writer = lambda df, t: write_jdbc(df, t, cfg, mode="overwrite")  # noqa: E731
    data_cols = [
        c
        for c in changes.columns
        if c not in ("_change_type", "_commit_version")
    ]
    net = net_changes(changes, list(keys))
    deletes = net.filter(F.col("_change_type") == "delete").select(*keys)
    inserts = net.filter(F.col("_change_type") == "insert").select(*data_cols)
    # the CDC consumers' plans run through the same streaming lint sweep
    # as the admission gates (no-op unless a collector is active): the
    # netting window + staged splits ARE the per-micro-batch plan
    collect_stream_lint(deletes)
    collect_stream_lint(inserts)
    stage_del = f"{table}{staging_suffix}_del"
    stage_ins = f"{table}{staging_suffix}"
    stage_writer(deletes, stage_del)
    merge_executor(delete_using_sql(table, stage_del, keys))
    merge_executor(f"DROP TABLE IF EXISTS {stage_del}")
    stage_writer(inserts, stage_ins)
    merge_executor(upsert_merge_sql(table, stage_ins, data_cols, keys))
    merge_executor(f"DROP TABLE IF EXISTS {stage_ins}")
