"""JDBC sink — the production CH→Oracle export writer (S5/S6, S10).

The reference's live export is an INSERT…SELECT over the ClickHouse
jdbc-bridge (``clickhouse/jdbsChSession.scala:400-450``); its dead
row-path (``:512-675``) documents the intended batching: rows buffered
and flushed every ``batch_size`` (default 1000,
``conf/ClickhouseServer.scala:7``). ``df.write.jdbc`` with
``batchsize`` does exactly that per partition, and hash
repartitioning gives the parallel sliced export the reference builds
with ``cityHash64`` + ``NTILE`` (S6) for free — each partition is an
independent writer with its own connection.

Pre-copy truncate of the Oracle target (``ora/jdbcSession.scala:131-140``)
maps to ``.option("truncate", "true").mode("overwrite")``.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class JdbcSinkConfig:
    url: str
    user: str = ""
    password: str = ""
    batch_size: int = 1000  # conf/ClickhouseServer.scala:7 default
    truncate_before: bool = True  # ora/jdbcSession.scala:131-140
    driver: str = "oracle.jdbc.OracleDriver"


def jdbc_writer(df: DataFrame, cfg: JdbcSinkConfig, table: str):
    mode = "overwrite" if cfg.truncate_before else "append"
    return (
        df.write.format("jdbc")
        .mode(mode)
        .option("url", cfg.url)
        .option("dbtable", table)
        .option("user", cfg.user)
        .option("password", cfg.password)
        .option("batchsize", str(cfg.batch_size))
        .option("truncate", "true" if cfg.truncate_before else "false")
        .option("isolationLevel", "READ_COMMITTED")
        .option("driver", cfg.driver)
    )


def jdbc_export(
    df: DataFrame,
    cfg: JdbcSinkConfig,
    table: str,
    parts: int = 1,
    parts_key: str | None = None,
) -> None:
    """Whole or hash-sliced export (S5/S6)."""
    if parts > 1 and parts_key:
        df = df.repartition(parts, F.xxhash64(parts_key))
    jdbc_writer(df, cfg, table).save()
