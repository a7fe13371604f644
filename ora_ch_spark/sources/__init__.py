from ora_ch_spark.sources.jdbc import JdbcSourceConfig, jdbc_reader, oracle_url
from ora_ch_spark.sources.parquet import parquet_source

__all__ = ["JdbcSourceConfig", "jdbc_reader", "oracle_url", "parquet_source"]
