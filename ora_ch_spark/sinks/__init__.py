from ora_ch_spark.sinks.jdbc import JdbcSinkConfig, jdbc_export, jdbc_writer

__all__ = ["JdbcSinkConfig", "jdbc_export", "jdbc_writer"]
