"""JDBC source — the production Oracle reader.

Maps the reference's connection + read knobs onto the Spark JDBC
source (SURVEY.md §2.1 S1/S2, §2.5 P3/P7):

- ``fetch_size`` (``conf/OraServer.scala:7``, default 1000) →
  ``fetchsize`` option;
- connection identity (``ip, port, tnsname/service, user, password``,
  ``conf/OraServer.scala:3-13``) → JDBC URL + properties;
- per-copy Oracle session context setup
  (``msk_analytics.set_curr_date_context`` + ``DBMS_SESSION.SET_CONTEXT``,
  ``ora/jdbcSession.scala:271-286``) → ``sessionInitStatement``, which
  Spark runs on every executor connection — a direct fit;
- the reference parallelizes per-table only; Spark upgrades this to
  per-split parallel reads via ``partitionColumn/lowerBound/upperBound/
  numPartitions`` (S2) — at 100 TB this is the difference between one
  cursor and N concurrent range scans.

No Oracle driver jar ships in this image, but Spark's classpath
bundles the embedded Apache Derby engine (shipped for the Hive
metastore) — ``url``/``driver`` overrides on the config let the SAME
reader/writer path run a live end-to-end JDBC round-trip against
Derby in tests (S1 read → O1 load → S5 export), so only the
Oracle-specific URL scheme is untested here, not the JDBC data path.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrameReader, SparkSession

from ora_ch_spark.specs import TableSpec


@dataclass(frozen=True)
class JdbcSourceConfig:
    ip: str
    port: int = 1521
    service: str = "orcl"
    user: str = "orach"
    password: str = ""
    fetch_size: int = 1000  # conf/OraServer.scala:7 default
    # optional business-date context applied per connection (P7)
    curr_date_context: str | None = None
    analyt_datecalc: str | None = None
    # Oracle session tagging (ora/jdbcSession.scala:58-59,336-337 sets
    # OCSID.MODULE='ORATOCH' / OCSID.ACTION per task via JDBC client
    # info; the sessionInitStatement analogue is
    # DBMS_APPLICATION_INFO.SET_MODULE, which surfaces in
    # V$SESSION.module/action the same way) — observability parity
    module_tag: str | None = None
    action_tag: str | None = None
    # per-split parallel read (S2 — upgrade over reference)
    partition_column: str | None = None
    lower_bound: int | None = None
    upper_bound: int | None = None
    num_partitions: int | None = None
    # overrides for non-Oracle endpoints (e.g. embedded Derby e2e)
    url: str | None = None
    driver: str | None = None
    # raw session-init override: when set, used verbatim instead of the
    # Oracle PL/SQL block (lets the P7 mechanism run e2e on any engine)
    session_init_override: str | None = None
    # dbtable mode: let Catalyst push filters/projections into the
    # engine with correct identifier quoting instead of splicing a
    # raw SELECT (preferred for case-sensitive engines; the spliced
    # form mirrors the reference's hand-assembled SQL)
    use_dbtable: bool = False


def oracle_url(cfg: JdbcSourceConfig) -> str:
    if cfg.url:
        return cfg.url
    return f"jdbc:oracle:thin:@//{cfg.ip}:{cfg.port}/{cfg.service}"


def session_init_sql(cfg: JdbcSourceConfig) -> str | None:
    """Oracle session-context init (ora/jdbcSession.scala:271-286)."""
    if cfg.session_init_override:
        return cfg.session_init_override
    stmts = []
    if cfg.module_tag or cfg.action_tag:
        mod = (cfg.module_tag or "ORATOCH").replace("'", "''")
        act = (cfg.action_tag or "").replace("'", "''")
        stmts.append(
            f"DBMS_APPLICATION_INFO.SET_MODULE('{mod}','{act}')"
        )
    if cfg.curr_date_context:
        stmts.append(
            f"msk_analytics.set_curr_date_context(to_date('{cfg.curr_date_context}','dd.mm.yyyy'))"
        )
    if cfg.analyt_datecalc:
        stmts.append(
            "DBMS_SESSION.SET_CONTEXT('CLIENTCONTEXT','ANALYT_DATECALC',"
            f"'{cfg.analyt_datecalc}')"
        )
    if not stmts:
        return None
    return "BEGIN " + "; ".join(stmts) + "; END;"


def source_query(spec: TableSpec) -> str:
    """The pruned/filtered SELECT, assembled the way
    ``table/Table.scala:45-92`` does — except Spark also derives it
    automatically from the DataFrame plan; we emit it explicitly so
    the scan starts pruned even before Catalyst's pushdown."""
    cols = ", ".join(spec.only_columns) if spec.only_columns else "*"
    q = f"select {cols} from {spec.source_name}"
    if spec.where_filter:
        q += f" where {spec.where_filter}"
    if spec.order_by_ora_data:
        q += f" order by {spec.order_by_ora_data}"
    return q


def jdbc_reader(
    spark: SparkSession, cfg: JdbcSourceConfig, spec: TableSpec
) -> DataFrameReader:
    reader = (
        spark.read.format("jdbc")
        .option("url", oracle_url(cfg))
        .option("user", cfg.user)
        .option("password", cfg.password)
        .option("fetchsize", str(cfg.fetch_size))
        .option("driver", cfg.driver or "oracle.jdbc.OracleDriver")
    )
    init = session_init_sql(cfg)
    if init:
        reader = reader.option("sessionInitStatement", init)
    if cfg.partition_column:
        # Spark's `query` option is mutually exclusive with
        # partitionColumn — wrap the pruned SELECT as a dbtable subquery
        reader = (
            reader.option("dbtable", f"({source_query(spec)}) src")
            .option("partitionColumn", cfg.partition_column)
            .option("lowerBound", str(cfg.lower_bound))
            .option("upperBound", str(cfg.upper_bound))
            .option("numPartitions", str(cfg.num_partitions or 8))
        )
    elif cfg.use_dbtable:
        # declarative form: the operator's filter/select push down via
        # Catalyst (PushedFilters in the scan) with engine-correct
        # identifier quoting
        reader = reader.option("dbtable", spec.source_name)
    else:
        reader = reader.option("query", source_query(spec))
    return reader
