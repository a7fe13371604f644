"""Dialect-battery catalog entries: the ClickHouse-SQL surface
driven end-to-end through ``translate_ch_sql`` and value-gated
against DuckDB oracles (batteries 5-13, geo, dictGet, ASOF SQL,
and the round-8 strict-funnel / time-sequence / WITH FILL
INTERPOLATE batteries). Split out of catalog_ext.py in round 8
(mechanical move; entry list and declaration order unchanged in
``catalog_ext.EXT_QUERIES``)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_DIALECT5_CH_SQL = """
select 'zip' as tag, w as k,
       toInt64(count(*)) as n, toInt64(sum(i)) as s
from (
  select p_partkey, splitByChar(' ', p_name) as words
  from part where p_partkey <= 100
)
array join words as w, arrayEnumerate(words) as i
group by w
union all
select 'shadow' as tag, words as k,
       toInt64(count(*)) as n, toInt64(0) as s
from (
  select p_partkey, splitByChar(' ', p_name) as words
  from part where p_partkey <= 100
)
array join words
group by words
union all
select 'left' as tag, coalesce(s, '(empty)') as k,
       toInt64(count(*)) as n,
       toInt64(sum(if(s is null, 1, 0))) as s
from (
  select arraySlice(splitByChar(' ', p_name), 1, modulo(p_size, 3)) as sl
  from part where p_partkey <= 100
)
left array join sl as s
group by coalesce(s, '(empty)')
union all
select 'inner' as tag, s as k,
       toInt64(count(*)) as n, toInt64(0) as s
from (
  select arraySlice(splitByChar(' ', p_name), 1, modulo(p_size, 3)) as sl
  from part where p_partkey <= 100
)
array join sl as s
group by s
"""


def calc_dialect5_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARRAY JOIN clause battery, value-gated: the CH text above runs
    through ``translate_ch_sql`` (clause → LATERAL VIEW rewrite,
    ``dialect._rewrite_array_join``) and must match the DuckDB
    unnest replay — DuckDB's multi-unnest zips element-wise with NULL
    padding, the same drift contract the rewrite documents."""
    from ora_ch_spark.functions.dialect import translate_ch_sql
    from ora_ch_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(translate_ch_sql(_DIALECT5_CH_SQL)).orderBy("tag", "k")


DIALECT5_ORACLE = """
SELECT 'zip' AS tag, w AS k,
       cast(count(*) as bigint) AS n, cast(sum(i) as bigint) AS s
FROM (
  SELECT unnest(string_split(p_name, ' ')) AS w,
         unnest(range(1, len(string_split(p_name, ' ')) + 1)) AS i
  FROM part WHERE p_partkey <= 100
) GROUP BY w
UNION ALL
SELECT 'shadow' AS tag, words AS k,
       cast(count(*) as bigint) AS n, cast(0 as bigint) AS s
FROM (
  SELECT unnest(string_split(p_name, ' ')) AS words
  FROM part WHERE p_partkey <= 100
) GROUP BY words
UNION ALL
SELECT 'left' AS tag, coalesce(s, '(empty)') AS k,
       cast(count(*) as bigint) AS n,
       cast(sum(CASE WHEN s IS NULL THEN 1 ELSE 0 END) as bigint) AS s
FROM (
  SELECT unnest(CASE WHEN len(sl) = 0 THEN [NULL] ELSE sl END) AS s
  FROM (
    SELECT list_slice(string_split(p_name, ' '), 1, p_size % 3) AS sl
    FROM part WHERE p_partkey <= 100
  )
) GROUP BY coalesce(s, '(empty)')
UNION ALL
SELECT 'inner' AS tag, s AS k,
       cast(count(*) as bigint) AS n, cast(0 as bigint) AS s
FROM (
  SELECT unnest(sl) AS s
  FROM (
    SELECT list_slice(string_split(p_name, ' '), 1, p_size % 3) AS sl
    FROM part WHERE p_partkey <= 100
  )
) GROUP BY s
"""


# ---------------------------------------------------------------------------
# Dialect battery #6 — round-7 function-surface additions
# ---------------------------------------------------------------------------

# arrayFirstIndex / arrayCompact / arrayWithConstant / arrayReverseSort
# / arrayRotate* / splitByWhitespace / substringIndex /
# levenshteinDistance / toLastDayOfMonth / toStartOfFiveMinutes /
# toISOWeek / monthName / dateName / moduloOrZero / IPv4* /
# tuple+tupleElement / JSONLength — translated at runtime, replayed in
# DuckDB below.
_DIALECT6_CH_SQL = """
select flag,
       toInt64(count(*)) as n,
       toInt64(sum(arrayFirstIndex(x -> x > 25, [p_size, p_size + 10, 60]))) as fi,
       toInt64(sum(arraySum(arrayCompact([modulo(p_size, 3), modulo(p_size, 3),
                                          modulo(p_size, 5)])))) as comp,
       toInt64(sum(arraySum(arrayWithConstant(3, modulo(p_partkey, 7))))) as awc,
       max(arrayStringConcat(arrayReverseSort(splitByChar(' ', p_name)), '-')) as rev,
       max(arrayStringConcat(arrayRotateLeft(splitByChar(' ', p_name), 2), '|')) as rotl,
       max(arrayStringConcat(arrayRotateRight(splitByChar(' ', p_name), 1), '|')) as rotr,
       toInt64(sum(arrayCount(x -> x != '', splitByWhitespace(p_name)))) as wc,
       max(substringIndex(p_type, ' ', 2)) as si,
       toInt64(sum(levenshteinDistance(p_brand, p_type))) as lev,
       max(toYYYYMMDD(toLastDayOfMonth(mk_date))) as ld,
       toInt64(min(toUnixTimestamp(toStartOfFiveMinutes(ship_ts)))) as ts5,
       toInt64(min(toUnixTimestamp(toStartOfTenMinutes(ship_ts)))) as ts10,
       toInt64(min(toUnixTimestamp(toStartOfFifteenMinutes(ship_ts)))) as ts15,
       toInt64(sum(toISOWeek(mk_date))) as iw,
       max(monthName(mk_date)) as mn,
       max(dateName('weekday', mk_date)) as dn,
       toInt64(sum(moduloOrZero(p_partkey, modulo(p_size, 4)))) as mz,
       max(IPv4NumToString(p_partkey * 65536 + p_size)) as ip,
       toInt64(sum(IPv4StringToNum(concat('10.0.', toString(modulo(p_size, 256)),
                                          '.1')))) as ipn,
       toInt64(sum(tupleElement(tuple(p_size, p_name), 1))) as te,
       toInt64(sum(JSONLength(if(modulo(p_size, 2) = 0, '[1,2,3]',
                                 '{"a":1}')))) as jl
from (
  select p_partkey, p_name, p_brand, p_type, p_size,
         multiIf(p_size > 25, 'H', 'L') as flag,
         addDays(toDateOrZero('1995-01-03'), modulo(p_partkey, 500)) as mk_date,
         addSeconds(toDateTime(toDateOrZero('1995-01-01')),
                    modulo(p_partkey, 86399)) as ship_ts
  from part
  where p_partkey <= 150
)
group by flag
order by flag
"""


def calc_dialect6_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-6 dialect surface, value-gated against the DuckDB
    replay (UTC session; DuckDB list lambdas use 1-based indices,
    Spark's 0-based — the oracle encodes each engine's own
    convention for the same semantics)."""
    from ora_ch_spark.functions.dialect import translate_ch_sql
    from ora_ch_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(translate_ch_sql(_DIALECT6_CH_SQL)).orderBy("flag")


DIALECT6_ORACLE = """
SELECT flag,
       cast(count(*) as bigint) AS n,
       cast(sum(coalesce(list_position(list_transform(
           [p_size, p_size + 10, 60], x -> x > 25), true), 0)) as bigint) AS fi,
       cast(sum(list_sum(list_filter(
           [p_size % 3, p_size % 3, p_size % 5],
           (x, i) -> i = 1 OR x != [p_size % 3, p_size % 3, p_size % 5][i - 1]
       ))) as bigint) AS comp,
       cast(sum(list_sum(list_transform(range(3), x -> p_partkey % 7)))
            as bigint) AS awc,
       max(array_to_string(list_reverse_sort(string_split(p_name, ' ')), '-')) AS rev,
       max(array_to_string(
           CASE WHEN len(string_split(p_name, ' ')) <= 1
                THEN string_split(p_name, ' ')
                ELSE string_split(p_name, ' ')[(2 % len(string_split(p_name, ' '))) + 1:]
                     || string_split(p_name, ' ')[1:(2 % len(string_split(p_name, ' ')))]
           END, '|')) AS rotl,
       max(array_to_string(
           CASE WHEN len(string_split(p_name, ' ')) <= 1
                THEN string_split(p_name, ' ')
                ELSE string_split(p_name, ' ')[len(string_split(p_name, ' ')):]
                     || string_split(p_name, ' ')[1:len(string_split(p_name, ' ')) - 1]
           END, '|')) AS rotr,
       cast(sum(len(list_filter(regexp_split_to_array(p_name, '\\s+'),
                                x -> x != ''))) as bigint) AS wc,
       max(array_to_string((string_split(p_type, ' '))[1:2], ' ')) AS si,
       cast(sum(levenshtein(p_brand, p_type)) as bigint) AS lev,
       max(cast(strftime(last_day(mk_date), '%Y%m%d') as int)) AS ld,
       cast(min((epoch(ship_ts)::BIGINT // 300) * 300) as bigint) AS ts5,
       cast(min((epoch(ship_ts)::BIGINT // 600) * 600) as bigint) AS ts10,
       cast(min((epoch(ship_ts)::BIGINT // 900) * 900) as bigint) AS ts15,
       cast(sum(weekofyear(mk_date)) as bigint) AS iw,
       max(monthname(mk_date)) AS mn,
       max(dayname(mk_date)) AS dn,
       cast(sum(CASE WHEN p_size % 4 = 0 THEN 0
                     ELSE p_partkey % (p_size % 4) END) as bigint) AS mz,
       max(concat(
           cast(((p_partkey * 65536 + p_size) // 16777216) % 256 as varchar), '.',
           cast(((p_partkey * 65536 + p_size) // 65536) % 256 as varchar), '.',
           cast(((p_partkey * 65536 + p_size) // 256) % 256 as varchar), '.',
           cast((p_partkey * 65536 + p_size) % 256 as varchar))) AS ip,
       cast(sum(list_reduce(list_transform(
           string_split(concat('10.0.', cast(p_size % 256 as varchar), '.1'), '.'),
           x -> x::BIGINT), (a, b) -> a * 256 + b)) as bigint) AS ipn,
       cast(sum(p_size) as bigint) AS te,
       cast(sum(CASE WHEN p_size % 2 = 0 THEN 3 ELSE 1 END) as bigint) AS jl
FROM (
  SELECT p_partkey, p_name, p_brand, p_type, p_size,
         CASE WHEN p_size > 25 THEN 'H' ELSE 'L' END AS flag,
         date '1995-01-03' + (p_partkey % 500) * INTERVAL 1 DAY AS mk_date,
         cast(date '1995-01-01' as timestamp)
           + (p_partkey % 86399) * INTERVAL 1 SECOND AS ship_ts
  FROM part WHERE p_partkey <= 150
)
GROUP BY flag
ORDER BY flag
"""


# ---------------------------------------------------------------------------
# Dialect battery #7 — funnel/retention aggregates + URL family
# ---------------------------------------------------------------------------

# windowFunnel (latest-chain-start DP fold), retention (fed through
# the ARRAY JOIN clause), the URL family, anyHeavy→mode,
# sumCount/boundingRatio/groupArraySorted. Funnel oracle uses the
# EXISTS-chain formulation — equivalent to the DP because the event
# conditions are disjoint and (user_id, ts) is duplicate-free in the
# synthetic data (both verified).
_DIALECT7_CH_SQL = """
select 'funnel' as tag, toString(lvl) as k, toInt64(count(*)) as n
from (
  select user_id,
         windowFunnel(3600)(ts, event_type = 'view', event_type = 'click',
                            event_type = 'purchase') as lvl
  from events
  group by user_id
)
group by lvl
union all
select 'retention' as tag, concat('slot', toString(i)) as k,
       toInt64(sum(rv)) as n
from (
  select user_id,
         retention(event_type = 'view', event_type = 'click',
                   event_type = 'purchase') as r
  from events
  group by user_id
)
array join r as rv, arrayEnumerate(r) as i
group by i
union all
select 'url' as tag, domainWithoutWWW(u) as k,
       toInt64(sum(toInt32OrZero(extractURLParameter(u, 'q')))) as n
from (
  select concat('https://www.ex', toString(modulo(doc_id, 5)),
                '.com/a/b?q=', toString(modulo(doc_id, 7)),
                multiIf(modulo(doc_id, 2) = 0, '#sec', '')) as u
  from documents
)
group by domainWithoutWWW(u)
union all
select 'cut' as tag, cutQueryString(u) as k, toInt64(count(*)) as n
from (
  select concat('https://ex.com/p', toString(modulo(doc_id, 2)),
                '?q=1', multiIf(modulo(doc_id, 3) = 0, '#frag', '')) as u
  from documents
)
group by cutQueryString(u)
union all
select 'cutf' as tag,
       concat(cutQueryStringAndFragment(u), '|', pathFull(u), '|',
              topLevelDomain(u), '|', cutFragment(u)) as k,
       toInt64(count(*)) as n
from (
  select concat('https://ex.com/p?q=', toString(modulo(doc_id, 2)),
                '#s') as u
  from documents
)
group by 2
union all
select 'mode' as tag, anyHeavy(event_type) as k, toInt64(count(*)) as n
from events
union all
select 'agg' as tag, arrayStringConcat(groupArraySorted(3)(event_type), ',') as k,
       toInt64(tupleElement(sumCount(user_id), 1)
               + tupleElement(sumCount(user_id), 2)
               + toInt64(floor(boundingRatio(event_id, event_id * 3) * 1000))) as n
from events
"""


def calc_dialect7_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-7 dialect surface, value-gated: windowFunnel's
    sorted-fold DP vs DuckDB's EXISTS-chain replay, retention through
    the ARRAY JOIN clause, and the URL-function family."""
    from ora_ch_spark.functions.dialect import translate_ch_sql
    from ora_ch_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(translate_ch_sql(_DIALECT7_CH_SQL)).orderBy("tag", "k")


DIALECT7_ORACLE = """
WITH e AS (
  SELECT user_id, event_id, ts::TIMESTAMP AS ts, event_type FROM events
),
users AS (SELECT DISTINCT user_id FROM e),
lv AS (
  SELECT u.user_id,
    CASE
      WHEN EXISTS (SELECT 1 FROM e a, e b, e c
                   WHERE a.user_id = u.user_id AND b.user_id = u.user_id
                     AND c.user_id = u.user_id
                     AND a.event_type = 'view' AND b.event_type = 'click'
                     AND c.event_type = 'purchase'
                     AND a.ts <= b.ts AND b.ts <= c.ts
                     AND c.ts <= a.ts + INTERVAL 3600 SECOND) THEN 3
      WHEN EXISTS (SELECT 1 FROM e a, e b
                   WHERE a.user_id = u.user_id AND b.user_id = u.user_id
                     AND a.event_type = 'view' AND b.event_type = 'click'
                     AND a.ts <= b.ts
                     AND b.ts <= a.ts + INTERVAL 3600 SECOND) THEN 2
      WHEN EXISTS (SELECT 1 FROM e a WHERE a.user_id = u.user_id
                     AND a.event_type = 'view') THEN 1
      ELSE 0 END AS lvl
  FROM users u
),
ret AS (
  SELECT user_id,
         max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS r1,
         max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c2,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c3
  FROM e GROUP BY user_id
),
urls AS (
  SELECT concat('https://www.ex', cast(doc_id % 5 as varchar),
                '.com/a/b?q=', cast(doc_id % 7 as varchar),
                CASE WHEN doc_id % 2 = 0 THEN '#sec' ELSE '' END) AS u,
         doc_id
  FROM documents
),
cuts AS (
  SELECT concat('https://ex.com/p', cast(doc_id % 2 as varchar), '?q=1',
                CASE WHEN doc_id % 3 = 0 THEN '#frag' ELSE '' END) AS u,
         doc_id
  FROM documents
)
SELECT 'funnel' AS tag, cast(lvl as varchar) AS k,
       cast(count(*) as bigint) AS n
FROM lv GROUP BY lvl
UNION ALL
SELECT 'retention' AS tag, concat('slot', cast(i as varchar)) AS k,
       cast(sum(rv) as bigint) AS n
FROM (
  SELECT unnest([r1, r1 * c2, r1 * c3]) AS rv,
         unnest([1, 2, 3]) AS i
  FROM ret
) GROUP BY i
UNION ALL
SELECT 'url' AS tag,
       concat('ex', cast(doc_id % 5 as varchar), '.com') AS k,
       cast(sum(doc_id % 7) as bigint) AS n
FROM urls GROUP BY 2
UNION ALL
SELECT 'cut' AS tag,
       concat('https://ex.com/p', cast(doc_id % 2 as varchar),
              CASE WHEN doc_id % 3 = 0 THEN '#frag' ELSE '' END) AS k,
       cast(count(*) as bigint) AS n
FROM cuts GROUP BY 2
UNION ALL
SELECT 'cutf' AS tag,
       concat('https://ex.com/p', '|',
              '/p?q=', cast(doc_id % 2 as varchar), '#s|com|',
              'https://ex.com/p?q=', cast(doc_id % 2 as varchar)) AS k,
       cast(count(*) as bigint) AS n
FROM documents GROUP BY 2
UNION ALL
SELECT 'mode' AS tag, mode(event_type) AS k, cast(count(*) as bigint) AS n
FROM e
UNION ALL
SELECT 'agg' AS tag,
       array_to_string((list_sort(list(event_type)))[1:3], ',') AS k,
       cast(sum(user_id) + count(user_id)
            + cast(floor(cast(max(event_id * 3) - min(event_id * 3) as double)
                         / (max(event_id) - min(event_id)) * 1000) as bigint)
            as bigint) AS n
FROM e
"""


# ---------------------------------------------------------------------------
# Dialect battery #8 — QUALIFY clause + CH scalar WITH
# ---------------------------------------------------------------------------

# QUALIFY (window-result filter; Spark lacks the clause → hidden-
# column wrap) + CH's constant-expression WITH (`expr AS ident`,
# inlined at use sites). DuckDB runs QUALIFY natively, so the oracle
# exercises the clause itself with the constants inlined by hand.
_DIALECT8_CH_SQL = """
with 5 as cutoff, 'F' as fstat
select k, toInt64(count(*)) as n, toInt64(sum(ck)) as s
from (
  select o_orderstatus as k, o_custkey as ck,
         row_number() over (partition by o_orderstatus
                            order by o_totalprice desc, o_orderkey) as rnk
  from orders
  where o_orderkey <= 2000
  qualify rnk <= cutoff
)
where k != fstat
group by k
order by k
"""


def calc_dialect8_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUALIFY + scalar WITH, value-gated vs DuckDB's native QUALIFY."""
    from ora_ch_spark.functions.dialect import translate_ch_sql
    from ora_ch_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(translate_ch_sql(_DIALECT8_CH_SQL)).orderBy("k")


DIALECT8_ORACLE = """
SELECT k, cast(count(*) as bigint) AS n, cast(sum(ck) as bigint) AS s
FROM (
  SELECT o_orderstatus AS k, o_custkey AS ck,
         row_number() OVER (PARTITION BY o_orderstatus
                            ORDER BY o_totalprice DESC, o_orderkey) AS rnk
  FROM orders
  WHERE o_orderkey <= 2000
  QUALIFY rnk <= 5
)
WHERE k != 'F'
GROUP BY k
ORDER BY k
"""


# ---------------------------------------------------------------------------
# Batch-8 dialect surface — the silent-drift fixes are the point:
# CH position() has REVERSED arguments vs Spark's position(), and
# dateTrunc / two-arg CAST are CH-only spellings that previously
# passed through (position silently wrong, the others loud errors).
# ---------------------------------------------------------------------------

_DIALECT9_CH_SQL = """
select
  toYear(o_orderdate) as y,
  toInt64(sum(position(o_orderpriority, 'URGENT'))) as s_pos,
  toInt64(sum(toRelativeDayNum(o_orderdate))) as s_rd,
  toInt64(sum(toRelativeMonthNum(o_orderdate))) as s_rm,
  toInt64(count(distinct dateTrunc('month', o_orderdate))) as n_mon,
  toInt64(sum(length(extract(o_orderpriority, '([0-9]+)')))) as s_ex,
  toInt64(sum(length(arrayStringConcat(alphaTokens(o_orderpriority), '')))) as s_at,
  toInt64(sum(length(arrayStringConcat(ngrams(o_orderpriority, 3), '')))) as s_ng,
  toInt64(sum(CAST(o_custkey, 'Int64'))) as s_ck,
  toInt64(sum(if(timestampAdd(o_orderdate, INTERVAL 30 DAY)
                 > toDate('1995-01-01'), 1, 0))) as n_ta
from orders
where o_orderkey <= 4000
group by y
order by y
"""


def calc_dialect9_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-8 function surface, value-gated: CH-argument-order
    position (haystack first — the reversed-args silent drift),
    toRelative*Num epoch ordinals, dateTrunc, CH regex extract with
    capture-group detection, alphaTokens/ngrams, two-arg CAST, and
    timestampAdd interval arithmetic."""
    from ora_ch_spark.functions.dialect import translate_ch_sql
    from ora_ch_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(translate_ch_sql(_DIALECT9_CH_SQL)).orderBy("y")


DIALECT9_ORACLE = """
SELECT cast(year(o_orderdate) as bigint) AS y,
  cast(sum(instr(o_orderpriority, 'URGENT')) as bigint) AS s_pos,
  cast(sum(datediff('day', DATE '1970-01-01', o_orderdate)) as bigint) AS s_rd,
  cast(sum(year(o_orderdate) * 12 + month(o_orderdate)) as bigint) AS s_rm,
  cast(count(distinct date_trunc('month', o_orderdate)) as bigint) AS n_mon,
  cast(sum(length(regexp_extract(o_orderpriority, '([0-9]+)', 1))) as bigint) AS s_ex,
  cast(sum(length(array_to_string(
    list_filter(string_split_regex(o_orderpriority, '[^A-Za-z]+'), x -> x != ''),
    ''))) as bigint) AS s_at,
  cast(sum(3 * greatest(length(o_orderpriority) - 2, 0)) as bigint) AS s_ng,
  cast(sum(o_custkey) as bigint) AS s_ck,
  cast(sum(CASE WHEN o_orderdate + INTERVAL 30 DAY > DATE '1995-01-01'
                THEN 1 ELSE 0 END) as bigint) AS n_ta
FROM orders
WHERE o_orderkey <= 4000
GROUP BY 1
ORDER BY y
"""


# ---------------------------------------------------------------------------
# Batch-9 dialect surface, part 1 — sequence-pattern + interval/ordered
# aggregates. sequenceMatch/Count complete the CH funnel trio
# (windowFunnel and retention shipped in batch 7): the pattern compiles
# to a regex over a per-group time-sorted condition-tag string, with
# LAZY runs so sequenceCount restarts right after a chain completes.
# Doubles are round(_, 4)-stabilized on BOTH sides (libm log2 and
# summation-order ulps must not reach the value hash).
# ---------------------------------------------------------------------------

_DIALECT10_CH_SQL = """
select
  user_id % 16 as ug,
  toInt64(sequenceMatch('(?1)(?2)')(ts, event_type = 'view', event_type = 'click')) as m_vc,
  toInt64(sequenceCount('(?1).*(?2)')(ts, event_type = 'view', event_type = 'purchase')) as c_vp,
  toInt64(maxIntersections(value, value + 10.0)) as mi,
  round(intervalLengthSum(value, value + 5.0), 4) as il,
  round(deltaSumTimestamp(value, ts), 4) as dst,
  round(entropy(event_type), 4) as h,
  toInt64(sum(simpleJSONExtractInt(props, 'k'))) as sk
from events
where event_id <= 20000
group by ug
order by ug
"""


def calc_dialect10_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-9 aggregate surface, value-gated: sequenceMatch/Count
    (CH-docs adjacency + non-overlap semantics), maxIntersections
    sweep, intervalLengthSum union length, deltaSumTimestamp positive
    ordered deltas, entropy, and simpleJSON extraction."""
    from ora_ch_spark.functions.dialect import translate_ch_sql
    from ora_ch_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(translate_ch_sql(_DIALECT10_CH_SQL)).orderBy("ug")


DIALECT10_ORACLE = """
WITH ev AS (
  SELECT user_id % 16 AS ug, ts, event_type, value, props
  FROM events WHERE event_id <= 20000
),
tag AS (
  SELECT ug,
    coalesce(string_agg(
      CASE WHEN event_type IN ('view', 'click') THEN
        '<' || (CASE WHEN event_type = 'view' THEN '1' ELSE '0' END)
            || (CASE WHEN event_type = 'click' THEN '1' ELSE '0' END) || '>'
      END, '' ORDER BY ts,
        (CASE WHEN event_type = 'view' THEN '1' ELSE '0' END)
        || (CASE WHEN event_type = 'click' THEN '1' ELSE '0' END)), '') AS t_vc,
    coalesce(string_agg(
      CASE WHEN event_type IN ('view', 'purchase') THEN
        '<' || (CASE WHEN event_type = 'view' THEN '1' ELSE '0' END)
            || (CASE WHEN event_type = 'purchase' THEN '1' ELSE '0' END) || '>'
      END, '' ORDER BY ts,
        (CASE WHEN event_type = 'view' THEN '1' ELSE '0' END)
        || (CASE WHEN event_type = 'purchase' THEN '1' ELSE '0' END)), '') AS t_vp
  FROM ev GROUP BY ug
),
pts AS (
  SELECT ug, value AS t, 1 AS d FROM ev
  UNION ALL SELECT ug, value + 10.0, -1 FROM ev
),
mi AS (
  SELECT ug, max(run) AS mi FROM (
    SELECT ug, sum(d) OVER (PARTITION BY ug ORDER BY t, d
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
    FROM pts) GROUP BY ug
),
il AS (
  SELECT ug, sum(greatest(0.0, e - greatest(s, coalesce(hi, s)))) AS il
  FROM (
    SELECT ug, value AS s, value + 5.0 AS e,
      max(value + 5.0) OVER (PARTITION BY ug ORDER BY value, value + 5.0
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hi
    FROM ev) GROUP BY ug
),
dst AS (
  SELECT ug, sum(greatest(0.0, value - pv)) AS dst
  FROM (
    SELECT ug, value,
      lag(value) OVER (PARTITION BY ug ORDER BY ts, value) AS pv
    FROM ev) WHERE pv IS NOT NULL GROUP BY ug
),
agg AS (
  SELECT ug, entropy(event_type) AS h,
    sum(cast(json_extract_string(props, '$.k') AS bigint)) AS sk
  FROM ev GROUP BY ug
)
SELECT agg.ug AS ug,
  cast(CASE WHEN regexp_matches(tag.t_vc, '<1[01]><[01]1>') THEN 1 ELSE 0 END as bigint) AS m_vc,
  cast(len(regexp_extract_all(tag.t_vp, '<1[01]>(?:<[01][01]>)*?<[01]1>')) as bigint) AS c_vp,
  cast(mi.mi as bigint) AS mi,
  round(il.il, 4) AS il,
  round(coalesce(dst.dst, 0.0), 4) AS dst,
  round(agg.h, 4) AS h,
  cast(agg.sk as bigint) AS sk
FROM agg JOIN tag USING (ug) JOIN mi USING (ug) JOIN il USING (ug)
  LEFT JOIN dst USING (ug)
ORDER BY ug
"""


# ---------------------------------------------------------------------------
# Batch-9 dialect surface, part 2 — bitmap algebra (sorted-distinct
# arrays; cardinalities are bigint like CH UInt64), *Map aggregates
# (pinned col1/col2 tuple), readable formatting (fixed %.2f, no
# thousands separators), capture-group extraction, and the snowflake
# epoch round-trip.
# ---------------------------------------------------------------------------

_DIALECT11_CH_SQL = """
select
  toYear(o_orderdate) as y,
  toInt64(bitmapCardinality(bitmapBuild(groupArray(o_custkey % 100)))) as bc,
  toInt64(bitmapAndCardinality(
    bitmapBuild(groupArray(if(o_orderpriority = '1-URGENT', o_custkey % 50, null))),
    bitmapBuild(groupArray(if(o_orderpriority = '5-LOW', o_custkey % 50, null))))) as inter,
  arrayStringConcat(arrayMap(x -> toString(x),
    tupleElement(sumMap([o_orderstatus], [1]), 1)), ',') as mk,
  arrayStringConcat(arrayMap(x -> toString(x),
    tupleElement(sumMap([o_orderstatus], [1]), 2)), ',') as mv,
  formatReadableSize(toInt64(sum(o_totalprice))) as frs,
  formatReadableQuantity(toInt64(sum(o_totalprice))) as frq,
  min(arrayStringConcat(extractGroups(o_orderpriority, '([0-9])-([A-Z]+)'), ':')) as eg,
  toInt64(toYYYYMMDD(snowflakeToDateTime(max(dateTimeToSnowflake(toDateTime(o_orderdate)))))) as snow
from orders
where o_orderkey <= 8000
group by y
order by y
"""


def calc_dialect11_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-9 bitmap/map/scalar surface, value-gated: bitmap algebra
    over sorted-distinct arrays, sumMap tuple output, readable size/
    quantity formatting, extractGroups, snowflake ID round-trip."""
    from ora_ch_spark.functions.dialect import translate_ch_sql
    from ora_ch_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(translate_ch_sql(_DIALECT11_CH_SQL)).orderBy("y")


DIALECT11_ORACLE = """
WITH o AS (SELECT * FROM orders WHERE o_orderkey <= 8000),
sm AS (
  SELECT y, string_agg(k, ',' ORDER BY k) AS mk,
         string_agg(cast(c as varchar), ',' ORDER BY k) AS mv
  FROM (SELECT year(o_orderdate) AS y, o_orderstatus AS k,
               cast(count(*) as bigint) AS c
        FROM o GROUP BY 1, 2) GROUP BY y
)
SELECT cast(year(o_orderdate) as bigint) AS y,
  cast(count(DISTINCT o_custkey % 100) as bigint) AS bc,
  cast(len(list_intersect(
    list_distinct(list(o_custkey % 50) FILTER (o_orderpriority = '1-URGENT')),
    list_distinct(list(o_custkey % 50) FILTER (o_orderpriority = '5-LOW'))))
    as bigint) AS inter,
  any_value(sm.mk) AS mk,
  any_value(sm.mv) AS mv,
  CASE
    WHEN abs(cast(cast(sum(o_totalprice) as bigint) as double)) < 1024.0
      THEN printf('%.2f', cast(cast(sum(o_totalprice) as bigint) as double)) || ' B'
    WHEN abs(cast(cast(sum(o_totalprice) as bigint) as double)) < 1048576.0
      THEN printf('%.2f', cast(cast(sum(o_totalprice) as bigint) as double) / 1024.0) || ' KiB'
    WHEN abs(cast(cast(sum(o_totalprice) as bigint) as double)) < 1073741824.0
      THEN printf('%.2f', cast(cast(sum(o_totalprice) as bigint) as double) / 1048576.0) || ' MiB'
    ELSE printf('%.2f', cast(cast(sum(o_totalprice) as bigint) as double) / 1073741824.0) || ' GiB'
  END AS frs,
  CASE
    WHEN abs(cast(cast(sum(o_totalprice) as bigint) as double)) < 1000.0
      THEN printf('%.2f', cast(cast(sum(o_totalprice) as bigint) as double))
    WHEN abs(cast(cast(sum(o_totalprice) as bigint) as double)) < 1000000.0
      THEN printf('%.2f', cast(cast(sum(o_totalprice) as bigint) as double) / 1000.0) || ' thousand'
    WHEN abs(cast(cast(sum(o_totalprice) as bigint) as double)) < 1000000000.0
      THEN printf('%.2f', cast(cast(sum(o_totalprice) as bigint) as double) / 1000000.0) || ' million'
    ELSE printf('%.2f', cast(cast(sum(o_totalprice) as bigint) as double) / 1000000000.0) || ' billion'
  END AS frq,
  min(regexp_extract(o_orderpriority, '([0-9])-([A-Z]+)', 1) || ':'
      || regexp_extract(o_orderpriority, '([0-9])-([A-Z]+)', 2)) AS eg,
  cast(strftime(epoch_ms(
    (max((epoch_ms(cast(o_orderdate as timestamp)) - 1288834974657) * 4194304)
     // 4194304) + 1288834974657), '%Y%m%d') as bigint) AS snow
FROM o JOIN sm ON sm.y = year(o_orderdate)
GROUP BY year(o_orderdate)
ORDER BY y
"""


# ---------------------------------------------------------------------------
# Batch-10 dialect surface — higher-order array completion (arrayFold/
# Product/JaccardIndex), exact weighted top-k, pointInPolygon ray-cast
# closed form, string similarity (char-set Jaccard vs DuckDB's native
# jaccard(); positional Hamming vs hamming()), URL netloc/fragment,
# parseReadableSize round-trip, toDecimalString, ISO toWeek.
# ---------------------------------------------------------------------------

_DIALECT12_CH_SQL = """
select
  toYear(o_orderdate) as y,
  toInt64(arrayFold((acc, x) -> acc + x, groupArray(o_custkey % 10), toInt64(0))) as af,
  round(sum(arrayProduct([toFloat64(1 + o_orderkey % 3), 2.0])), 4) as ap,
  round(sum(arrayJaccardIndex([o_custkey % 5, o_custkey % 7], [o_custkey % 5, o_custkey % 11])), 4) as aj,
  toInt64(sum(toWeek(o_orderdate, 3))) as wk,
  arrayStringConcat(topKWeighted(2)(o_orderstatus, o_totalprice), ',') as tk,
  round(sumKahan(o_totalprice), 2) as sk,
  toInt64(sum(pointInPolygon((toFloat64(o_custkey % 10 * 10 + 5) / 100, toFloat64(o_orderkey % 10 * 10 + 5) / 100), [(0., 0.), (1., 0.), (0.5, 1.)]))) as pip,
  min(netloc(concat('https://u', toString(o_custkey), '.com:88/p'))) as nl,
  min(fragment(concat('http://a.com/p#f', toString(o_custkey % 7)))) as fr,
  toInt64(sum(parseReadableSize(concat(toString(o_custkey % 100), ' KiB')))) as prs,
  min(toDecimalString(o_totalprice, 2)) as tds,
  toInt64(sum(byteHammingDistance(substring(o_orderpriority, 1, 3), substring(reverse(o_orderpriority), 1, 3)))) as bh,
  round(sum(stringJaccardIndex(o_orderpriority, o_orderstatus)), 4) as sj
from orders
where o_orderkey <= 6000
group by y
order by y
"""


def calc_dialect12_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-10 function surface, value-gated: arrayFold/Product/
    Jaccard higher-order forms, exact topKWeighted, pointInPolygon
    even-odd ray cast (closed form, matched against an independent
    half-plane oracle), char-set string Jaccard vs DuckDB's native
    jaccard(), positional Hamming, URL netloc/fragment extraction,
    parseReadableSize, toDecimalString, ISO-mode toWeek."""
    from ora_ch_spark.functions.dialect import translate_ch_sql
    from ora_ch_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(translate_ch_sql(_DIALECT12_CH_SQL)).orderBy("y")


DIALECT12_ORACLE = """
WITH o AS (SELECT * FROM orders WHERE o_orderkey <= 6000),
tk AS (
  SELECT y, string_agg(k, ',' ORDER BY sw DESC, k) AS tk FROM (
    SELECT year(o_orderdate) AS y, o_orderstatus AS k,
           sum(o_totalprice) AS sw,
           row_number() OVER (PARTITION BY year(o_orderdate)
                              ORDER BY sum(o_totalprice) DESC, o_orderstatus) AS rn
    FROM o GROUP BY 1, 2) WHERE rn <= 2 GROUP BY y
)
SELECT cast(year(o_orderdate) as bigint) AS y,
  cast(sum(o_custkey % 10) as bigint) AS af,
  round(sum((1 + o_orderkey % 3) * 2.0), 4) AS ap,
  round(sum(
    cast(len(list_intersect(list_distinct([o_custkey % 5, o_custkey % 7]),
                            list_distinct([o_custkey % 5, o_custkey % 11]))) as double)
    / len(list_distinct(list_cat([o_custkey % 5, o_custkey % 7],
                                 [o_custkey % 5, o_custkey % 11])))), 4) AS aj,
  cast(sum(weekofyear(o_orderdate)) as bigint) AS wk,
  any_value(tk.tk) AS tk,
  round(sum(o_totalprice), 2) AS sk,
  cast(sum(CASE WHEN (cast(o_orderkey % 10 * 10 + 5 as double) / 100) > 0
                 AND (cast(o_orderkey % 10 * 10 + 5 as double) / 100)
                     < 2 * (cast(o_custkey % 10 * 10 + 5 as double) / 100)
                 AND (cast(o_orderkey % 10 * 10 + 5 as double) / 100)
                     < 2 * (1 - (cast(o_custkey % 10 * 10 + 5 as double) / 100))
            THEN 1 ELSE 0 END) as bigint) AS pip,
  min('u' || cast(o_custkey as varchar) || '.com:88') AS nl,
  min('f' || cast(o_custkey % 7 as varchar)) AS fr,
  cast(sum((o_custkey % 100) * 1024) as bigint) AS prs,
  min(printf('%.2f', o_totalprice)) AS tds,
  cast(sum(hamming(substr(o_orderpriority, 1, 3), substr(reverse(o_orderpriority), 1, 3))) as bigint) AS bh,
  round(sum(jaccard(o_orderpriority, o_orderstatus)), 4) AS sj
FROM o JOIN tk ON tk.y = year(o_orderdate)
GROUP BY year(o_orderdate)
ORDER BY y
"""


# ---------------------------------------------------------------------------
# Clause pass-through proof — CH spellings Spark accepts NATIVELY and
# must keep accepting through the translator: GROUP BY … WITH ROLLUP /
# WITH CUBE, INTERSECT / EXCEPT, UNION DISTINCT. These deliberately
# take the no-rewrite path; the gate proves the translator neither
# mangles them nor needs to.
# ---------------------------------------------------------------------------

_DIALECT13_CH_SQL = """
select
  coalesce(toString(toYear(o_orderdate)), '#all') as y,
  coalesce(o_orderstatus, '#all') as st,
  toInt64(count(*)) as c,
  toInt64(sum(o_custkey % 97)) as s
from orders
where o_orderkey <= 4000
group by toString(toYear(o_orderdate)), o_orderstatus with rollup

union distinct

select 'X' as y, v as st, toInt64(n) as c, toInt64(n) as s from (
  select o_orderpriority as v, count(*) as n from orders
  where o_orderkey <= 4000 group by o_orderpriority
  intersect
  select o_orderpriority as v, count(*) as n from orders
  where o_orderkey <= 4000 and o_orderkey % 2 = 0 group by o_orderpriority
)

order by y, st, c
"""


def calc_dialect13_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clause handling, value-gated: WITH ROLLUP subtotal rows and
    UNION DISTINCT dedup pass through to Spark natively; bare
    INTERSECT takes the r11 hash-set-filter rewrite (values coincide
    here — grouped branches are duplicate-free; calc_set_ops_dup
    gates the duplicate-bearing arithmetic). CH WITH TOTALS, by
    contrast, is rewritten to GROUPING SETS."""
    from ora_ch_spark.functions.dialect import translate_ch_sql
    from ora_ch_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(translate_ch_sql(_DIALECT13_CH_SQL)).orderBy(
        "y", "st", "c"
    )


DIALECT13_ORACLE = """
SELECT * FROM (
  SELECT
    coalesce(cast(year(o_orderdate) as varchar), '#all') AS y,
    coalesce(o_orderstatus, '#all') AS st,
    cast(count(*) as bigint) AS c,
    cast(sum(o_custkey % 97) as bigint) AS s
  FROM orders
  WHERE o_orderkey <= 4000
  GROUP BY ROLLUP (cast(year(o_orderdate) as varchar), o_orderstatus)

  UNION

  SELECT 'X' AS y, v AS st, cast(n as bigint) AS c, cast(n as bigint) AS s
  FROM (
    SELECT o_orderpriority AS v, count(*) AS n FROM orders
    WHERE o_orderkey <= 4000 GROUP BY o_orderpriority
    INTERSECT
    SELECT o_orderpriority AS v, count(*) AS n FROM orders
    WHERE o_orderkey <= 4000 AND o_orderkey % 2 = 0 GROUP BY o_orderpriority
  )
)
ORDER BY y, st, c
"""


# ---------------------------------------------------------------------------
# dictGet/dictHas SQL forms via the dictionary registry
# ---------------------------------------------------------------------------

_DICT_CH_SQL = """
select dictGetOrDefault('nation', 'n_name', modulo(c_custkey, 30), 'NONE') as n,
       toInt64(sum(if(dictHas('nation', modulo(c_custkey, 30)), 1, 0))) as n_hit,
       toInt64(count(*)) as cnt
from customer
where c_custkey <= 2000
group by n
order by n
"""


def calc_dict_lookup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH dictionary functions in SQL: the registry supplies the key
    attribute (CH declares it in dictionary DDL the translator never
    sees), dictGet becomes a correlated scalar subquery Catalyst
    de-correlates into a join, dictHas a scalar-COUNT probe. Keys 25+
    miss (25 nations) and fall to the default — the miss path is part
    of the gate."""
    from ora_ch_spark.functions.dialect import register_dictionary, translate_ch_sql
    from ora_ch_spark.io import register_views

    register_views(spark, sf_dir)
    register_dictionary("nation", "n_nationkey")
    return spark.sql(translate_ch_sql(_DICT_CH_SQL)).orderBy("n")


DICT_LOOKUP_ORACLE = """
SELECT coalesce(nt.n_name, 'NONE') AS n,
       cast(sum(CASE WHEN nt.n_nationkey IS NOT NULL THEN 1 ELSE 0 END)
            as bigint) AS n_hit,
       cast(count(*) as bigint) AS cnt
FROM (SELECT c_custkey % 30 AS k FROM customer WHERE c_custkey <= 2000) c
LEFT JOIN nation nt ON nt.n_nationkey = c.k
GROUP BY coalesce(nt.n_name, 'NONE')
ORDER BY n
"""


# ---------------------------------------------------------------------------
# Geo mini-battery — geohashEncode closed-form bits (value-gated)
# ---------------------------------------------------------------------------

# geohashEncode's rewrite expands each interleaved bit in CLOSED FORM
# (floor of a plain double product — engine-identical, unlike a trig
# haversine which is deliberately NOT hash-gated). Coordinates derive
# exactly from integers.
_GEO_CH_SQL = """
select gh, toInt64(count(*)) as n,
       tupleElement(geohashDecode(gh), 1) as clon,
       tupleElement(geohashDecode(gh), 2) as clat,
       toInt64(if(geohashEncode(tupleElement(geohashDecode(gh), 1),
                                tupleElement(geohashDecode(gh), 2),
                                6) = gh, 1, 0)) as rt
from (
  select geohashEncode(modulo(p_partkey, 360) - 180 + p_size / 100.0,
                       modulo(p_partkey, 180) - 90 + p_size / 200.0,
                       6) as gh
  from part
  where p_partkey <= 400
)
group by gh
order by gh
"""


def calc_dialect_geo_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ora_ch_spark.functions.dialect import translate_ch_sql
    from ora_ch_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(translate_ch_sql(_GEO_CH_SQL)).orderBy("gh")


DIALECT_GEO_ORACLE = """
WITH enc AS (
  SELECT array_to_string(list_transform(range(6), c ->
    substring('0123456789bcdefghjkmnpqrstuvwxyz',
      cast(list_sum(list_transform(range(5), b ->
        (CASE WHEN (5 * c + b) % 2 = 0 THEN
          cast(floor((lon + 180.0) * power(2.0, cast((5 * c + b) // 2 + 1 as double)) / 360.0) as bigint) % 2
         ELSE
          cast(floor((lat + 90.0) * power(2.0, cast((5 * c + b) // 2 + 1 as double)) / 180.0) as bigint) % 2
         END) * (1 << (4 - b))
      )) as int) + 1, 1)), '') AS gh
  FROM (
    SELECT p_partkey % 360 - 180 + p_size / 100.0 AS lon,
           p_partkey % 180 - 90 + p_size / 200.0 AS lat
    FROM part WHERE p_partkey <= 400
  )
),
g AS (SELECT gh, cast(count(*) as bigint) AS n FROM enc GROUP BY gh),
-- decode replay: de-interleave the 30 bits of the 6-char geohash
-- (even global positions -> lon, odd -> lat), fold each to an
-- integer, cell center = lo + span * (v + 0.5) / 2^15
decv AS (
  SELECT gh,
    sum(CASE WHEN j % 2 = 0 THEN
      ((((strpos('0123456789bcdefghjkmnpqrstuvwxyz', gh[(j // 5) + 1]) - 1)
         // (1 << (4 - (j % 5)))) % 2)::BIGINT << (14 - j // 2))
      ELSE 0 END) AS lonv,
    sum(CASE WHEN j % 2 = 1 THEN
      ((((strpos('0123456789bcdefghjkmnpqrstuvwxyz', gh[(j // 5) + 1]) - 1)
         // (1 << (4 - (j % 5)))) % 2)::BIGINT << (14 - (j - 1) // 2))
      ELSE 0 END) AS latv
  FROM g CROSS JOIN generate_series(0, 29) t(j)
  GROUP BY gh
)
SELECT g.gh, g.n,
  -180.0 + 360.0 * (lonv + 0.5) / power(2.0, 15.0) AS clon,
  -90.0 + 180.0 * (latv + 0.5) / power(2.0, 15.0) AS clat,
  1::BIGINT AS rt
FROM g JOIN decv USING (gh)
ORDER BY gh
"""


# ---------------------------------------------------------------------------
# ASOF JOIN SQL syntax (r6 verdict item 2)
# ---------------------------------------------------------------------------

# CH ASOF LEFT JOIN clause text: rights pre-deduplicated per
# (user_id, ts) in the subquery (every engine's ASOF precondition);
# the inequality is the backward-inclusive form.
_ASOF_SQL_CH = """
select e.event_id as event_id, e.user_id as user_id,
       p.p_id as purchase_id,
       toInt64(toUnixTimestamp64Micro(e.ts) - toUnixTimestamp64Micro(p.ts)) as gap_us
from events as e
asof left join (
  select user_id, ts, max(event_id) as p_id
  from events
  where event_type = 'purchase'
  group by user_id, ts
) as p
on e.user_id = p.user_id and e.ts >= p.ts
"""


def calc_asof_sql_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASOF JOIN **clause syntax** (vs the composed operator entries
    above): the CH text runs through ``translate_ch_sql``'s
    ``_rewrite_asof_join`` (adjacent-ts window + interval-bounded
    equi-join) and must hash-match DuckDB's NATIVE ASOF LEFT JOIN on
    the very same shape — the clause parser is what round 6 flagged
    missing; the semantics were already gated."""
    from ora_ch_spark.functions.dialect import translate_ch_sql
    from ora_ch_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(translate_ch_sql(_ASOF_SQL_CH))


ASOF_SQL_ORACLE = """
WITH e AS (
  SELECT event_id, user_id, ts::TIMESTAMP AS ts, event_type FROM events
),
p AS (
  SELECT user_id, ts, max(event_id) AS p_id
  FROM e WHERE event_type = 'purchase' GROUP BY user_id, ts
)
SELECT e.event_id AS event_id, e.user_id AS user_id,
       p.p_id AS purchase_id,
       cast(epoch_us(e.ts) - epoch_us(p.ts) as bigint) AS gap_us
FROM e ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.ts >= p.ts
"""


_FUNNEL_STRICT_CH_SQL = """
select 'so' as tag, toString(lvl) as k, toInt64(count(*)) as n from (
  select user_id,
         windowFunnel(3600, 'strict_order')(ts, event_type = 'view',
             event_type = 'click', event_type = 'purchase') as lvl
  from events group by user_id) group by lvl
union all
select 'sd' as tag, toString(lvl) as k, toInt64(count(*)) as n from (
  select user_id,
         windowFunnel(3600, 'strict_dedup')(ts, event_type = 'view',
             event_type = 'click', event_type = 'purchase') as lvl
  from events group by user_id) group by lvl
"""


def calc_funnel_strict_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """windowFunnel strict_order / strict_dedup through
    ``translate_ch_sql`` — the CH event-loop fold (per-condition
    event expansion, level-0 breakers, early-exit accumulator) gated
    against a DuckDB recursive-CTE replay of the same loop."""
    from ora_ch_spark.functions.dialect import translate_ch_sql
    from ora_ch_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(translate_ch_sql(_FUNNEL_STRICT_CH_SQL)).orderBy(
        "tag", "k"
    )


# The replay mirrors AggregateFunctionWindowFunnel.h's getEventLevel:
# ev_* hold one (rn, lvl, t) event per matched condition (plus lvl-0
# breakers for strict_order), sorted (t, lvl); sim_* step the state
# one event per recursion level. Only FIRST chain timestamps (f1..f3)
# are carried — strict_increase is off, so last-timestamps are dead
# state. `done` freezes the machine exactly where CH early-returns.
FUNNEL_STRICT_ORACLE = """
WITH RECURSIVE base AS (
  SELECT user_id, epoch_us(ts::TIMESTAMP) AS t,
         CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
              WHEN 'purchase' THEN 3 ELSE 0 END AS lvl
  FROM events
),
ev_so AS (
  SELECT user_id, t, lvl,
         row_number() OVER (PARTITION BY user_id ORDER BY t, lvl) AS rn
  FROM base
),
ev_sd AS (
  SELECT user_id, t, lvl,
         row_number() OVER (PARTITION BY user_id ORDER BY t, lvl) AS rn
  FROM base WHERE lvl > 0
),
sim_so AS (
  SELECT user_id, 0 AS rn, NULL::INT AS done, false AS fe,
         NULL::BIGINT AS f1, NULL::BIGINT AS f2, NULL::BIGINT AS f3
  FROM (SELECT DISTINCT user_id FROM ev_so)
  UNION ALL
  SELECT s.user_id, s.rn + 1,
    CASE WHEN s.done IS NOT NULL THEN s.done
         WHEN e.lvl = 0 THEN CASE WHEN s.fe THEN
              (s.f1 IS NOT NULL)::INT + (s.f2 IS NOT NULL)::INT
              + (s.f3 IS NOT NULL)::INT END
         WHEN e.lvl = 1 THEN NULL
         WHEN s.fe AND (CASE e.lvl WHEN 2 THEN s.f1 ELSE s.f2 END)
              IS NULL THEN
              (s.f1 IS NOT NULL)::INT + (s.f2 IS NOT NULL)::INT
              + (s.f3 IS NOT NULL)::INT
         WHEN e.lvl = 3 AND s.f2 IS NOT NULL
              AND e.t <= s.f2 + 3600000000 THEN 3
         END,
    s.fe OR e.lvl = 1,
    CASE WHEN s.done IS NULL AND e.lvl = 1 THEN e.t ELSE s.f1 END,
    CASE WHEN s.done IS NULL AND e.lvl = 2 AND s.f1 IS NOT NULL
         AND e.t <= s.f1 + 3600000000
         AND NOT (s.fe AND s.f1 IS NULL) THEN s.f1 ELSE s.f2 END,
    CASE WHEN s.done IS NULL AND e.lvl = 3 AND s.f2 IS NOT NULL
         AND e.t <= s.f2 + 3600000000 THEN s.f2 ELSE s.f3 END
  FROM sim_so s JOIN ev_so e
    ON e.user_id = s.user_id AND e.rn = s.rn + 1
),
sim_sd AS (
  SELECT user_id, 0 AS rn, NULL::INT AS done,
         NULL::BIGINT AS f1, NULL::BIGINT AS f2, NULL::BIGINT AS f3
  FROM (SELECT DISTINCT user_id FROM base)
  UNION ALL
  SELECT s.user_id, s.rn + 1,
    CASE WHEN s.done IS NOT NULL THEN s.done
         WHEN e.lvl = 1 THEN NULL
         WHEN (CASE e.lvl WHEN 2 THEN s.f2 ELSE s.f3 END)
              IS NOT NULL THEN e.lvl
         WHEN e.lvl = 3 AND s.f2 IS NOT NULL
              AND e.t <= s.f2 + 3600000000 THEN 3
         END,
    CASE WHEN s.done IS NULL AND e.lvl = 1 THEN e.t ELSE s.f1 END,
    CASE WHEN s.done IS NULL AND e.lvl = 2 AND s.f1 IS NOT NULL
         AND e.t <= s.f1 + 3600000000 AND s.f2 IS NULL
         THEN s.f1 ELSE s.f2 END,
    CASE WHEN s.done IS NULL AND e.lvl = 3 AND s.f2 IS NOT NULL
         AND e.t <= s.f2 + 3600000000 AND s.f3 IS NULL
         THEN s.f2 ELSE s.f3 END
  FROM sim_sd s JOIN ev_sd e
    ON e.user_id = s.user_id AND e.rn = s.rn + 1
),
fin_so AS (
  SELECT user_id, coalesce(done,
         (f1 IS NOT NULL)::INT + (f2 IS NOT NULL)::INT
         + (f3 IS NOT NULL)::INT) AS lvl
  FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                  ORDER BY rn DESC) AS rr FROM sim_so) WHERE rr = 1
),
fin_sd AS (
  SELECT u.user_id, coalesce(l.lvl, 0) AS lvl
  FROM (SELECT DISTINCT user_id FROM base) u
  LEFT JOIN (SELECT user_id, coalesce(done,
         (f1 IS NOT NULL)::INT + (f2 IS NOT NULL)::INT
         + (f3 IS NOT NULL)::INT) AS lvl
      FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                  ORDER BY rn DESC) AS rr FROM sim_sd) WHERE rr = 1
  ) l USING (user_id)
)
SELECT 'so' AS tag, cast(lvl as varchar) AS k,
       cast(count(*) as bigint) AS n FROM fin_so GROUP BY lvl
UNION ALL
SELECT 'sd' AS tag, cast(lvl as varchar) AS k,
       cast(count(*) as bigint) AS n FROM fin_sd GROUP BY lvl
ORDER BY tag, k
"""


_SEQ_TIME_CH_SQL = """
select 'm_gt25d' as tag, toInt64(sum(m)) as n from (
  select user_id, sequenceMatch('(?1)(?t>2160000)(?2)')(ts,
      event_type = 'view', event_type = 'click') as m
  from events group by user_id)
union all
select 'm_lt2h' as tag, toInt64(sum(m)) as n from (
  select user_id, sequenceMatch('(?1)(?t<7200)(?2)')(ts,
      event_type = 'view', event_type = 'click') as m
  from events group by user_id)
union all
select 'c_le1800' as tag, toInt64(sum(c)) as n from (
  select user_id, sequenceCount('(?1)(?t<=1800)(?2)')(ts,
      event_type = 'view', event_type = 'purchase') as c
  from events group by user_id)
union all
select 'c_chain' as tag, toInt64(sum(c)) as n from (
  select user_id, sequenceCount('(?1)(?t>60)(?t<=3600)(?2)')(ts,
      event_type = 'click', event_type = 'purchase') as c
  from events group by user_id)
"""


_SEQ_TIME2_CH_SQL = """
select 'c_mixed' as tag, toInt64(sum(c)) as n from (
  select user_id, sequenceCount('(?1).(?t<=1800)(?2)')(ts,
      event_type = 'view', event_type = 'purchase') as c
  from events group by user_id)
union all
select 'm_mixed' as tag, toInt64(sum(m)) as n from (
  select user_id, sequenceMatch('(?1).(?t>60)(?t<=7200)(?2)')(ts,
      event_type = 'click', event_type = 'purchase') as m
  from events group by user_id)
"""


def calc_seq_time2_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sequenceMatch/Count with a ``.`` MIXED into a ``(?t op v)``
    gap (VERDICT r8 missing #2): ``(?1).(?t<=1800)(?2)`` = anchor 1,
    exactly one filtered event (the dot), then anchor 2 any number of
    events later with the bound measured from the DOT's event — CH's
    matcher keeps ``base_it`` at the last consumed event
    (AggregateFunctionsSequenceMatch.h), so after a ``.`` the
    constraint anchors there, not at condition 1. The DP candidates
    carry the anchor's next-event timestamp (``nt``) for this. Gated
    against an independent DuckDB recursive-CTE replay of the same
    machine."""
    from ora_ch_spark.functions.dialect import translate_ch_sql
    from ora_ch_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(translate_ch_sql(_SEQ_TIME2_CH_SQL)).orderBy("tag")


# greedy non-overlapping replay with the dot state: s1d = dot-event
# timestamps (one appended each time the PREVIOUS event was an
# anchor-1 match — pa flag), completion when a level-2 event sits
# within the bound of any accumulated dot time (checked BEFORE this
# event's own dot append, so the dot and the completer are distinct
# events); a completed chain resets the whole state (CH restarts
# after each matched chain).
SEQ_TIME2_ORACLE = """
WITH RECURSIVE u AS (SELECT DISTINCT user_id FROM events),
e AS (SELECT user_id, epoch_us(ts::TIMESTAMP) AS t, event_type
      FROM events),
ev1 AS (
  SELECT user_id, t,
         CASE event_type WHEN 'view' THEN 1 ELSE 2 END AS lvl,
         row_number() OVER (PARTITION BY user_id ORDER BY t) AS rn
  FROM e WHERE event_type IN ('view', 'purchase')
),
sim1 AS (
  SELECT user_id, 0 AS rn, 0 AS cnt, []::BIGINT[] AS s1d, false AS pa
  FROM u
  UNION ALL
  SELECT s.user_id, s.rn + 1,
    s.cnt + (e.lvl = 2 AND len(list_filter(s.s1d,
        x -> e.t - x <= 1800000000)) > 0)::INT,
    CASE WHEN e.lvl = 2 AND len(list_filter(s.s1d,
             x -> e.t - x <= 1800000000)) > 0 THEN []::BIGINT[]
         WHEN s.pa THEN list_append(s.s1d, e.t)
         ELSE s.s1d END,
    CASE WHEN e.lvl = 2 AND len(list_filter(s.s1d,
             x -> e.t - x <= 1800000000)) > 0 THEN false
         ELSE e.lvl = 1 END
  FROM sim1 s JOIN ev1 e ON e.user_id = s.user_id AND e.rn = s.rn + 1
),
ev2 AS (
  SELECT user_id, t,
         CASE event_type WHEN 'click' THEN 1 ELSE 2 END AS lvl,
         row_number() OVER (PARTITION BY user_id ORDER BY t) AS rn
  FROM e WHERE event_type IN ('click', 'purchase')
),
sim2 AS (
  SELECT user_id, 0 AS rn, 0 AS cnt, []::BIGINT[] AS s1d, false AS pa
  FROM u
  UNION ALL
  SELECT s.user_id, s.rn + 1,
    s.cnt + (e.lvl = 2 AND len(list_filter(s.s1d,
        x -> e.t - x > 60000000 AND e.t - x <= 7200000000)) > 0)::INT,
    CASE WHEN e.lvl = 2 AND len(list_filter(s.s1d,
             x -> e.t - x > 60000000 AND e.t - x <= 7200000000)) > 0
         THEN []::BIGINT[]
         WHEN s.pa THEN list_append(s.s1d, e.t)
         ELSE s.s1d END,
    CASE WHEN e.lvl = 2 AND len(list_filter(s.s1d,
             x -> e.t - x > 60000000 AND e.t - x <= 7200000000)) > 0
         THEN false
         ELSE e.lvl = 1 END
  FROM sim2 s JOIN ev2 e ON e.user_id = s.user_id AND e.rn = s.rn + 1
),
last1 AS (
  SELECT user_id, cnt FROM (SELECT *, row_number() OVER (
      PARTITION BY user_id ORDER BY rn DESC) AS rr FROM sim1)
  WHERE rr = 1
),
last2 AS (
  SELECT user_id, cnt FROM (SELECT *, row_number() OVER (
      PARTITION BY user_id ORDER BY rn DESC) AS rr FROM sim2)
  WHERE rr = 1
)
SELECT 'c_mixed' AS tag, cast(sum(cnt) as bigint) AS n FROM last1
UNION ALL
SELECT 'm_mixed' AS tag, cast(sum((cnt > 0)::INT) as bigint) AS n
FROM last2
ORDER BY tag
"""


def calc_seq_time_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sequenceMatch/sequenceCount with ``(?t op v)`` time
    constraints through ``translate_ch_sql`` — the candidate-set DP
    fold gated against independent DuckDB formulations (EXISTS pair
    search for match; greedy non-overlapping recursive replay for
    count, including a chained two-constraint gap)."""
    from ora_ch_spark.functions.dialect import translate_ch_sql
    from ora_ch_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(translate_ch_sql(_SEQ_TIME_CH_SQL)).orderBy("tag")


# m_*: a (?t…) gap admits ANY events between the anchors (CH docs),
# so match == EXISTS a pair with the time bound; ties sort (t, lvl)
# with the level-1 anchor first, so `b.t >= a.t` is exactly the
# sorted-order constraint. c_*: greedy scan — candidate level-1
# timestamps accumulate until a level-2 event satisfies the bound
# against ANY of them, which counts a chain and clears the set (CH
# restarts after each matched chain).
SEQ_TIME_ORACLE = """
WITH RECURSIVE u AS (SELECT DISTINCT user_id FROM events),
e AS (SELECT user_id, epoch_us(ts::TIMESTAMP) AS t, event_type
      FROM events),
ev1 AS (
  SELECT user_id, t,
         CASE event_type WHEN 'view' THEN 1 ELSE 2 END AS lvl,
         row_number() OVER (PARTITION BY user_id ORDER BY t,
             CASE event_type WHEN 'view' THEN 1 ELSE 2 END) AS rn
  FROM e WHERE event_type IN ('view', 'purchase')
),
sim1 AS (
  SELECT user_id, 0 AS rn, 0 AS cnt, []::BIGINT[] AS s1 FROM u
  UNION ALL
  SELECT s.user_id, s.rn + 1,
    s.cnt + (e.lvl = 2 AND len(list_filter(s.s1,
        x -> e.t - x <= 1800000000)) > 0)::INT,
    CASE WHEN e.lvl = 2 AND len(list_filter(s.s1,
             x -> e.t - x <= 1800000000)) > 0 THEN []::BIGINT[]
         WHEN e.lvl = 1 THEN list_append(s.s1, e.t)
         ELSE s.s1 END
  FROM sim1 s JOIN ev1 e ON e.user_id = s.user_id AND e.rn = s.rn + 1
),
ev2 AS (
  SELECT user_id, t,
         CASE event_type WHEN 'click' THEN 1 ELSE 2 END AS lvl,
         row_number() OVER (PARTITION BY user_id ORDER BY t,
             CASE event_type WHEN 'click' THEN 1 ELSE 2 END) AS rn
  FROM e WHERE event_type IN ('click', 'purchase')
),
sim2 AS (
  SELECT user_id, 0 AS rn, 0 AS cnt, []::BIGINT[] AS s1 FROM u
  UNION ALL
  SELECT s.user_id, s.rn + 1,
    s.cnt + (e.lvl = 2 AND len(list_filter(s.s1,
        x -> e.t - x > 60000000 AND e.t - x <= 3600000000)) > 0)::INT,
    CASE WHEN e.lvl = 2 AND len(list_filter(s.s1,
             x -> e.t - x > 60000000 AND e.t - x <= 3600000000)) > 0
         THEN []::BIGINT[]
         WHEN e.lvl = 1 THEN list_append(s.s1, e.t)
         ELSE s.s1 END
  FROM sim2 s JOIN ev2 e ON e.user_id = s.user_id AND e.rn = s.rn + 1
),
last1 AS (
  SELECT user_id, cnt FROM (SELECT *, row_number() OVER (
      PARTITION BY user_id ORDER BY rn DESC) AS rr FROM sim1)
  WHERE rr = 1
),
last2 AS (
  SELECT user_id, cnt FROM (SELECT *, row_number() OVER (
      PARTITION BY user_id ORDER BY rn DESC) AS rr FROM sim2)
  WHERE rr = 1
)
SELECT 'c_chain' AS tag, cast(sum(cnt) as bigint) AS n FROM last2
UNION ALL
SELECT 'c_le1800' AS tag, cast(sum(cnt) as bigint) AS n FROM last1
UNION ALL
SELECT 'm_gt25d' AS tag, cast(sum((EXISTS (
    SELECT 1 FROM e a, e b
    WHERE a.user_id = u.user_id AND b.user_id = u.user_id
      AND a.event_type = 'view' AND b.event_type = 'click'
      AND b.t - a.t > 2160000000000))::INT) as bigint) AS n FROM u
UNION ALL
SELECT 'm_lt2h' AS tag, cast(sum((EXISTS (
    SELECT 1 FROM e a, e b
    WHERE a.user_id = u.user_id AND b.user_id = u.user_id
      AND a.event_type = 'view' AND b.event_type = 'click'
      AND b.t >= a.t AND b.t - a.t < 7200000000))::INT) as bigint) AS n
FROM u
ORDER BY tag
"""


_WITH_FILL2_CH_SQL = """
select pri, y, cnt from (
  select o_orderpriority as pri, toInt64(toYear(o_orderdate)) as y,
         toInt64(count(*)) as cnt
  from orders
  where o_custkey global not in
        (select c_custkey from customer where c_acctbal < -900)
    and toYear(o_orderdate) not in (1996, 1999)
  group by pri, toYear(o_orderdate)
) order by pri, y with fill interpolate (cnt as cnt + 10)
"""


def calc_with_fill2_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-8 WITH FILL surface: multi-key fill (grid restarts per
    o_orderpriority group over the group's year span), INTERPOLATE
    with an iterated ``AS cnt + 10`` cascade on the filled rows, and
    a GLOBAL NOT IN source filter — all through one translated
    statement."""
    from ora_ch_spark.functions.dialect import translate_ch_sql
    from ora_ch_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(translate_ch_sql(_WITH_FILL2_CH_SQL)).orderBy(
        "pri", "y"
    )


# the interpolate cascade is linear (+10 per filled step), so the
# closed form last_real + 10*k replaces the iterated fold; the spine
# covers every integer year in the group span, making LEFT JOIN from
# the spine ≡ the translator's FULL JOIN.
WITH_FILL2_ORACLE = """
WITH src AS (
  SELECT o_orderpriority AS pri, cast(year(o_orderdate) as bigint) AS y,
         cast(count(*) as bigint) AS cnt
  FROM orders
  WHERE o_custkey NOT IN
        (SELECT c_custkey FROM customer WHERE c_acctbal < -900)
    AND year(o_orderdate) NOT IN (1996, 1999)
  GROUP BY 1, 2
),
spine AS (
  SELECT pri, unnest(generate_series(mn, mx)) AS y
  FROM (SELECT pri, min(y) AS mn, max(y) AS mx FROM src GROUP BY pri)
),
j AS (
  SELECT s.pri, s.y, src.cnt, src.cnt IS NOT NULL AS is_real
  FROM spine s LEFT JOIN src ON src.pri = s.pri AND src.y = s.y
),
g AS (
  SELECT *, count(CASE WHEN is_real THEN 1 END) OVER (
      PARTITION BY pri ORDER BY y) AS grp
  FROM j
)
SELECT pri, y,
       CASE WHEN is_real THEN cnt ELSE
         max(CASE WHEN is_real THEN cnt END) OVER (PARTITION BY pri, grp)
         + 10 * (row_number() OVER (PARTITION BY pri, grp ORDER BY y) - 1)
       END AS cnt
FROM g ORDER BY pri, y
"""



# ---------------------------------------------------------------------------
# Batch-11 dialect surface (round 8) — the remaining common-function
# sweep: deterministic subset value-gated here (any()/rand* are
# unit-tested instead: arbitrary-value / nondeterministic results
# cannot hash-gate).
# ---------------------------------------------------------------------------

_DIALECT14_CH_SQL = """
select
  toInt64(toYear(o_orderdate)) as y,
  toInt64(sum(max2(o_custkey % 7, o_orderkey % 5))) as mx,
  toInt64(sum(min2(o_custkey % 7, o_orderkey % 5))) as mn,
  round(sum(exp2(o_custkey % 8)), 2) as e2,
  toInt64(sum(intExp10(o_custkey % 4))) as e10,
  toInt64(sum(roundToExp2(o_custkey % 100))) as r2,
  toInt64(min(toISOYear(o_orderdate))) as iso,
  min(formatDateTimeInJodaSyntax(toDateTime(o_orderdate), 'yyyy/MM/dd')) as joda,
  min(reverseUTF8(o_orderpriority)) as rev,
  toInt64(sum(if(multiSearchAnyCaseInsensitive(o_orderpriority, ['urgent', 'LOW']), 1, 0))) as msa,
  toInt64(sum(if(notILike(o_orderstatus, '%f%'), 1, 0))) as nil,
  toInt64(sum(arraySum(range(o_custkey % 5)))) as rg,
  toInt64(sum(javaHash(o_orderpriority))) as jh,
  toInt64(sum(hiveHash(o_orderstatus))) as hh,
  min(normalizeQuery(concat('SELECT ', toString(o_orderkey % 9), ' WHERE k IN (1, 2)'))) as nq,
  toInt64(sumWithOverflow(o_custkey % 101)) as so,
  min(toStartOfSecond(toDateTime(o_orderdate))) as tss
from orders
where o_orderkey <= 6000
group by toYear(o_orderdate)
order by y
"""


def calc_dialect14_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-11 function surface, value-gated: max2/min2, exp2/
    intExp10, roundToExp2 closed form, ISO year, Joda formatting,
    UTF8 aliases, case-insensitive multi-search, notILike, guarded
    range(), exact javaHash/hiveHash (32-bit wraparound fold replayed
    by DuckDB list_reduce), normalizeQuery fingerprinting,
    sumWithOverflow, toStartOfSecond."""
    from ora_ch_spark.functions.dialect import translate_ch_sql
    from ora_ch_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(translate_ch_sql(_DIALECT14_CH_SQL)).orderBy("y")


DIALECT14_ORACLE = """
WITH o AS (SELECT * FROM orders WHERE o_orderkey <= 6000),
jh AS (
  SELECT o_orderkey,
    (CASE WHEN h >= 2147483648 THEN h - 4294967296 ELSE h END) AS jhash,
    (hs % 2147483648) AS hhash
  FROM (
    SELECT o_orderkey,
      list_reduce(list_prepend(0::BIGINT,
        list_transform(range(1, len(o_orderpriority) + 1),
                       i -> ord(substr(o_orderpriority, i, 1))::BIGINT)),
        (a, c) -> (a * 31 + c) % 4294967296) AS h,
      list_reduce(list_prepend(0::BIGINT,
        list_transform(range(1, len(o_orderstatus) + 1),
                       i -> ord(substr(o_orderstatus, i, 1))::BIGINT)),
        (a, c) -> (a * 31 + c) % 4294967296) AS hs
    FROM o
  )
)
SELECT cast(year(o_orderdate) as bigint) AS y,
  cast(sum(greatest(o_custkey % 7, o_orderkey % 5)) as bigint) AS mx,
  cast(sum(least(o_custkey % 7, o_orderkey % 5)) as bigint) AS mn,
  round(sum(pow(2, o_custkey % 8)), 2) AS e2,
  cast(sum(cast(pow(10, o_custkey % 4) as bigint)) as bigint) AS e10,
  cast(sum(CASE WHEN o_custkey % 100 < 1 THEN 0
           ELSE cast(pow(2, floor(log2(o_custkey % 100))) as bigint) END)
       as bigint) AS r2,
  cast(min(isoyear(o_orderdate)) as bigint) AS iso,
  min(strftime(o_orderdate, '%Y/%m/%d')) AS joda,
  min(reverse(o_orderpriority)) AS rev,
  cast(sum(CASE WHEN contains(lower(o_orderpriority), 'urgent')
                  OR contains(lower(o_orderpriority), 'low')
            THEN 1 ELSE 0 END) as bigint) AS msa,
  cast(sum(CASE WHEN NOT (o_orderstatus ILIKE '%f%') THEN 1 ELSE 0 END)
       as bigint) AS nil,
  cast(sum(list_sum(list_prepend(0, range(o_custkey % 5)))) as bigint) AS rg,
  cast(sum(jh.jhash) as bigint) AS jh,
  cast(sum(jh.hhash) as bigint) AS hh,
  min('SELECT ? WHERE k IN (?..)') AS nq,
  cast(sum(o_custkey % 101) as bigint) AS so,
  min(date_trunc('second', o_orderdate::TIMESTAMP)) AS tss
FROM o JOIN jh USING (o_orderkey)
GROUP BY year(o_orderdate)
ORDER BY y
"""


_WITH_FILL_DATES_CH_SQL = """
select pri, m, cnt from (
  select o_orderpriority as pri,
         toStartOfMonth(o_orderdate) as m,
         toInt64(count(*)) as cnt
  from orders
  where o_orderkey <= 2000
    and toMonth(o_orderdate) not in (3, 6, 9)
  group by pri, toStartOfMonth(o_orderdate)
) order by pri, m with fill step interval 1 month interpolate (cnt)
"""


def calc_with_fill_dates_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-8 date-grid WITH FILL: per-priority monthly spine via
    ``sequence(date, date, INTERVAL 1 MONTH)`` (month gaps planted by
    the filter), INTERPOLATE carrying the last real count across the
    filled months."""
    from ora_ch_spark.functions.dialect import translate_ch_sql
    from ora_ch_spark.io import register_views

    register_views(spark, sf_dir)
    out = spark.sql(translate_ch_sql(_WITH_FILL_DATES_CH_SQL))
    # DATE → TIMESTAMP for the gate: pandas renders Spark dates as
    # objects but DuckDB dates as datetime64, which the dtype-kind
    # check rejects; the cast is value-preserving on both engines
    return out.withColumn("m", F.col("m").cast("timestamp")).orderBy(
        "pri", "m"
    )


WITH_FILL_DATES_ORACLE = """
WITH src AS (
  SELECT o_orderpriority AS pri,
         date_trunc('month', o_orderdate)::TIMESTAMP AS m,
         cast(count(*) as bigint) AS cnt
  FROM orders
  WHERE o_orderkey <= 2000 AND month(o_orderdate) NOT IN (3, 6, 9)
  GROUP BY 1, 2
),
spine AS (
  SELECT pri, unnest(generate_series(mn, mx, INTERVAL 1 MONTH))::TIMESTAMP AS m
  FROM (SELECT pri, min(m) AS mn, max(m) AS mx FROM src GROUP BY pri)
),
j AS (
  SELECT s.pri, s.m, src.cnt, src.cnt IS NOT NULL AS is_real
  FROM spine s LEFT JOIN src ON src.pri = s.pri AND src.m = s.m
),
g AS (
  SELECT *, count(CASE WHEN is_real THEN 1 END) OVER (
      PARTITION BY pri ORDER BY m) AS grp
  FROM j
)
SELECT pri, m,
       CASE WHEN is_real THEN cnt ELSE
         max(CASE WHEN is_real THEN cnt END) OVER (PARTITION BY pri, grp)
       END AS cnt
FROM g ORDER BY pri, m
"""


# ---------------------------------------------------------------------------
# Round-9 WITH FILL INTERPOLATE, cross-column form (VERDICT r8 missing
# #1): exprs reference OTHER interpolated columns' previous-row values
# — CH evaluates every INTERPOLATE expr against the previous output
# row simultaneously, which the translator now compiles to a single
# struct-valued fold (see dialect._rewrite_with_fill).
# ---------------------------------------------------------------------------

_WITH_FILL3_CH_SQL = """
select n, inter, inter2
from (
  select toInt64(o_orderkey % 40) as n,
         toInt64(min(o_orderkey) % 7 + 10) as inter,
         toInt64(min(o_orderkey) % 11 + 100) as inter2
  from orders
  where o_orderkey % 40 in (2, 9, 17, 33)
  group by n
)
order by n with fill from 0 to 21 step 3
interpolate (inter as inter + 1, inter2 as inter2 + inter)
"""


def calc_with_fill3_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-column INTERPOLATE (the CH-docs two-column shape:
    ``inter AS inter + 1, inter2 AS inter2 + inter``): each filled
    row's ``inter2`` reads the PREVIOUS row's ``inter`` — per-column
    carries cannot express this; the translation folds one struct of
    all interpolated columns per filled step. Grid 0..21 step 3 with
    real rows both on- and off-grid and one beyond the grid; leading
    filled rows (no previous real row) carry NULL on both engines."""
    from ora_ch_spark.functions.dialect import translate_ch_sql
    from ora_ch_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(translate_ch_sql(_WITH_FILL3_CH_SQL)).orderBy("n")


# the fold is linear, so the k-th filled step after base (b1, b2) has
# the closed form inter = b1 + k, inter2 = b2 + k*b1 + k(k-1)/2
# (inter on the previous row is b1 + (k-1); summing the arithmetic
# series replaces the iterated struct fold)
WITH_FILL3_ORACLE = """
WITH src AS (
  SELECT cast(o_orderkey % 40 as bigint) AS n,
         cast(min(o_orderkey) % 7 + 10 as bigint) AS inter,
         cast(min(o_orderkey) % 11 + 100 as bigint) AS inter2
  FROM orders WHERE o_orderkey % 40 IN (2, 9, 17, 33)
  GROUP BY 1
),
spine AS (SELECT unnest(generate_series(0, 18, 3)) AS n),
j AS (
  SELECT coalesce(s.n, r.n) AS n, r.inter AS b_inter,
         r.inter2 AS b_inter2, r.n IS NOT NULL AS is_real
  FROM spine s FULL JOIN src r ON s.n = r.n
),
m AS (
  SELECT *, count(CASE WHEN is_real THEN 1 END) OVER (
      ORDER BY n ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
  FROM j
),
v AS (
  SELECT *, row_number() OVER (PARTITION BY grp ORDER BY n) - 1 AS k,
         max(CASE WHEN is_real THEN b_inter END)
             OVER (PARTITION BY grp) AS b1,
         max(CASE WHEN is_real THEN b_inter2 END)
             OVER (PARTITION BY grp) AS b2
  FROM m
)
SELECT n,
       cast(CASE WHEN is_real THEN b_inter ELSE b1 + k END as bigint)
         AS inter,
       cast(CASE WHEN is_real THEN b_inter2
                 ELSE b2 + k * b1 + (k * (k - 1)) // 2 END as bigint)
         AS inter2
FROM v ORDER BY n
"""


# ---------------------------------------------------------------------------
# Battery 17 (round 9) — calendar-irregular date folds + optional-
# lambda aggregates (VERDICT r8 missing #3/#4): toStartOfInterval on
# month/quarter/year grids (epoch-anchored), age() complete calendar
# months (the Jan-31 → Feb-28 ≠ 1 month trap), dateDiff as BOUNDARY
# CROSSINGS for every unit (the r9 fix — timestampdiff silently
# under-counted), arrayMin/Max/Sum/Avg(f, arr). The 1996-01-31
# reference date plants the end-of-month boundary traps; orders span
# 1995–2001 so both argument orders (negative ages) occur.
# ---------------------------------------------------------------------------

_DIALECT17_CH_SQL = """
select grp,
  toInt64(count(*)) as n,
  toDateTime(min(toStartOfInterval(o_orderdate, INTERVAL 2 MONTH))) as grid2m,
  toDateTime(max(toStartOfInterval(o_orderdate, INTERVAL 1 QUARTER))) as gridq,
  toDateTime(max(toStartOfInterval(o_orderdate, INTERVAL 2 YEAR))) as grid2y,
  toInt64(sum(age('month', toDateTime('1996-01-31 00:00:00'), o_orderdate))) as age_m,
  toInt64(sum(age('quarter', toDateTime('1996-01-31 00:00:00'), o_orderdate))) as age_q,
  toInt64(sum(age('year', toDateTime('1996-06-15 00:00:00'), o_orderdate))) as age_y,
  toInt64(sum(dateDiff('month', toDateTime('1996-01-31 00:00:00'), o_orderdate))) as dd_m,
  toInt64(sum(dateDiff('quarter', toDateTime('1996-01-31 00:00:00'), o_orderdate))) as dd_q,
  toInt64(sum(dateDiff('year', toDateTime('1996-01-31 00:00:00'), o_orderdate))) as dd_y,
  toInt64(sum(dateDiff('week', toDateTime('1996-01-31 00:00:00'), o_orderdate))) as dd_w,
  toInt64(sum(dateDiff('day', toDateTime('1996-01-31 00:00:00'), o_orderdate))) as dd_d,
  toInt64(min(arrayMin(x -> x * 2 + 1, [o_orderkey % 7, o_orderkey % 5, 3]))) as am,
  toInt64(max(arrayMax(x -> x % 4, [o_orderkey % 9, o_orderkey % 6]))) as ax,
  round(sum(arraySum(x -> x * 0.5, [o_orderkey % 3, 2])), 2) as asum,
  round(sum(arrayAvg(x -> x + 2, [o_orderkey % 5, o_orderkey % 7])), 2) as aavg
from (
  select o_orderkey, o_orderdate,
         multiIf(o_orderkey % 2 = 0, 'E', 'O') as grp
  from orders
)
group by grp
order by grp
"""


def calc_dialect17_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Battery 17, value-gated: calendar-grid toStartOfInterval,
    complete-calendar-month age(), boundary-crossing dateDiff, and
    the optional-lambda aggregate forms — against DuckDB's NATIVE
    date_diff (itself boundary-crossing with Monday weeks) and an
    explicit day-and-time replay of CH's age()."""
    from ora_ch_spark.functions.dialect import translate_ch_sql
    from ora_ch_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(translate_ch_sql(_DIALECT17_CH_SQL)).orderBy("grp")


# age replay: complete months = Δcalendar-months minus one when the
# end's day-of-month precedes the start's (all order dates are
# midnight so day comparison suffices), sign via argument swap,
# quarter/year = months // k (DuckDB // truncates toward zero like
# Spark div). date_diff is DuckDB-native boundary crossings.
DIALECT17_ORACLE = """
WITH src AS (
  SELECT o_orderkey, o_orderdate,
         CASE WHEN o_orderkey % 2 = 0 THEN 'E' ELSE 'O' END AS grp,
         CASE WHEN DATE '1996-01-31' <= o_orderdate
              THEN (year(o_orderdate) - 1996) * 12 + month(o_orderdate) - 1
                   - CASE WHEN day(o_orderdate) < 31 THEN 1 ELSE 0 END
              ELSE -((1996 - year(o_orderdate)) * 12 + 1 - month(o_orderdate)
                   - CASE WHEN 31 < day(o_orderdate) THEN 1 ELSE 0 END)
         END AS fm_jan,
         CASE WHEN DATE '1996-06-15' <= o_orderdate
              THEN (year(o_orderdate) - 1996) * 12 + month(o_orderdate) - 6
                   - CASE WHEN day(o_orderdate) < 15 THEN 1 ELSE 0 END
              ELSE -((1996 - year(o_orderdate)) * 12 + 6 - month(o_orderdate)
                   - CASE WHEN 15 < day(o_orderdate) THEN 1 ELSE 0 END)
         END AS fm_jun
  FROM orders
)
SELECT grp,
  cast(count(*) as bigint) AS n,
  cast(min(DATE '1970-01-01' + to_months(cast(
      ((year(o_orderdate) - 1970) * 12 + month(o_orderdate) - 1)
      // 2 * 2 as int))) as timestamp) AS grid2m,
  cast(max(DATE '1970-01-01' + to_months(cast(
      ((year(o_orderdate) - 1970) * 12 + month(o_orderdate) - 1)
      // 3 * 3 as int))) as timestamp) AS gridq,
  cast(max(DATE '1970-01-01' + to_months(cast(
      ((year(o_orderdate) - 1970) * 12 + month(o_orderdate) - 1)
      // 24 * 24 as int))) as timestamp) AS grid2y,
  cast(sum(fm_jan) as bigint) AS age_m,
  cast(sum(fm_jan // 3) as bigint) AS age_q,
  cast(sum(fm_jun // 12) as bigint) AS age_y,
  cast(sum(date_diff('month', DATE '1996-01-31', o_orderdate)) as bigint)
    AS dd_m,
  cast(sum(date_diff('quarter', DATE '1996-01-31', o_orderdate)) as bigint)
    AS dd_q,
  cast(sum(date_diff('year', DATE '1996-01-31', o_orderdate)) as bigint)
    AS dd_y,
  cast(sum(date_diff('week', DATE '1996-01-31', o_orderdate)) as bigint)
    AS dd_w,
  cast(sum(date_diff('day', DATE '1996-01-31', o_orderdate)) as bigint)
    AS dd_d,
  cast(min(list_min(list_transform([o_orderkey % 7, o_orderkey % 5, 3],
      x -> x * 2 + 1))) as bigint) AS am,
  cast(max(list_max(list_transform([o_orderkey % 9, o_orderkey % 6],
      x -> x % 4))) as bigint) AS ax,
  round(sum(list_sum(list_transform([o_orderkey % 3, 2],
      x -> x * 0.5))), 2) AS asum,
  round(sum(list_sum(list_transform([o_orderkey % 5, o_orderkey % 7],
      x -> cast(x + 2 as double))) / 2), 2) AS aavg
FROM src
GROUP BY grp
ORDER BY grp
"""


# ---------------------------------------------------------------------------
# Battery 18 (round 9) — common-function sweep leftovers: Date32/
# DateTime64 casts, toYearWeek mode 3, toStartOfWeek both week-start
# modes, bare arrayCount, bitTestAny/All, toTime, negate, notLike,
# 128-bit casts (decimal(38,0)), toward-zero truncate.
# ---------------------------------------------------------------------------

_DIALECT18_CH_SQL = """
select grp,
  toDateTime(max(toDate32(toString(toDate(o_orderdate))))) as d32,
  toDateTime(max(toDateTime64(o_orderdate, 3))) as dt64,
  toInt64(sum(toYearWeek(o_orderdate, 3))) as yw,
  toDateTime(min(toStartOfWeek(o_orderdate))) as w0,
  toDateTime(min(toStartOfWeek(o_orderdate, 1))) as w1,
  toInt64(sum(arrayCount([o_orderkey % 2, o_orderkey % 3, 1]))) as ac,
  toInt64(countIf(bitTestAny(o_orderkey, 0, 1))) as bta,
  toInt64(countIf(bitTestAll(o_orderkey, 0, 1))) as btl,
  toDateTime(max(toTime(o_orderdate + toIntervalSecond(o_orderkey % 86399))))
    as tt,
  toInt64(sum(negate(o_orderkey % 5))) as ng,
  toInt64(countIf(notLike(o_orderpriority, '%H%'))) as nl,
  toFloat64(max(toInt128(o_orderkey) * 2)) as i128,
  toFloat64(sum(toDecimal64(truncate(o_totalprice / 1000, 2), 2))) as tr
from (
  select o_orderkey, o_orderdate, o_totalprice, o_orderpriority,
         multiIf(o_orderkey % 2 = 0, 'E', 'O') as grp
  from orders
)
group by grp
order by grp
"""


def calc_dialect18_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Battery 18, value-gated vs DuckDB: week-start mode semantics
    (Sunday default / Monday mode 1), ISO toYearWeek, time-of-day
    extraction onto the CH 1970-01-02 anchor, bit tests, toward-zero
    numeric truncation (decimal-summed for order independence), and
    the Date32/DateTime64/Int128 type casts."""
    from ora_ch_spark.functions.dialect import translate_ch_sql
    from ora_ch_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(translate_ch_sql(_DIALECT18_CH_SQL)).orderBy("grp")


DIALECT18_ORACLE = """
SELECT grp,
  cast(max(cast(cast(cast(o_orderdate as date) as varchar) as date))
       as timestamp) AS d32,
  cast(max(cast(o_orderdate as timestamp)) as timestamp) AS dt64,
  cast(sum(isoyear(o_orderdate) * 100 + weekofyear(o_orderdate))
       as bigint) AS yw,
  cast(min(cast(o_orderdate as date)
           - to_days(cast(dayofweek(o_orderdate) as int)))
       as timestamp) AS w0,
  cast(min(date_trunc('week', o_orderdate)) as timestamp) AS w1,
  cast(sum(len(list_filter([o_orderkey % 2, o_orderkey % 3, 1],
                           x -> x <> 0))) as bigint) AS ac,
  cast(count(CASE WHEN ((o_orderkey >> 0) & 1) = 1
                    OR ((o_orderkey >> 1) & 1) = 1 THEN 1 END)
       as bigint) AS bta,
  cast(count(CASE WHEN ((o_orderkey >> 0) & 1) = 1
                   AND ((o_orderkey >> 1) & 1) = 1 THEN 1 END)
       as bigint) AS btl,
  cast(max(make_timestamp(86400000000 +
      epoch_us(o_orderdate + to_seconds(cast(o_orderkey % 86399 as int)))
      % 86400000000)) as timestamp) AS tt,
  cast(sum(-(o_orderkey % 5)) as bigint) AS ng,
  cast(count(CASE WHEN o_orderpriority NOT LIKE '%H%' THEN 1 END)
       as bigint) AS nl,
  cast(max(cast(o_orderkey as decimal(38,0)) * 2) as double) AS i128,
  cast(sum(cast(trunc(o_totalprice / 1000 * 100)
                / 100 as decimal(18,2))) as double) AS tr
FROM (
  SELECT o_orderkey, o_orderdate, o_totalprice, o_orderpriority,
         CASE WHEN o_orderkey % 2 = 0 THEN 'E' ELSE 'O' END AS grp
  FROM orders
)
GROUP BY grp
ORDER BY grp
"""


# ---------------------------------------------------------------------------
# Battery 19 (round 9) — second common-function sweep: YYYYMMDD
# round-trips, days-since-year-zero anchor, last-day-of-week modes,
# quarter interval arithmetic, countDistinctIf, case-insensitive
# UTF-8 position, isZeroOrNull/toBool, interpolated weighted
# quantile (vs DuckDB quantile_cont over weight-repeated values).
# The order-undefined forms (groupConcat, groupArrayLast,
# arrayRandomSample, anyLastIf) are unit/role-level only.
# ---------------------------------------------------------------------------

_DIALECT19_CH_SQL = """
select grp,
  toInt64(countIf(YYYYMMDDToDate(toYYYYMMDD(o_orderdate))
                  = toDate(o_orderdate))) as ymd_rt,
  toInt64(max(toDaysSinceYearZero(o_orderdate))) as dz_max,
  toInt64(countIf(fromDaysSinceYearZero(toDaysSinceYearZero(o_orderdate))
                  = toDate(o_orderdate))) as dz_rt,
  toDateTime(max(toLastDayOfWeek(o_orderdate))) as lw0,
  toDateTime(max(toLastDayOfWeek(o_orderdate, 1))) as lw1,
  toDateTime(max(addQuarters(o_orderdate, o_orderkey % 3))) as aq,
  toDateTime(min(subtractQuarters(o_orderdate, 2))) as sq,
  toInt64(countDistinctIf(o_orderpriority, o_totalprice > 100000)) as cdi,
  toInt64(sum(positionCaseInsensitiveUTF8(o_orderpriority, 'e'))) as pci,
  toInt64(countIf(isZeroOrNull(o_orderkey % 3))) as zn,
  toInt64(countIf(toBool(o_orderkey % 2))) as tb,
  toFloat64(quantileInterpolatedWeighted(0.5)(
      toInt64(o_orderkey % 97), toInt32(o_orderkey % 3 + 1))) as qiw
from (
  select o_orderkey, o_orderdate, o_totalprice, o_orderpriority,
         multiIf(o_orderkey % 2 = 0, 'E', 'O') as grp
  from orders
)
group by grp
order by grp
"""


def calc_dialect19_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Battery 19, value-gated vs DuckDB — incl. the weighted
    interpolated median replayed as quantile_cont over values
    repeated by their integer weights (the definition Spark's
    3-arg percentile implements)."""
    from ora_ch_spark.functions.dialect import translate_ch_sql
    from ora_ch_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(translate_ch_sql(_DIALECT19_CH_SQL)).orderBy("grp")


DIALECT19_ORACLE = """
WITH src AS (
  SELECT o_orderkey, o_orderdate, o_totalprice, o_orderpriority,
         CASE WHEN o_orderkey % 2 = 0 THEN 'E' ELSE 'O' END AS grp
  FROM orders
),
qw AS (
  SELECT grp, quantile_cont(v, 0.5) AS qiw
  FROM (
    SELECT s.grp, cast(s.o_orderkey % 97 as bigint) AS v
    FROM src s, range(3) r
    WHERE r.range < s.o_orderkey % 3 + 1
  )
  GROUP BY grp
)
SELECT s.grp,
  cast(count(CASE WHEN cast(strptime(cast(cast(strftime(o_orderdate,
      '%Y%m%d') as bigint) as varchar), '%Y%m%d') as date)
      = cast(o_orderdate as date) THEN 1 END) as bigint) AS ymd_rt,
  cast(max(date_diff('day', DATE '1970-01-01', cast(o_orderdate as date))
           + 719528) as bigint) AS dz_max,
  cast(count(*) as bigint) AS dz_rt,
  cast(max(cast(o_orderdate as date)
           + (6 - cast(dayofweek(o_orderdate) as int)))
       as timestamp) AS lw0,
  cast(max(cast(date_trunc('week', o_orderdate) as date) + 6)
       as timestamp) AS lw1,
  cast(max(o_orderdate + to_months(cast((o_orderkey % 3) * 3 as int)))
       as timestamp) AS aq,
  cast(min(o_orderdate - to_months(6)) as timestamp) AS sq,
  cast(count(DISTINCT CASE WHEN o_totalprice > 100000
             THEN o_orderpriority END) as bigint) AS cdi,
  cast(sum(position(lower('e') in lower(o_orderpriority))) as bigint)
    AS pci,
  cast(count(CASE WHEN o_orderkey % 3 = 0 THEN 1 END) as bigint) AS zn,
  cast(count(CASE WHEN cast(o_orderkey % 2 as boolean) THEN 1 END)
       as bigint) AS tb,
  max(qw.qiw) AS qiw
FROM src s JOIN qw ON s.grp = qw.grp
GROUP BY s.grp
ORDER BY s.grp
"""


# ---------------------------------------------------------------------------
# Battery 20 (round 9) — third sweep: HTML text extraction, token
# matching, dense enumeration, first-significant-subdomain URL rule,
# width_bucket, OrNull array picks.
# ---------------------------------------------------------------------------

_DIALECT20_CH_SQL = """
select grp,
  toInt64(sum(length(extractTextFromHTML(concat('<p>', o_orderpriority,
      '</p><script>var x = 1;</script><!-- note -->'))))) as html_len,
  toInt64(sum(arraySum(arrayEnumerateDense(
      [o_orderkey % 5, o_orderkey % 3, o_orderkey % 5])))) as ed,
  toInt64(sum(length(splitByNonAlpha(o_orderpriority)))) as spl,
  toInt64(countIf(hasToken(o_orderpriority, 'URGENT'))) as tok,
  toInt64(countIf(hasTokenCaseInsensitive(o_orderpriority, 'urgent')))
    as tokci,
  toInt64(sum(countSubstringsCaseInsensitiveUTF8(o_orderpriority, 'e')))
    as css,
  toInt64(max(arrayFirstOrNull(x -> x > 2, [o_orderkey % 5, 4]))) as afo,
  toInt64(min(arrayLastOrNull(x -> x < 3, [o_orderkey % 5, 1]))) as alo,
  toInt64(sum(widthBucket(o_totalprice, 0, 600000, 6))) as wb,
  max(firstSignificantSubdomain(concat('https://www.ex',
      toString(o_orderkey % 3), '.com.tr/p'))) as fss,
  max(cutToFirstSignificantSubdomain(concat('https://a.ex',
      toString(o_orderkey % 3), '.org/p'))) as cfss,
  toInt64(sum(toInt32OrZero(regexpExtract(o_orderpriority,
      '^([0-9])', 1)))) as rex
from (
  select o_orderkey, o_totalprice, o_orderpriority,
         multiIf(o_orderkey % 2 = 0, 'E', 'O') as grp
  from orders
)
group by grp
order by grp
"""


def calc_dialect20_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Battery 20, value-gated vs DuckDB (whose RE2 lacks
    backreferences, so the oracle's HTML strip spells script/style as
    two literal patterns; arrayEnumerateDense replays as the closed
    form since DuckDB's list_distinct does not pin first-occurrence
    order; width_bucket replays as the floor formula)."""
    from ora_ch_spark.functions.dialect import translate_ch_sql
    from ora_ch_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(translate_ch_sql(_DIALECT20_CH_SQL)).orderBy("grp")


DIALECT20_ORACLE = """
WITH src AS (
  SELECT o_orderkey, o_totalprice, o_orderpriority,
         CASE WHEN o_orderkey % 2 = 0 THEN 'E' ELSE 'O' END AS grp,
         '<p>' || o_orderpriority ||
         '</p><script>var x = 1;</script><!-- note -->' AS html
  FROM orders
)
SELECT grp,
  cast(sum(length(trim(regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(regexp_replace(html,
          '(?is)<script\\b.*?</script\\s*>', ' ', 'g'),
          '(?is)<style\\b.*?</style\\s*>', ' ', 'g'),
          '(?s)<!--.*?-->', ' ', 'g'),
          '<[^>]*>', ' ', 'g'),
          '\\s+', ' ', 'g')))) as bigint) AS html_len,
  cast(sum(CASE WHEN o_orderkey % 5 = o_orderkey % 3
                THEN 3 ELSE 4 END) as bigint) AS ed,
  cast(sum(len(list_filter(regexp_split_to_array(o_orderpriority,
      '[^0-9A-Za-z]+'), x -> x <> ''))) as bigint) AS spl,
  cast(count(CASE WHEN regexp_matches(o_orderpriority,
      '(^|[^0-9A-Za-z])URGENT([^0-9A-Za-z]|$)') THEN 1 END)
      as bigint) AS tok,
  cast(count(CASE WHEN regexp_matches(o_orderpriority,
      '(?i)(^|[^0-9A-Za-z])urgent([^0-9A-Za-z]|$)') THEN 1 END)
      as bigint) AS tokci,
  cast(sum((length(o_orderpriority) - length(replace(
      lower(o_orderpriority), 'e', ''))) // 1) as bigint) AS css,
  cast(max(CASE WHEN o_orderkey % 5 > 2 THEN o_orderkey % 5
                ELSE 4 END) as bigint) AS afo,
  cast(min(CASE WHEN 1 < 3 THEN 1 END) as bigint) AS alo,
  cast(sum(least(cast(floor(o_totalprice / 100000) as bigint) + 1, 7))
      as bigint) AS wb,
  max('ex' || cast(o_orderkey % 3 as varchar)) AS fss,
  max('ex' || cast(o_orderkey % 3 as varchar) || '.org') AS cfss,
  cast(sum(cast(regexp_extract(o_orderpriority, '^([0-9])', 1)
      as int)) as bigint) AS rex
FROM src
GROUP BY grp
ORDER BY grp
"""


_WITH_FILL4_CH_SQL = """
select toInt64(count(*)) as n, toInt64(sum(cnt)) as s,
       toInt64(min(y)) as y0, toInt64(max(y)) as y1
from (
  select y, cnt from (
    select toInt64(toYear(o_orderdate)) as y, toInt64(count(*)) as cnt
    from orders where toYear(o_orderdate) not in (1997, 1999) group by y
  ) order by y with fill
)
"""


def calc_with_fill4_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NESTED WITH FILL (r9): the fill clause sits inside a
    subquery and the OUTER query aggregates over the filled rows —
    the spine join rewrites in place inside the subquery span
    (filled years carry NULL cnt, so sum(cnt) sees only real rows
    while count(*)/min/max see the grid)."""
    from ora_ch_spark.functions.dialect import translate_ch_sql
    from ora_ch_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(translate_ch_sql(_WITH_FILL4_CH_SQL))


WITH_FILL4_ORACLE = """
WITH src AS (
  SELECT cast(year(o_orderdate) as bigint) AS y,
         cast(count(*) as bigint) AS cnt
  FROM orders WHERE year(o_orderdate) NOT IN (1997, 1999)
  GROUP BY 1
),
spine AS (
  SELECT unnest(generate_series((SELECT min(y) FROM src),
                                (SELECT max(y) FROM src))) AS y
),
j AS (
  SELECT coalesce(s.y, r.y) AS y, r.cnt
  FROM spine s FULL JOIN src r ON s.y = r.y
)
SELECT cast(count(*) as bigint) AS n, cast(sum(cnt) as bigint) AS s,
       cast(min(y) as bigint) AS y0, cast(max(y) as bigint) AS y1
FROM j
"""


# ---------------------------------------------------------------------------
# Round-9 JSON path completion (VERDICT r8 missing #5): NON-literal
# top-level keys in JSONExtract*/JSONHas (→ from_json map form) and
# the multi-key NESTED literal path (JSONExtract*(j, 'a', 'b') used
# to silently drop 'b').
# ---------------------------------------------------------------------------

_JSON_DYNAMIC_CH_SQL = """
select kg,
       toInt64(countIf(JSONHas(props, kk))) as n_has,
       toInt64(max(JSONExtractInt(props, kk))) as mx,
       max(JSONExtractString(props, kk)) as mxs,
       toInt64(max(JSONExtractInt(concat('{"w":', props, '}'), 'w', 'k')))
         as nested_mx,
       toInt64(max(JSONExtractInt(concat('{"w":', props, '}'), 'w', kk)))
         as dyn_tail_mx,
       toInt64(max(JSONExtractInt(concat('{"q":', props, '}'), kq, 'k')))
         as dyn_head_mx,
       toInt64(countIf(JSONHas(concat('{"w":', props, '}'), 'w', kk)))
         as dyn_has
from (
  select props,
         if(event_id % 3 = 0, 'k', 'missing') as kk,
         if(event_id % 4 = 0, 'q', 'absent') as kq,
         if(event_id % 3 = 0, 'hit', 'miss') as kg
  from events
)
group by kg
order by kg
"""


def calc_json_dynamic_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic JSON keys: the key argument is a COLUMN (if-derived),
    so the $-path cannot splice at translate time — the map form
    ``element_at(from_json(j, 'map<string,string>'), k)`` takes over
    (value rendering verified identical to get_json_object for
    top-level keys). The nested_mx column pins the r9 multi-key
    literal fix ('w', 'k' → $.w.k — formerly dropped the tail); the
    dyn_tail/dyn_head/dyn_has columns pin the r10 chained rewrite for
    dynamic NESTED paths (literal prefix → dynamic tail and dynamic
    head → literal tail, each resolving through
    element_at(from_json(…)) per dynamic segment)."""
    from ora_ch_spark.functions.dialect import translate_ch_sql
    from ora_ch_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(translate_ch_sql(_JSON_DYNAMIC_CH_SQL)).orderBy("kg")


JSON_DYNAMIC_ORACLE = """
SELECT kg,
  cast(count(CASE WHEN json_extract(props, '$.' || kk) IS NOT NULL
             THEN 1 END) as bigint) AS n_has,
  cast(max(cast(json_extract_string(props, '$.' || kk) as bigint))
       as bigint) AS mx,
  max(json_extract_string(props, '$.' || kk)) AS mxs,
  cast(max(cast(json_extract_string('{"w":' || props || '}', '$.w.k')
                as bigint)) as bigint) AS nested_mx,
  cast(max(cast(json_extract_string('{"w":' || props || '}',
                '$.w.' || kk) as bigint)) as bigint) AS dyn_tail_mx,
  cast(max(cast(json_extract_string('{"q":' || props || '}',
                '$.' || kq || '.k') as bigint)) as bigint) AS dyn_head_mx,
  cast(count(CASE WHEN json_extract('{"w":' || props || '}',
                '$.w.' || kk) IS NOT NULL THEN 1 END) as bigint) AS dyn_has
FROM (
  SELECT props,
         CASE WHEN event_id % 3 = 0 THEN 'k' ELSE 'missing' END AS kk,
         CASE WHEN event_id % 4 = 0 THEN 'q' ELSE 'absent' END AS kq,
         CASE WHEN event_id % 3 = 0 THEN 'hit' ELSE 'miss' END AS kg
  FROM events
)
GROUP BY kg
ORDER BY kg
"""


# ---------------------------------------------------------------------------
# Batch-12 dialect surface (round 8) — vector math over the embeddings
# table (where CH-SQL meets the LLM-pipeline story), array fill/split
# folds, arrayAUC, arrayShift, bitmask expansion.
# ---------------------------------------------------------------------------

_DIALECT15_CH_SQL = """
select
  toInt64(e1.vec_id) as id,
  round(arrayDotProduct(e1.embedding, e2.embedding), 3) as dp,
  round(arrayCosineDistance(e1.embedding, e2.embedding), 4) as cd,
  round(arrayL1Distance(e1.embedding, e2.embedding), 3) as l1,
  round(arrayL2Distance(e1.embedding, e2.embedding), 3) as l2,
  round(arrayLinfDistance(e1.embedding, e2.embedding), 3) as li,
  round(arrayNorm(e1.embedding), 3) as nrm,
  toInt64(arraySum(arrayFill(x -> x > 0,
    arrayMap(v -> toInt32(v * 10), arraySlice(e1.embedding, 1, 6))))) as af,
  toInt64(arrayCount(g -> 1 = 1, arraySplit(x -> x > 0,
    arrayMap(v -> toInt32(v * 10), arraySlice(e1.embedding, 1, 8))))) as sp,
  toInt64(arraySum(arrayShiftLeft(
    arrayMap(v -> toInt32(v * 100), arraySlice(e1.embedding, 1, 4)), 2, 0))) as shl,
  round(arrayAUC(arraySlice(e1.embedding, 1, 8),
    arrayMap(v -> if(v > 0, 1, 0), arraySlice(e2.embedding, 1, 8))), 4) as auc,
  arrayStringConcat(arrayMap(x -> toString(x),
    bitPositionsToArray(e1.vec_id % 64)), ',') as bp
from embeddings e1
join embeddings e2 on e2.vec_id = e1.vec_id + 1
where e1.vec_id % 37 = 0
order by id
"""


def calc_dialect15_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-12 surface over REAL embedding vectors: dot/cosine/Lp
    distances and norms (zip_with/aggregate folds — the JVM-side
    expressions the ANN operators also rely on), arrayFill/Split
    folds, arrayShiftLeft, arrayAUC (rank-sum closed form), bitmask
    expansion — all value-gated against DuckDB list-lambda replays."""
    from ora_ch_spark.functions.dialect import translate_ch_sql
    from ora_ch_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(translate_ch_sql(_DIALECT15_CH_SQL)).orderBy("id")


DIALECT15_ORACLE = """
WITH pair AS (
  SELECT e1.vec_id AS id, e1.embedding AS a, e2.embedding AS b
  FROM embeddings e1 JOIN embeddings e2 ON e2.vec_id = e1.vec_id + 1
  WHERE e1.vec_id % 37 = 0
),
v AS (
  SELECT id,
    list_sum(list_transform(range(1, len(a) + 1),
      i -> a[i]::DOUBLE * b[i]::DOUBLE)) AS dp,
    sqrt(list_sum(list_transform(a, x -> x::DOUBLE * x))) AS na,
    sqrt(list_sum(list_transform(b, x -> x::DOUBLE * x))) AS nb,
    list_sum(list_transform(range(1, len(a) + 1),
      i -> abs(a[i]::DOUBLE - b[i]::DOUBLE))) AS l1,
    sqrt(list_sum(list_transform(range(1, len(a) + 1),
      i -> (a[i]::DOUBLE - b[i]::DOUBLE) * (a[i]::DOUBLE - b[i]::DOUBLE)))) AS l2,
    list_max(list_transform(range(1, len(a) + 1),
      i -> abs(a[i]::DOUBLE - b[i]::DOUBLE))) AS li,
    list_transform(a[1:6], x -> cast(trunc(x::DOUBLE * 10) as int)) AS f6,
    list_transform(a[1:8], x -> cast(trunc(x::DOUBLE * 10) as int)) AS f8,
    list_transform(a[1:4], x -> cast(trunc(x::DOUBLE * 100) as int)) AS c4,
    list_transform(a[1:8], x -> x::DOUBLE) AS s8,
    list_transform(b[1:8], x -> CASE WHEN x > 0 THEN 1 ELSE 0 END) AS lab
  FROM pair
)
SELECT cast(id as bigint) AS id,
  round(dp, 3) AS dp,
  round(1.0 - dp / (na * nb), 4) AS cd,
  round(l1, 3) AS l1,
  round(l2, 3) AS l2,
  round(li, 3) AS li,
  round(na, 3) AS nrm,
  cast(list_sum(list_transform(range(1, len(f6) + 1), i ->
    coalesce(list_last(list_filter(f6[1:i], x -> x > 0)), f6[1])))
    as bigint) AS af,
  cast(len(list_distinct(list_transform(range(1, len(f8) + 1),
    i -> len(list_filter(f8[1:i], x -> x > 0))))) as bigint) AS sp,
  cast(c4[3] + c4[4] as bigint) AS shl,
  round(CASE WHEN len(list_filter(lab, x -> x > 0)) = 0
          OR len(list_filter(lab, x -> x = 0)) = 0 THEN 'NaN'::DOUBLE
   ELSE (
     list_sum(list_transform(range(1, len(s8) + 1), i ->
       CASE WHEN lab[i] > 0 THEN
         len(list_filter(s8, y -> y < s8[i]))::DOUBLE
         + (len(list_filter(s8, y -> y = s8[i]))::DOUBLE + 1) / 2
       ELSE 0 END))
     - len(list_filter(lab, x -> x > 0))::DOUBLE
       * (len(list_filter(lab, x -> x > 0)) + 1) / 2
   ) / (len(list_filter(lab, x -> x > 0))::DOUBLE
        * len(list_filter(lab, x -> x = 0)))
   END, 4) AS auc,
  coalesce(array_to_string(list_filter(range(0, 63),
    i -> ((id % 64) // (1::BIGINT << i)) % 2 = 1), ','), '') AS bp
FROM v
ORDER BY id
"""


_DECAY_CH_SQL = """
select 'eavg' as tag, round(sum(e), 3) as n from (
  select user_id, exponentialTimeDecayedAvg(7200)(value, toUnixTimestamp(ts)) as e
  from events group by user_id)
union all
select 'ecnt' as tag, round(sum(e), 3) as n from (
  select user_id, exponentialTimeDecayedCount(7200)(toUnixTimestamp(ts)) as e
  from events group by user_id)
union all
select 'ema' as tag, round(sum(e), 3) as n from (
  select user_id, exponentialMovingAverage(3600)(value, toUnixTimestamp(ts)) as e
  from events group by user_id)
union all
select 'emax' as tag, round(sum(e), 3) as n from (
  select user_id, exponentialTimeDecayedMax(7200)(value, toUnixTimestamp(ts)) as e
  from events group by user_id)
union all
select 'esum' as tag, round(sum(e), 3) as n from (
  select user_id, exponentialTimeDecayedSum(7200)(value, toUnixTimestamp(ts)) as e
  from events group by user_id)
"""


def calc_decay_agg_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential-decay aggregate family as sorted delta-exponent
    folds: exponentialMovingAverage (2-base half-life, (1−2^(−1/x))
    normalizer — pinned to the CH docs example in units) and the
    e-base exponentialTimeDecayed{Sum,Count,Avg,Max}. Gated against
    DuckDB closed forms (weights factored against the per-user max
    timestamp — algebraically identical, bounded exponents)."""
    from ora_ch_spark.functions.dialect import translate_ch_sql
    from ora_ch_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(translate_ch_sql(_DECAY_CH_SQL)).orderBy("tag")


DECAY_AGG_ORACLE = """
WITH e AS (
  SELECT user_id, floor(epoch(ts::TIMESTAMP))::DOUBLE AS t, value::DOUBLE AS v
  -- floor: toUnixTimestamp yields whole seconds; DuckDB epoch() keeps
  -- the fractional microseconds
  FROM events
),
pairs AS (
  SELECT user_id, list_sort(list([t, v])) AS ps FROM e GROUP BY user_id
),
-- the SAME sequential fold the Spark rewrite emits (state carried as
-- a DOUBLE[] so list_reduce type-checks): acc = [s, t_prev] (+ [w]
-- for avg); identical op order keeps float drift at ulp level
per AS (
  SELECT user_id,
    list_reduce(list_prepend([NULL, NULL]::DOUBLE[],
      list_transform(ps, p -> [p[2], p[1]])),
      (acc, x) -> CASE WHEN acc[2] IS NULL THEN [x[1], x[2]]
        ELSE [acc[1] * pow(2, (acc[2] - x[2]) / 3600.0) + x[1], x[2]]
      END)[1] * (1 - pow(2, -1.0 / 3600.0)) AS ema,
    list_reduce(list_prepend([NULL, NULL]::DOUBLE[],
      list_transform(ps, p -> [p[2], p[1]])),
      (acc, x) -> CASE WHEN acc[2] IS NULL THEN [x[1], x[2]]
        ELSE [acc[1] * exp((acc[2] - x[2]) / 7200.0) + x[1], x[2]]
      END)[1] AS esum,
    list_reduce(list_prepend([NULL, NULL]::DOUBLE[],
      list_transform(ps, p -> [1.0, p[1]])),
      (acc, x) -> CASE WHEN acc[2] IS NULL THEN [x[1], x[2]]
        ELSE [acc[1] * exp((acc[2] - x[2]) / 7200.0) + x[1], x[2]]
      END)[1] AS ecnt,
    list_reduce(list_prepend([NULL, NULL, NULL]::DOUBLE[],
      list_transform(ps, p -> [p[2], p[1], 1.0])),
      (acc, x) -> CASE WHEN acc[3] IS NULL THEN [x[1], 1.0, x[2]]
        ELSE [acc[1] * exp((acc[3] - x[2]) / 7200.0) + x[1],
              acc[2] * exp((acc[3] - x[2]) / 7200.0) + 1.0, x[2]]
      END) AS avg_state,
    list_reduce(list_prepend([NULL, NULL]::DOUBLE[],
      list_transform(ps, p -> [p[2], p[1]])),
      (acc, x) -> CASE WHEN acc[2] IS NULL THEN [x[1], x[2]]
        ELSE [greatest(acc[1] * exp((acc[2] - x[2]) / 7200.0), x[1]), x[2]]
      END)[1] AS emax
  FROM pairs
)
SELECT 'eavg' AS tag, round(sum(avg_state[1] / avg_state[2]), 3) AS n FROM per
UNION ALL
SELECT 'ecnt' AS tag, round(sum(ecnt), 3) AS n FROM per
UNION ALL
SELECT 'ema' AS tag, round(sum(ema), 3) AS n FROM per
UNION ALL
SELECT 'emax' AS tag, round(sum(emax), 3) AS n FROM per
UNION ALL
SELECT 'esum' AS tag, round(sum(esum), 3) AS n FROM per
ORDER BY tag
"""


# ---------------------------------------------------------------------------
# Batch-13 dialect surface (round 8) — aggregate-combinator completion
# (-Array/-OrNull/-Distinct), CH format(), geo leftovers, JSON tails.
# ---------------------------------------------------------------------------

_DIALECT16_CH_SQL = """
select * replace(y + 1000 as y) from (
select
  toInt64(toYear(o_orderdate)) as y,
  round(sumArray([toFloat64(o_custkey % 7), toFloat64(o_orderkey % 5)]), 2) as sa,
  round(avgArray([toFloat64(o_custkey % 7), toFloat64(o_orderkey % 5)]), 6) as aa,
  toInt64(minArray([o_custkey % 7, o_orderkey % 5])) as mna,
  toInt64(maxArray([o_custkey % 7, o_orderkey % 5])) as mxa,
  toInt64(countArray([o_custkey % 7, o_orderkey % 5])) as ca,
  toInt64(uniqArray([o_custkey % 11, o_orderkey % 13])) as ua,
  toInt64(sumDistinct(o_custkey % 19)) as sd,
  toInt64(maxOrNull(o_custkey % 23)) as mo,
  min(format('{1}-{0}', toString(o_orderkey % 7), o_orderstatus)) as fmt,
  toInt64(sum(countSubstringsCaseInsensitive(o_orderpriority, 'E'))) as cs,
  min(mid(o_orderpriority, 3, 4)) as md,
  round(sum(greatCircleAngle(toFloat64(o_custkey % 90), 0.0,
                             toFloat64(o_orderkey % 90), 10.0)), 2) as gca,
  toInt64(sum(pointInEllipses(toFloat64(o_custkey % 10), toFloat64(o_orderkey % 10),
                              5.0, 5.0, 3.0, 4.0))) as pie
from orders
where o_orderkey <= 5000
group by toYear(o_orderdate)
) order by y
"""


def calc_dialect16_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-13 surface, value-gated: -Array combinator folds,
    -OrNull/-Distinct, CH format() placeholder compilation,
    case-insensitive substring counts, mid, greatCircleAngle
    haversine, variadic pointInEllipses — wrapped in a
    ``* REPLACE(y + 1000 AS y)`` column transformer so the r8 star
    rewrite is driver-gated too."""
    from ora_ch_spark.functions.dialect import translate_ch_sql
    from ora_ch_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(translate_ch_sql(_DIALECT16_CH_SQL)).orderBy("y")


DIALECT16_ORACLE = """
WITH o AS (SELECT * FROM orders WHERE o_orderkey <= 5000),
uq AS (
  SELECT y, cast(count(DISTINCT x) as bigint) AS ua FROM (
    SELECT year(o_orderdate) AS y, unnest([o_custkey % 11, o_orderkey % 13]) AS x
    FROM o) GROUP BY y
)
SELECT cast(year(o_orderdate) as bigint) + 1000 AS y,
  round(sum((o_custkey % 7)::DOUBLE + (o_orderkey % 5)::DOUBLE), 2) AS sa,
  round(sum((o_custkey % 7)::DOUBLE + (o_orderkey % 5)::DOUBLE)
        / (2 * count(*)), 6) AS aa,
  cast(min(least(o_custkey % 7, o_orderkey % 5)) as bigint) AS mna,
  cast(max(greatest(o_custkey % 7, o_orderkey % 5)) as bigint) AS mxa,
  cast(2 * count(*) as bigint) AS ca,
  any_value(uq.ua) AS ua,
  cast(sum(DISTINCT o_custkey % 19) as bigint) AS sd,
  cast(max(o_custkey % 23) as bigint) AS mo,
  min(o_orderstatus || '-' || cast(o_orderkey % 7 as varchar)) AS fmt,
  cast(sum(len(o_orderpriority)
       - len(replace(lower(o_orderpriority), 'e', ''))) as bigint) AS cs,
  min(substr(o_orderpriority, 3, 4)) AS md,
  round(sum(degrees(2.0 * asin(sqrt(
    pow(sin(radians(10.0 - 0.0) / 2), 2) +
    cos(radians(0.0)) * cos(radians(10.0)) *
    pow(sin(radians((o_orderkey % 90)::DOUBLE - (o_custkey % 90)) / 2), 2)
  )))), 2) AS gca,
  cast(sum(CASE WHEN
    pow(((o_custkey % 10)::DOUBLE - 5.0) / 3.0, 2)
    + pow(((o_orderkey % 10)::DOUBLE - 5.0) / 4.0, 2) <= 1.0
    THEN 1 ELSE 0 END) as bigint) AS pie
FROM o JOIN uq ON uq.y = year(o_orderdate)
GROUP BY year(o_orderdate)
ORDER BY y
"""


# ---------------------------------------------------------------------------
# Battery 21 (round 10) — block-order-dependent family under an
# explicit defining ORDER BY: runningDifference / neighbor /
# runningAccumulate translate to window functions, groupArrayMovingSum
# and groupArrayMovingAvg to sorted prefix folds (reference parity:
# these CH functions read block order, which a stored query makes
# deterministic with an inner-subquery ORDER BY — the only order CH
# guarantees; orderless calls stay loud, pinned in
# tests/test_dialect_inventory.py).
# ---------------------------------------------------------------------------

_DIALECT21_CH_SQL = """
select k, g, rd, nx, pv, ra, rm, ddu, ms_total, ms_last, ma_last
from (
  select k, g,
    dateDiff(if(k % 2 = 0, 'day', 'month'),
             toDateTime('2020-01-15 12:00:00'),
             toDateTime('2021-03-20 01:00:00')) as ddu,
    runningDifference(v) as rd,
    neighbor(v, 1, -1.0) as nx,
    neighbor(v, -2) as pv,
    round(runningAccumulate(sumState(v)), 2) as ra,
    runningAccumulate(maxState(v), g) as rm
  from (
    select toInt64(o_orderkey) as k,
           multiIf(o_orderkey % 2 = 0, 'E', 'O') as g,
           toFloat64(o_totalprice) as v
    from orders
    where o_orderkey % 200 = 7
    order by k
  )
) w
cross join (
  select round(arraySum(groupArrayMovingSum(3)(v2)), 4) as ms_total,
         round(arrayLast(x -> 1 = 1, groupArrayMovingSum(3)(v2)), 4) as ms_last,
         round(arrayLast(x -> 1 = 1, groupArrayMovingAvg(v2)), 6) as ma_last
  from (
    select toFloat64(o_orderkey % 7) as v2, o_orderkey as kk
    from orders
    where o_orderkey % 500 = 13
    order by kk
  )
) m
order by k
"""


def calc_dialect21_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Battery 21: the block-order family as STORED CH-dialect text.
    The window forms replay in DuckDB as lag/lead/running aggregates;
    the moving-sum folds replay as ROWS-frame window sums (CH sums
    widen to double here — documented in the rewrite). The ddu column
    pins the r10 NON-CONSTANT dateDiff unit (CASE expansion over all
    supported units, boundary-crossing arms)."""
    from ora_ch_spark.functions.dialect import translate_ch_sql
    from ora_ch_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(translate_ch_sql(_DIALECT21_CH_SQL)).orderBy("k")


DIALECT21_ORACLE = """
WITH src AS (
  SELECT cast(o_orderkey as bigint) AS k,
         CASE WHEN o_orderkey % 2 = 0 THEN 'E' ELSE 'O' END AS g,
         cast(o_totalprice as double) AS v
  FROM orders WHERE o_orderkey % 200 = 7
),
w AS (
  SELECT k, g,
    CASE WHEN k % 2 = 0 THEN date_diff('day',
           TIMESTAMP '2020-01-15 12:00:00', TIMESTAMP '2021-03-20 01:00:00')
         ELSE date_diff('month',
           TIMESTAMP '2020-01-15 12:00:00', TIMESTAMP '2021-03-20 01:00:00')
    END AS ddu,
    v - lag(v, 1, v) OVER (ORDER BY k) AS rd,
    lead(v, 1, -1.0) OVER (ORDER BY k) AS nx,
    lag(v, 2) OVER (ORDER BY k) AS pv,
    round(sum(v) OVER (ORDER BY k
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS ra,
    max(v) OVER (PARTITION BY g ORDER BY k
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rm
  FROM src
),
mv AS (
  SELECT
    sum(cast(o_orderkey % 7 as double)) OVER (ORDER BY o_orderkey
      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS ms_i,
    avg(cast(o_orderkey % 7 as double)) OVER (ORDER BY o_orderkey
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ma_i,
    row_number() OVER (ORDER BY o_orderkey) AS rn,
    count(*) OVER () AS n
  FROM orders WHERE o_orderkey % 500 = 13
),
m AS (
  SELECT round(sum(ms_i), 4) AS ms_total,
         round(max(CASE WHEN rn = n THEN ms_i END), 4) AS ms_last,
         round(max(CASE WHEN rn = n THEN ma_i END), 6) AS ma_last
  FROM mv
)
SELECT k, g, rd, nx, pv, ra, rm, ddu, ms_total, ms_last, ma_last
FROM w CROSS JOIN m
ORDER BY k
"""


# ---------------------------------------------------------------------------
# Battery 22 (round 10) — MySQL week modes 0/1/2 for toWeek/toYearWeek
# (CH follows MySQL WEEK()/YEARWEEK() exactly; mode 3 = ISO shipped in
# batch 18, modes 4-9 stay loud), constant defaultValueOfTypeName, and
# RUNTIME hasToken needles (row-level alphanumeric guard, CH exception
# contract on invalid needles). Reference parity: these are ClickHouse
# scalar functions the stored production queries can legally contain.
# ---------------------------------------------------------------------------

_DIALECT22_CH_SQL = """
select k,
  toWeek(d) as w0, toWeek(d, 1) as w1, toWeek(d, 2) as w2,
  toYearWeek(d) as yw0, toYearWeek(d, 1) as yw1, toYearWeek(d, 2) as yw2,
  defaultValueOfTypeName('Int32') as dv_i,
  defaultValueOfTypeName('Nullable(String)') as dv_ns,
  toFloat64(defaultValueOfTypeName('Decimal(12,3)')) as dv_d,
  hasToken(s, tok) as ht, hasTokenCaseInsensitive(s, tok) as hti
from (
  select o_orderkey as k,
         toDate(o_orderdate) as d,
         concat('alpha_', o_orderstatus, ' beta') as s,
         multiIf(o_orderkey % 3 = 0, 'zz',
                 o_orderkey % 3 = 1, o_orderstatus,
                 lower(o_orderstatus)) as tok
  from orders
  where o_orderkey % 97 = 11
)
order by k
"""


def calc_dialect22_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Battery 22 as STORED CH-dialect text through translate_ch_sql.

    Week modes replay in DuckDB as explicit first-Sunday / ISO-Monday
    anchor arithmetic (the same definitions MySQL documents); the
    hasToken oracle is a CLOSED FORM (statuses are single uppercase
    letters, so token presence is decided by which multiIf arm built
    the needle) — independent of the regex the rewrite emits."""
    from ora_ch_spark.functions.dialect import translate_ch_sql
    from ora_ch_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(translate_ch_sql(_DIALECT22_CH_SQL)).orderBy("k")


DIALECT22_ORACLE = """
WITH src AS (
  SELECT o_orderkey AS k, o_orderdate::date AS d,
         CASE WHEN o_orderkey % 3 = 0 THEN 'zz'
              WHEN o_orderkey % 3 = 1 THEN o_orderstatus
              ELSE lower(o_orderstatus) END AS tok
  FROM orders WHERE o_orderkey % 97 = 11
),
anch AS (
  SELECT *,
    (make_date(year(d), 1, 1)
      + ((7 - dayofweek(make_date(year(d), 1, 1))) % 7)
        * INTERVAL 1 DAY)::date AS fs,
    (make_date(year(d) - 1, 1, 1)
      + ((7 - dayofweek(make_date(year(d) - 1, 1, 1))) % 7)
        * INTERVAL 1 DAY)::date AS fsp,
    date_trunc('week', make_date(year(d), 1, 4))::date AS m1
  FROM src
)
SELECT k,
  CAST(CASE WHEN d >= fs THEN date_diff('day', fs, d) // 7 + 1
       ELSE 0 END AS int) AS w0,
  CAST(CASE WHEN d >= m1 THEN date_diff('day', m1, d) // 7 + 1
       ELSE 0 END AS int) AS w1,
  CAST(CASE WHEN d >= fs THEN date_diff('day', fs, d) // 7 + 1
       ELSE date_diff('day', fsp, d) // 7 + 1 END AS int) AS w2,
  CAST(CASE WHEN d >= fs
       THEN year(d) * 100 + date_diff('day', fs, d) // 7 + 1
       ELSE (year(d) - 1) * 100 + date_diff('day', fsp, d) // 7 + 1
       END AS int) AS yw0,
  CAST(isoyear(d) * 100 + week(d) AS int) AS yw1,
  CAST(CASE WHEN d >= fs
       THEN year(d) * 100 + date_diff('day', fs, d) // 7 + 1
       ELSE (year(d) - 1) * 100 + date_diff('day', fsp, d) // 7 + 1
       END AS int) AS yw2,
  CAST(0 AS int) AS dv_i,
  CAST(NULL AS varchar) AS dv_ns,
  CAST(0.0 AS double) AS dv_d,
  (k % 3 = 1) AS ht,
  (k % 3 IN (1, 2)) AS hti
FROM anch
ORDER BY k
"""


# ---------------------------------------------------------------------------
# Battery 23 (round 10) — CH BYTE string semantics on non-ASCII data:
# bare length/position/left/right count BYTES, upper/lower fold ASCII
# only (UTF8-suffixed forms are the character/Unicode ones). The rows
# carry mixed ASCII + Cyrillic text so the byte/char distinction is
# load-bearing, not coincidental; byte cut points land on ASCII
# regions so both engines decode cleanly (mid-codepoint cuts are
# pinned as documented drift in unit tests, not here).
# ---------------------------------------------------------------------------

_DIALECT23_CH_SQL = """
select k,
  length(s) as blen, lengthUTF8(s) as clen,
  position(s, 'ы') as bpos, positionUTF8(s, 'ы') as cpos,
  position(s, '-', 5) as bpos3,
  positionCaseInsensitive(s, 'QT') as cipos,
  upper(s) as aup,
  lower(upperUTF8(s)) as alow,
  left(s, 5) as bleft, right(s, 4) as bright,
  leftUTF8(s, -2) as cleftn, rightUTF8(s, -2) as crightn
from (
  select o_orderkey as k,
         concat('Qty-', toString(o_orderkey % 50), '-зыбь-',
                o_orderpriority) as s
  from orders
  where o_orderkey % 131 = 17
)
order by k
"""


def calc_dialect23_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Battery 23 as STORED CH-dialect text through translate_ch_sql.

    The DuckDB oracle computes byte semantics explicitly —
    octet_length over encode(), byte positions via encoded prefixes,
    byte slices decoded back — and ASCII-only folds via translate();
    DuckDB's native length/strpos/upper are the character/Unicode
    forms, so agreement is a genuine two-implementation check of the
    byte arithmetic, not an echo."""
    from ora_ch_spark.functions.dialect import translate_ch_sql
    from ora_ch_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(translate_ch_sql(_DIALECT23_CH_SQL)).orderBy("k")


DIALECT23_ORACLE = """
WITH src AS (
  SELECT o_orderkey AS k,
         'Qty-' || cast(o_orderkey % 50 as varchar) || '-зыбь-'
           || o_orderpriority AS s
  FROM orders WHERE o_orderkey % 131 = 17
)
SELECT k,
  cast(octet_length(encode(s)) as bigint) AS blen,
  cast(length(s) as int) AS clen,
  CAST(CASE WHEN strpos(s, 'ы') = 0 THEN 0
       ELSE octet_length(encode(substring(s, 1, strpos(s, 'ы') - 1))) + 1
       END AS int) AS bpos,
  cast(strpos(s, 'ы') as int) AS cpos,
  CAST(CASE WHEN strpos(decode(unhex(substring(hex(encode(s)), 9,
              2 * octet_length(encode(s))))), '-') = 0 THEN 0
       ELSE 4 + octet_length(encode(substring(
              decode(unhex(substring(hex(encode(s)), 9,
                     2 * octet_length(encode(s))))),
              1,
              strpos(decode(unhex(substring(hex(encode(s)), 9,
                     2 * octet_length(encode(s))))), '-') - 1))) + 1
       END AS int) AS bpos3,
  CAST(CASE WHEN strpos(translate(s,
            'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'),
            'qt') = 0 THEN 0
       ELSE octet_length(encode(substring(s, 1, strpos(translate(s,
            'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'),
            'qt') - 1))) + 1 END AS int) AS cipos,
  translate(s, 'abcdefghijklmnopqrstuvwxyz',
               'ABCDEFGHIJKLMNOPQRSTUVWXYZ') AS aup,
  translate(upper(s), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                      'abcdefghijklmnopqrstuvwxyz') AS alow,
  decode(unhex(substring(hex(encode(s)), 1, 10))) AS bleft,
  decode(unhex(substring(hex(encode(s)),
               2 * octet_length(encode(s)) - 7, 8))) AS bright,
  substring(s, 1, length(s) - 2) AS cleftn,
  substring(s, 3) AS crightn
FROM src
ORDER BY k
"""


# ---------------------------------------------------------------------------
# Battery 24 (round 10) — name-collision audit surface, value-gated:
# raw-byte digests via hex round-trips (CH MD5/SHA* return FixedString
# bytes; the idiomatic lower(hex(MD5(s))) must equal the engine's hex
# digest), numeric trunc, interval addDate/subDate, timeSlots epoch
# grids, and deltaSum under a defining ORDER BY (positive-delta fold,
# CH counter-reset semantics). rand()/rand64() are nondeterministic by
# contract and stay unit-pinned (range checks) rather than hash-gated.
# ---------------------------------------------------------------------------

_DIALECT24_CH_SQL = """
select k,
  lower(hex(MD5(s))) as m5,
  hex(SHA256(s)) as s256,
  length(MD5(s)) as dlen,
  trunc(o_totalprice / 7, 2) as tr,
  toDateTime(addDate(d, INTERVAL 1 MONTH)) as ad,
  toDateTime(subDate(d, INTERVAL 3 DAY)) as sd,
  arrayStringConcat(arrayMap(x -> toString(x),
      timeSlots(toDateTime(d), 3600, 1800)), '|') as slots,
  ds
from (
  select o_orderkey as k,
         concat(o_orderpriority, '-', toString(o_orderkey)) as s,
         toDate(o_orderdate) as d,
         o_totalprice
  from orders where o_orderkey % 151 = 19
)
cross join (
  select round(deltaSum(v), 4) as ds
  from (
    select toFloat64(o_totalprice % 997) as v, o_orderkey as kk
    from orders where o_orderkey % 211 = 5
    order by kk
  )
) m
order by k
"""


def calc_dialect24_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Battery 24 as STORED CH-dialect text through translate_ch_sql.

    The digest columns replay natively in DuckDB (its md5()/sha256()
    return hex strings — exactly what hex(raw digest) must equal);
    deltaSum replays as a lag window (sum of positive adjacent
    deltas); timeSlots as a generate_series epoch grid."""
    from ora_ch_spark.functions.dialect import translate_ch_sql
    from ora_ch_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(translate_ch_sql(_DIALECT24_CH_SQL)).orderBy("k")


DIALECT24_ORACLE = """
WITH src AS (
  SELECT o_orderkey AS k,
         o_orderpriority || '-' || cast(o_orderkey as varchar) AS s,
         o_orderdate::date AS d,
         o_totalprice
  FROM orders WHERE o_orderkey % 151 = 19
),
delta_src AS (
  SELECT cast(o_totalprice % 997 as double) AS v, o_orderkey AS kk
  FROM orders WHERE o_orderkey % 211 = 5
),
m AS (
  SELECT round(cast(sum(greatest(v - pv, 0)) as double), 4) AS ds
  FROM (SELECT v, lag(v) OVER (ORDER BY kk) AS pv FROM delta_src)
  WHERE pv IS NOT NULL
)
SELECT k,
  md5(s) AS m5,
  upper(sha256(s)) AS s256,
  cast(16 as bigint) AS dlen,
  cast(trunc(o_totalprice / 7 * 100) / 100 as double) AS tr,
  (d + INTERVAL 1 MONTH)::timestamp AS ad,
  (d - INTERVAL 3 DAY)::timestamp AS sd,
  array_to_string(list_transform(generate_series(
      d::timestamp, d::timestamp + INTERVAL 60 MINUTE,
      INTERVAL 30 MINUTE),
      x -> strftime(x, '%Y-%m-%d %H:%M:%S')), '|') AS slots,
  ds
FROM src CROSS JOIN m
ORDER BY k
"""


# ---------------------------------------------------------------------------
# NULLS-LAST ordering entry (round 10) — the CH ORDER BY default
# (values, then NULL) drives a LIMIT: without the translated NULLS
# LAST modifier, Spark's ASC NULLS-FIRST default returns the NULL-key
# rows instead of the smallest values. DuckDB's own default matches
# ClickHouse (NULL largest), so the oracle is the untouched query.
# ---------------------------------------------------------------------------

_NULLS_ORDER_CH_SQL = """
select k, nk
from (
  select o_orderkey as k,
         if(o_orderkey % 7 = 0, NULL, o_orderkey % 100) as nk
  from orders
  where o_orderkey % 13 = 3
)
order by nk, k
limit 25
"""


def calc_nulls_order_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH NULLS-LAST ordering under LIMIT as STORED text."""
    from ora_ch_spark.functions.dialect import translate_ch_sql
    from ora_ch_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(translate_ch_sql(_NULLS_ORDER_CH_SQL))


NULLS_ORDER_ORACLE = """
SELECT k, nk
FROM (
  SELECT o_orderkey AS k,
         CASE WHEN o_orderkey % 7 = 0 THEN NULL
              ELSE o_orderkey % 100 END AS nk
  FROM orders WHERE o_orderkey % 13 = 3
)
ORDER BY nk, k
LIMIT 25
"""


# ---------------------------------------------------------------------------
# Battery 25 (round 10) — alias visibility + raw-byte reinterpret:
# (1) ClickHouse resolves SELECT-list aliases in WHERE and GROUP BY
#     with alias-over-column preference (prefer_column_name_to_alias
#     = 0). Spark can't resolve an alias in WHERE at all, and in
#     GROUP BY a conflicted name binds the SOURCE column — grouping
#     at raw grain instead of alias grain, silently. The translator
#     inlines the aliased expressions; this battery value-gates both
#     clauses, including the same-name shadow (`intDiv(o_orderkey,
#     1000) AS o_orderkey … WHERE o_orderkey % 3 = 1 GROUP BY
#     o_orderkey` must see ~tens of bucket groups, not thousands of
#     raw keys).
# (2) reinterpretAs[U]Int{8,16,64} little-endian byte reads. The
#     DuckDB oracle folds hex byte pairs with list_reduce — genuinely
#     independent arithmetic from the emitted conv(reversed-hex) path.
# ---------------------------------------------------------------------------

_DIALECT25_CH_SQL = """
select b.k as k, b.p as p,
  reinterpretAsUInt64(b.p) as r64,
  reinterpretAsUInt16(b.p) as r16,
  reinterpretAsInt8(b.c) as r8,
  a.ngroups as ngroups, a.gsum as gsum
from (
  select o_orderkey as k, o_orderpriority as p, o_orderstatus as c,
         substring(o_orderpriority, 3, 1) as tag
  from orders
  where o_orderkey % 97 = 11 and tag in ('U', 'H', 'M')
) b
cross join (
  select count() as ngroups, toFloat64(round(sum(tp), 2)) as gsum
  from (
    select intDiv(o_orderkey, 1000) as o_orderkey,
           sum(o_totalprice) as tp
    from orders
    where o_orderkey % 3 = 1
    group by o_orderkey
  )
) a
order by k
"""


def calc_dialect25_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Battery 25 as STORED CH-dialect text through translate_ch_sql."""
    from ora_ch_spark.functions.dialect import translate_ch_sql
    from ora_ch_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(translate_ch_sql(_DIALECT25_CH_SQL))


DIALECT25_ORACLE = """
WITH b AS (
  SELECT o_orderkey AS k, o_orderpriority AS p, o_orderstatus AS c
  FROM orders
  WHERE o_orderkey % 97 = 11
    AND substring(o_orderpriority, 3, 1) IN ('U', 'H', 'M')
),
a AS (
  SELECT count(*) AS ngroups,
         CAST(round(sum(tp), 2) AS DOUBLE) AS gsum
  FROM (
    SELECT (o_orderkey // 1000) AS g, sum(o_totalprice) AS tp
    FROM orders
    WHERE (o_orderkey // 1000) % 3 = 1
    GROUP BY g
  )
),
bytesrc AS (
  SELECT k, p, c,
    [((strpos('0123456789ABCDEF', substr(hp, 2*i-1, 1)) - 1) * 16
      + strpos('0123456789ABCDEF', substr(hp, 2*i, 1)) - 1)::HUGEINT
     FOR i IN range(1, 9)] AS pl,
    ((strpos('0123456789ABCDEF', substr(hc, 1, 1)) - 1) * 16
      + strpos('0123456789ABCDEF', substr(hc, 2, 1)) - 1)::BIGINT AS cb1
  FROM (
    SELECT k, p, c,
      rpad(substring(hex(encode(p)), 1, 16), 16, '0') AS hp,
      rpad(substring(hex(encode(c)), 1, 2), 2, '0') AS hc
    FROM b
  )
)
SELECT k, p,
  CASE WHEN u >= 9223372036854775808::HUGEINT
       THEN (u - 18446744073709551616::HUGEINT)::BIGINT
       ELSE u::BIGINT END AS r64,
  (pb2 * 256 + pb1)::INT AS r16,
  (CASE WHEN cb1 >= 128 THEN cb1 - 256 ELSE cb1 END)::INT AS r8,
  a.ngroups AS ngroups, a.gsum AS gsum
FROM (
  SELECT k, p, cb1,
    list_reduce(list_reverse(pl), (acc, x) -> acc * 256 + x) AS u,
    pl[1]::BIGINT AS pb1, pl[2]::BIGINT AS pb2
  FROM bytesrc
) CROSS JOIN a
ORDER BY k
"""


# ---------------------------------------------------------------------------
# Battery 26 (round 10; modes 8/9 added r13) — batches 26-28 through
# the driver gate: MySQL week modes 4/6/7 (+ YEARWEEK 4/7) and the
# CH-only NEWYEAR_DAY modes 8/9 against a DuckDB replay of the
# anchor arithmetic (Sunday-start-of-Jan-4's-week / first-Monday /
# week-containing-Jan-1 anchors, mode-6 forward roll, and the
# modes-8/9 forward roll into next year's week 1 (r14: the source's
# yw.first year reassignment) — the formulas
# themselves are validated against independent ports of MySQL's
# calc_week and CH's toYearWeekOfNewyearMode in test_properties);
# the multiSearch position family; RFC-3986 URL
# codecs (DuckDB oracle uses closed-form replaces — the inputs'
# only non-unreserved char is the space); arrayReduce closed forms;
# quoteMeta (only '-' is meta in the priority strings).
# ---------------------------------------------------------------------------

_DIALECT26_CH_SQL = """
select k,
  toWeek(d, 4) as w4, toWeek(d, 6) as w6, toWeek(d, 7) as w7,
  toWeek(d, 8) as w8, toWeek(d, 9) as w9,
  toYearWeek(d, 4) as yw4, toYearWeek(d, 7) as yw7,
  toYearWeek(d, 8) as yw8, toYearWeek(d, 9) as yw9,
  multiSearchFirstIndex(p,
    ['URGENT', 'HIGH', 'MEDIUM', 'LOW', 'NOT SPECIFIED']) as msi,
  multiSearchFirstPosition(p, ['GE', 'IG', 'OW']) as msp,
  encodeURLComponent(concat('q ', p)) as enc,
  decodeURLComponent('a%2Bb%20c') as dec,
  arrayReduce('uniqExact', splitByChar('-', p)) as ue,
  arrayReduce('sum', [toInt64(k % 7), 2, 3]) as ars,
  quoteMeta(p) as qm
from (
  select o_orderkey as k, toDate(o_orderdate) as d, o_orderpriority as p
  from orders where o_orderkey % 131 = 7
)
order by k
"""


def calc_dialect26_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Battery 26 as STORED CH-dialect text through translate_ch_sql."""
    from ora_ch_spark.functions.dialect import translate_ch_sql
    from ora_ch_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(translate_ch_sql(_DIALECT26_CH_SQL))


DIALECT26_ORACLE = """
WITH src AS (
  SELECT o_orderkey AS k, o_orderdate::date AS d, o_orderpriority AS p,
         year(o_orderdate::date) AS y
  FROM orders WHERE o_orderkey % 131 = 7
),
a AS (
  SELECT *,
    (make_date(y, 1, 4) - dayofweek(make_date(y, 1, 4))::int) AS s4,
    (make_date(y + 1, 1, 4)
       - dayofweek(make_date(y + 1, 1, 4))::int) AS s4n,
    (make_date(y - 1, 1, 4)
       - dayofweek(make_date(y - 1, 1, 4))::int) AS s4p,
    (make_date(y, 1, 1)
       + ((8 - isodow(make_date(y, 1, 1))) % 7)::int) AS fm,
    (make_date(y - 1, 1, 1)
       + ((8 - isodow(make_date(y - 1, 1, 1))) % 7)::int) AS fmp,
    (make_date(y, 1, 1)
       - dayofweek(make_date(y, 1, 1))::int) AS ny8,
    (make_date(y, 1, 1)
       - (isodow(make_date(y, 1, 1)) - 1)::int) AS ny9,
    (make_date(y + 1, 1, 1)
       - dayofweek(make_date(y + 1, 1, 1))::int) AS ny8n,
    (make_date(y + 1, 1, 1)
       - (isodow(make_date(y + 1, 1, 1)) - 1)::int) AS ny9n,
    [strpos(p, 'URGENT'), strpos(p, 'HIGH'), strpos(p, 'MEDIUM'),
     strpos(p, 'LOW'), strpos(p, 'NOT SPECIFIED')] AS msl,
    [strpos(p, 'GE'), strpos(p, 'IG'), strpos(p, 'OW')] AS mpl
  FROM src
)
SELECT k,
  (CASE WHEN d >= s4 THEN datediff('day', s4, d) // 7 + 1
        ELSE 0 END)::INT AS w4,
  (CASE WHEN d >= s4n THEN 1
        WHEN d >= s4 THEN datediff('day', s4, d) // 7 + 1
        ELSE datediff('day', s4p, d) // 7 + 1 END)::INT AS w6,
  (CASE WHEN d >= fm THEN datediff('day', fm, d) // 7 + 1
        ELSE datediff('day', fmp, d) // 7 + 1 END)::INT AS w7,
  (CASE WHEN d >= ny8n THEN 1
        ELSE datediff('day', ny8, d) // 7 + 1 END)::INT AS w8,
  (CASE WHEN d >= ny9n THEN 1
        ELSE datediff('day', ny9, d) // 7 + 1 END)::INT AS w9,
  (CASE WHEN d >= ny8n THEN (y + 1) * 100 + 1
        ELSE y * 100 + datediff('day', ny8, d) // 7 + 1 END)::INT AS yw8,
  (CASE WHEN d >= ny9n THEN (y + 1) * 100 + 1
        ELSE y * 100 + datediff('day', ny9, d) // 7 + 1 END)::INT AS yw9,
  (CASE WHEN d >= s4n THEN (y + 1) * 100 + 1
        WHEN d >= s4 THEN y * 100 + datediff('day', s4, d) // 7 + 1
        ELSE (y - 1) * 100 + datediff('day', s4p, d) // 7 + 1
        END)::INT AS yw4,
  (CASE WHEN d >= fm THEN y * 100 + datediff('day', fm, d) // 7 + 1
        ELSE (y - 1) * 100 + datediff('day', fmp, d) // 7 + 1
        END)::INT AS yw7,
  coalesce(list_position(msl,
      list_min(list_filter(msl, x -> x > 0))), 0)::BIGINT AS msi,
  coalesce(list_min(list_filter(mpl, x -> x > 0)), 0)::INT AS msp,
  replace('q ' || p, ' ', '%20') AS enc,
  'a+b c' AS dec,
  len(list_distinct(string_split(p, '-')))::BIGINT AS ue,
  ((k % 7) + 5)::DOUBLE AS ars,
  replace(p, '-', '\\-') AS qm
FROM a
ORDER BY k
"""


# ---------------------------------------------------------------------------
# Battery 27 (round 10) — the formatDateTime token walker against
# DuckDB's strftime: the SAME %-token semantics implemented by an
# independent engine (C-locale English names, zero-padded %j, %p
# markers). Tokens restricted to the C-strftime intersection; CH's
# %i (minute) maps to DuckDB's %M. A timestamp with second grain is
# synthesized per row so the time-of-day tokens vary.
# ---------------------------------------------------------------------------

_DIALECT27_CH_SQL = """
select k,
  formatDateTime(ts, '%a %b %d %Y %H:%i:%S %p %j %y %I %m') as f1,
  formatDateTime(ts, '%Y-%m-%dT%H:%i:%S') as f2,
  formatDateTime(ts, '%T / %F / %R') as f3,
  parseDateTime(formatDateTime(ts, '%d %b %Y'), '%d %b %Y') as rt
from (
  select o_orderkey as k,
         addSeconds(toDateTime(o_orderdate), o_orderkey % 86399) as ts
  from orders where o_orderkey % 149 = 11
)
order by k
"""


def calc_dialect27_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Battery 27 as STORED CH-dialect text through translate_ch_sql."""
    from ora_ch_spark.functions.dialect import translate_ch_sql
    from ora_ch_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(translate_ch_sql(_DIALECT27_CH_SQL))


DIALECT27_ORACLE = """
SELECT o_orderkey AS k,
  strftime(ts, '%a %b %d %Y %H:%M:%S %p %j %y %I %m') AS f1,
  strftime(ts, '%Y-%m-%dT%H:%M:%S') AS f2,
  strftime(ts, '%H:%M:%S / %Y-%m-%d / %H:%M') AS f3,
  date_trunc('day', ts)::timestamp AS rt
FROM (
  SELECT o_orderkey,
         o_orderdate::timestamp
           + (o_orderkey % 86399) * INTERVAL 1 SECOND AS ts
  FROM orders WHERE o_orderkey % 149 = 11
)
ORDER BY k
"""


# ---------------------------------------------------------------------------
# Byte-strings battery (round 11) — the opt-in CH byte-semantics mode
# (`translate_ch_sql(byte_strings=True)`) over MULTI-BYTE inputs:
# bare substring/substr slice bytes (positive and negative offsets,
# mid-code-point edges carried through raw), bare reverse()
# byte-reverses, length() counts bytes, lengthUTF8() characters.
# Outputs are hex-encoded so mid-code-point byte sequences stay
# hash-comparable. The DuckDB oracle slices the hex encoding of the
# UTF-8 bytes directly (2 hex chars per byte) and rebuilds the byte
# reverse with a bounded generate_series fold — an independent byte-
# level replay. Closes the dialect header's documented
# ASCII-coincident drift (r10 verdict item 2).
# ---------------------------------------------------------------------------

_DIALECT_BYTE_CH_SQL = """
select k,
  hex(substring(s, 3, 7)) as bs1,
  hex(substring(s, -5, 4)) as bs2,
  hex(substring(s, 5)) as bs3,
  hex(reverse(s)) as brev,
  toInt64(lengthUTF8(s)) as lc,
  toInt64(length(s)) as lb
from (
  select o_orderkey as k,
         concat('прив', o_orderpriority, 'étλ') as s
  from orders where o_orderkey % 211 = 3
)
order by k
"""


def calc_dialect_byte_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-mode battery as STORED CH-dialect text through
    translate_ch_sql(byte_strings=True)."""
    from ora_ch_spark.functions.dialect import translate_ch_sql
    from ora_ch_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(translate_ch_sql(_DIALECT_BYTE_CH_SQL, byte_strings=True))


DIALECT_BYTE_ORACLE = """
WITH src AS (
  SELECT o_orderkey AS k, 'прив' || o_orderpriority || 'étλ' AS s
  FROM orders WHERE o_orderkey % 211 = 3
),
h AS (
  SELECT k, hex(encode(s)) AS hx, octet_length(encode(s)) AS n,
         length(s) AS lc
  FROM src
),
rev AS (
  SELECT k, string_agg(substr(hx, 2 * i - 1, 2), '' ORDER BY i DESC) AS brev
  FROM h CROSS JOIN generate_series(1, 64) t(i)
  WHERE i <= n
  GROUP BY k
)
SELECT h.k,
  substr(hx, 2 * 3 - 1, 2 * 7) AS bs1,
  substr(hx, 2 * (n - 5 + 1) - 1, 2 * 4) AS bs2,
  substr(hx, 2 * 5 - 1, 2 * (n - 4)) AS bs3,
  rev.brev AS brev,
  lc::BIGINT AS lc,
  n::BIGINT AS lb
FROM h JOIN rev USING (k)
ORDER BY h.k
"""


# ---------------------------------------------------------------------------
# Bare INTERSECT/EXCEPT duplicate semantics (round 11) — CH's bare
# forms are a right-side hash-set FILTER over the left branch (left
# multiplicity preserved on membership, NULLs compare equal), which
# matches neither Spark's DISTINCT default nor ANSI ALL's
# min-multiplicity. The translator rewrites them onto a positional
# 96-bit row fingerprint (_rewrite_bare_set_ops); this battery proves
# the multiplicity arithmetic on duplicate-bearing, NULL-bearing
# branches with DIFFERENT column names (positional matching), vs a
# DuckDB replay of the filter via IS NOT DISTINCT FROM EXISTS.
# ---------------------------------------------------------------------------

_SET_OPS_DUP_CH_SQL = """
select 'i' as op, p, st, toInt64(count(*)) as n from (
  select o_orderpriority as p,
         if(o_orderkey % 7 = 0, NULL, o_orderstatus) as st
  from orders where o_orderkey % 13 < 4
  intersect
  select o_orderpriority as p2,
         if(o_orderkey % 5 = 0, NULL, o_orderstatus) as st2
  from orders where o_orderkey % 17 < 3
) group by p, st
union all
select 'e' as op, p, st, toInt64(count(*)) as n from (
  select o_orderpriority as p,
         if(o_orderkey % 7 = 0, NULL, o_orderstatus) as st
  from orders where o_orderkey % 13 < 4
  except
  select o_orderpriority as p2,
         if(o_orderkey % 5 = 0, NULL, o_orderstatus) as st2
  from orders where o_orderkey % 17 < 3
) group by p, st
union all
select 'c' as op, p, st, toInt64(count(*)) as n from (
  select o_orderpriority as p,
         if(o_orderkey % 7 = 0, NULL, o_orderstatus) as st
  from orders where o_orderkey % 13 < 4
  intersect
  select o_orderpriority as p2,
         if(o_orderkey % 5 = 0, NULL, o_orderstatus) as st2
  from orders where o_orderkey % 17 < 3
  except
  select o_orderpriority as p3,
         if(o_orderkey % 11 = 0, NULL, o_orderstatus) as st3
  from orders where o_orderkey % 23 < 2
) group by p, st
union all
select 'u' as op, p, st, toInt64(count(*)) as n from (
  select o_orderpriority as p,
         if(o_orderkey % 7 = 0, NULL, o_orderstatus) as st
  from orders where o_orderkey % 13 < 4
  intersect
  select o_orderpriority as p2,
         if(o_orderkey % 5 = 0, NULL, o_orderstatus) as st2
  from orders where o_orderkey % 17 < 3
  union all
  select o_orderpriority as p3,
         if(o_orderkey % 11 = 0, NULL, o_orderstatus) as st3
  from orders where o_orderkey % 23 < 2
) group by p, st
union all
select 'x' as op, p, st, toInt64(count(*)) as n from (
  select o_orderpriority as p,
         if(o_orderkey % 7 = 0, NULL, o_orderstatus) as st
  from orders where o_orderkey % 13 < 4
  intersect all
  select o_orderpriority as p2,
         if(o_orderkey % 5 = 0, NULL, o_orderstatus) as st2
  from orders where o_orderkey % 17 < 3
  except
  select o_orderpriority as p3,
         if(o_orderkey % 11 = 0, NULL, o_orderstatus) as st3
  from orders where o_orderkey % 23 < 2
) group by p, st
order by op, p, st
"""


def calc_set_ops_dup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bare-set-op battery as STORED CH-dialect text through
    translate_ch_sql."""
    from ora_ch_spark.functions.dialect import translate_ch_sql
    from ora_ch_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(translate_ch_sql(_SET_OPS_DUP_CH_SQL))


SET_OPS_DUP_ORACLE = """
WITH A AS (
  SELECT o_orderpriority AS p,
         CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderstatus END AS st
  FROM orders WHERE o_orderkey % 13 < 4
),
B AS (
  SELECT o_orderpriority AS p,
         CASE WHEN o_orderkey % 5 = 0 THEN NULL ELSE o_orderstatus END AS st
  FROM orders WHERE o_orderkey % 17 < 3
),
C AS (
  SELECT o_orderpriority AS p,
         CASE WHEN o_orderkey % 11 = 0 THEN NULL ELSE o_orderstatus END AS st
  FROM orders WHERE o_orderkey % 23 < 2
)
SELECT 'i' AS op, p, st, count(*)::BIGINT AS n
FROM A WHERE EXISTS (
  SELECT 1 FROM B WHERE B.p IS NOT DISTINCT FROM A.p
                    AND B.st IS NOT DISTINCT FROM A.st)
GROUP BY p, st
UNION ALL
SELECT 'e' AS op, p, st, count(*)::BIGINT AS n
FROM A WHERE NOT EXISTS (
  SELECT 1 FROM B WHERE B.p IS NOT DISTINCT FROM A.p
                    AND B.st IS NOT DISTINCT FROM A.st)
GROUP BY p, st
UNION ALL
-- chain arm: A INTERSECT B EXCEPT C under CH precedence =
-- (A ∩filter B) \filter C, left multiplicity preserved throughout
SELECT 'c' AS op, p, st, count(*)::BIGINT AS n
FROM A WHERE EXISTS (
  SELECT 1 FROM B WHERE B.p IS NOT DISTINCT FROM A.p
                    AND B.st IS NOT DISTINCT FROM A.st)
  AND NOT EXISTS (
  SELECT 1 FROM C WHERE C.p IS NOT DISTINCT FROM A.p
                    AND C.st IS NOT DISTINCT FROM A.st)
GROUP BY p, st
UNION ALL
-- mixed-chain arm (r12): A INTERSECT B UNION ALL C — bare INTERSECT
-- binds tighter, so (A ∩filter B) ∪all C; the UNION leg is native
SELECT 'u' AS op, p, st, count(*)::BIGINT AS n
FROM (
  SELECT p, st FROM A WHERE EXISTS (
    SELECT 1 FROM B WHERE B.p IS NOT DISTINCT FROM A.p
                      AND B.st IS NOT DISTINCT FROM A.st)
  UNION ALL
  SELECT p, st FROM C
) u
GROUP BY p, st
UNION ALL
-- mixed-chain arm (r12): A INTERSECT ALL B EXCEPT C — the explicit
-- ALL leg keeps ANSI min-multiplicity (native both engines), then
-- the bare EXCEPT hash-set-filters the whole prefix
SELECT 'x' AS op, p, st, count(*)::BIGINT AS n
FROM (
  SELECT * FROM
    (SELECT p, st FROM A INTERSECT ALL SELECT p, st FROM B) iab
  WHERE NOT EXISTS (
    SELECT 1 FROM C WHERE C.p IS NOT DISTINCT FROM iab.p
                      AND C.st IS NOT DISTINCT FROM iab.st)
) x
GROUP BY p, st
ORDER BY op, p, st
"""


# ---------------------------------------------------------------------------
# Dynamic (per-row) timezone forms (round 12, verdict item 7) — the
# tz argument of parseDateTime / parseDateTimeBestEffort /
# formatDateTime as a COLUMN, not a constant. Spark's
# to_utc_timestamp / convert_timezone accept per-row zone expressions
# (SPARK-23715), so the constant-tz emissions generalize verbatim;
# the oracle replays via DuckDB's timezone() with epoch()/strftime
# projections, which are session-timezone-independent on both sides.
# ---------------------------------------------------------------------------

_DIALECT_TZ_DYNAMIC_CH_SQL = """
select k, tz,
  toInt64(toUnixTimestamp(parseDateTime('2020-03-01 10:00:00',
      '%Y-%m-%d %H:%i:%S', tz))) as p_epoch,
  toInt64(toUnixTimestamp(parseDateTimeBestEffort('2021-07-15 08:30:00',
      tz))) as be_epoch,
  formatDateTime(toDateTime('2020-03-01 10:00:00'), '%Y-%m-%d %H:%i', tz) as f
from (
  select o_orderkey as k,
         if(o_orderkey % 3 = 0, 'Europe/Moscow',
            if(o_orderkey % 3 = 1, 'UTC', 'Asia/Tokyo')) as tz
  from orders where o_orderkey % 97 = 0
)
order by k
"""


def calc_dialect_tz_dynamic_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-tz battery as STORED CH-dialect text through
    translate_ch_sql."""
    from ora_ch_spark.functions.dialect import translate_ch_sql
    from ora_ch_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(translate_ch_sql(_DIALECT_TZ_DYNAMIC_CH_SQL))


DIALECT_TZ_DYNAMIC_ORACLE = """
WITH src AS (
  SELECT o_orderkey AS k,
         CASE WHEN o_orderkey % 3 = 0 THEN 'Europe/Moscow'
              WHEN o_orderkey % 3 = 1 THEN 'UTC'
              ELSE 'Asia/Tokyo' END AS tz
  FROM orders WHERE o_orderkey % 97 = 0
)
SELECT k, tz,
  epoch(timezone(tz, TIMESTAMP '2020-03-01 10:00:00'))::BIGINT AS p_epoch,
  epoch(timezone(tz, TIMESTAMP '2021-07-15 08:30:00'))::BIGINT AS be_epoch,
  strftime(timezone(tz, timezone('UTC', TIMESTAMP '2020-03-01 10:00:00')),
           '%Y-%m-%d %H:%M') AS f
FROM src ORDER BY k
"""


# ---------------------------------------------------------------------------
# Parse-once JSON companion (round 11, verdict item 9) — the SAME
# result table as calc_json_dynamic, written the way a user SHOULD at
# scale: ONE from_json(props, 'map<string,string>') per row, reused
# by every aggregate, instead of the pinned form's ~8 independent
# JSON parses per row (several over concat-wrapped copies of the
# string, which can never share a parse). The repeated element_at
# over the single typed map collapses to one parse under codegen
# subexpression elimination — measured ≥4x faster than the pinned
# form at sf0.1. The pinned entry stays as the translator-semantics
# gate; this entry documents the efficient shape.
# ---------------------------------------------------------------------------

def calc_json_parse_once_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ora_ch_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT kg,
          cast(count(CASE WHEN element_at(pm, kk) IS NOT NULL THEN 1 END)
               as bigint) AS n_has,
          cast(max(cast(element_at(pm, kk) as bigint)) as bigint) AS mx,
          max(element_at(pm, kk)) AS mxs,
          cast(max(cast(element_at(pm, 'k') as bigint)) as bigint)
            AS nested_mx,
          cast(max(cast(element_at(pm, kk) as bigint)) as bigint)
            AS dyn_tail_mx,
          cast(max(CASE WHEN kq = 'q'
                        THEN cast(element_at(pm, 'k') as bigint) END)
               as bigint) AS dyn_head_mx,
          cast(count(CASE WHEN element_at(pm, kk) IS NOT NULL THEN 1 END)
               as bigint) AS dyn_has
        FROM (
          SELECT from_json(props, 'map<string,string>') AS pm,
                 if(event_id % 3 = 0, 'k', 'missing') AS kk,
                 if(event_id % 4 = 0, 'q', 'absent') AS kq,
                 if(event_id % 3 = 0, 'hit', 'miss') AS kg
          FROM events
        )
        GROUP BY kg
        ORDER BY kg
    """)


# identical values to the pinned form — the companion's oracle is the
# same replay (the '{"w":…}' wrappers reduce to top-level '$.k' paths)
JSON_PARSE_ONCE_ORACLE = JSON_DYNAMIC_ORACLE
