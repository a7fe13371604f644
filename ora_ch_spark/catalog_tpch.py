"""TPC-H-shape suite as STORED CH-DIALECT SQL through the full calc
text path (``bind_params`` → ``translate_ch_sql`` → ``spark.sql``).

The reference's extension point is arbitrary stored ClickHouse SQL
text (``ora/jdbcSession.scala:199-247`` reads the query body from a
table; ``clickhouse/jdbsChSession.scala:712-743`` splices typed
``{name:Type}`` params) — so the translator must hold up on query
shapes its author did NOT write. This module ports the classic TPC-H
query suite (adapted to the synthetic schema: no
l_commitdate/l_receiptdate/l_shipmode columns; q2/q11 and the true
q16/q20 forms run over a deterministically SYNTHESIZED partsupp CTE —
see the partsupp suite section below) as externally-shaped
CH-dialect text: correlated EXISTS / NOT EXISTS pairs, correlated
scalar subqueries, IN over GROUP BY … HAVING subqueries, nested IN,
comma joins, CTE + scalar-over-CTE, LIKE, sumIf/countIf, toYear /
toDate / toInterval* arithmetic, and typed-param splices.

Cross-engine determinism follows catalog.py's rules: money sums via
``toDecimal64(x, 2)`` (exact in any order) → ``toFloat64`` at the
end; counts via ``toInt64``; ratios divide two identically-computed
doubles; quantity sums via int64 (integral in the data); LIMIT only
under a total ORDER BY.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ora_ch_spark.catalog import QueryDef
from ora_ch_spark.io import register_views
from ora_ch_spark.specs import ParamType, QueryParam

# Shared revenue expression (CH side / DuckDB side): exact decimal
# product summed, one cast to double at the end.
_REV_CH = ("sum(toDecimal64(l_extendedprice, 2)"
           " * (toDecimal64(1, 2) - toDecimal64(l_discount, 2)))")
_REV_DK = ("sum(cast(l_extendedprice as decimal(18,2))"
           " * (1 - cast(l_discount as decimal(18,2))))")


def _tpch_runner(ch_sql: str, params=(), values=None):
    """Build a catalog callable that runs ``ch_sql`` through the
    stored-text path: typed-param binding, CH→Spark translation, then
    plain ``spark.sql`` over the registered table views — exactly the
    pipeline a stored reference query travels."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from ora_ch_spark.functions.dialect import translate_ch_sql
        from ora_ch_spark.functions.params import bind_params

        register_views(spark, sf_dir)
        bound = bind_params(ch_sql, params, values or {})
        return spark.sql(translate_ch_sql(bound))

    return run


# ---------------------------------------------------------------------------
# Q3 — shipping priority: 3-way join, String param, top-10 under a
# total order
# ---------------------------------------------------------------------------

_Q3_CH = f"""
select l_orderkey,
       toFloat64({_REV_CH}) as revenue,
       o_orderdate
from customer c
join orders o on c.c_custkey = o.o_custkey
join lineitem l on l.l_orderkey = o.o_orderkey
where c_mktsegment = {{seg:String}}
  and o_orderdate < toDate('1997-03-15')
  and l_shipdate > toDate('1997-03-15')
group by l_orderkey, o_orderdate
order by revenue desc, o_orderdate, l_orderkey
limit 10
"""

Q3_ORACLE = f"""
SELECT l_orderkey,
       cast({_REV_DK} as double) AS revenue,
       o_orderdate
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < DATE '1997-03-15'
  AND l_shipdate > DATE '1997-03-15'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""


# ---------------------------------------------------------------------------
# Q4 — order priority: correlated EXISTS + interval arithmetic
# ---------------------------------------------------------------------------

_Q4_CH = """
select o_orderpriority, toInt64(count(*)) as order_count
from orders
where o_orderdate >= toDate('1996-07-01')
  and o_orderdate < toDate('1996-07-01') + toIntervalMonth(3)
  and exists (select 1 from lineitem
              where l_orderkey = o_orderkey and l_shipdate > o_orderdate)
group by o_orderpriority
order by o_orderpriority
"""

Q4_ORACLE = """
SELECT o_orderpriority, cast(count(*) as bigint) AS order_count
FROM orders
WHERE o_orderdate >= DATE '1996-07-01'
  AND o_orderdate < DATE '1996-07-01' + INTERVAL 3 MONTH
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Q5 — local supplier volume: 6-table COMMA JOIN resolved by WHERE
# equalities
# ---------------------------------------------------------------------------

_Q5_CH = f"""
select n_name,
       toFloat64({_REV_CH}) as revenue
from customer, orders, lineitem, supplier, nation, region
where c_custkey = o_custkey and l_orderkey = o_orderkey
  and l_suppkey = s_suppkey and c_nationkey = s_nationkey
  and s_nationkey = n_nationkey and n_regionkey = r_regionkey
  and r_name = 'ASIA'
  and o_orderdate >= toDate('1996-01-01')
  and o_orderdate < toDate('1997-01-01')
group by n_name
order by revenue desc, n_name
"""

Q5_ORACLE = f"""
SELECT n_name,
       cast({_REV_DK} as double) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= DATE '1996-01-01'
  AND o_orderdate < DATE '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


# ---------------------------------------------------------------------------
# Q6 — forecast revenue change: pure scan + BETWEEN filters
# ---------------------------------------------------------------------------

_Q6_CH = """
select toFloat64(sum(toDecimal64(l_extendedprice, 2)
                     * toDecimal64(l_discount, 2))) as revenue
from lineitem
where l_shipdate >= toDate('1996-01-01')
  and l_shipdate < toDate('1997-01-01')
  and l_discount between 0.05 and 0.07
  and l_quantity < 24
"""

Q6_ORACLE = """
SELECT cast(sum(cast(l_extendedprice as decimal(18,2))
              * cast(l_discount as decimal(18,2))) as double) AS revenue
FROM lineitem
WHERE l_shipdate >= DATE '1996-01-01'
  AND l_shipdate < DATE '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


# ---------------------------------------------------------------------------
# Q7 — volume shipping: nation self-join pair, toYear, OR of ANDs in
# the join region
# ---------------------------------------------------------------------------

_Q7_CH = f"""
select supp_nation, cust_nation, l_year, toFloat64(sum(volume)) as revenue
from (
  select n1.n_name as supp_nation, n2.n_name as cust_nation,
         toYear(l_shipdate) as l_year,
         toDecimal64(l_extendedprice, 2)
           * (toDecimal64(1, 2) - toDecimal64(l_discount, 2)) as volume
  from supplier s
  join lineitem l on s.s_suppkey = l.l_suppkey
  join orders o on o.o_orderkey = l.l_orderkey
  join customer c on c.c_custkey = o.o_custkey
  join nation n1 on s.s_nationkey = n1.n_nationkey
  join nation n2 on c.c_nationkey = n2.n_nationkey
  where ((n1.n_name = 'NATION_1' and n2.n_name = 'NATION_2')
      or (n1.n_name = 'NATION_2' and n2.n_name = 'NATION_1'))
    and l_shipdate between toDate('1996-01-01') and toDate('1997-12-31')
)
group by supp_nation, cust_nation, l_year
order by supp_nation, cust_nation, l_year
"""

Q7_ORACLE = f"""
SELECT supp_nation, cust_nation, l_year,
       cast(sum(volume) as double) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         year(l_shipdate) AS l_year,
         cast(l_extendedprice as decimal(18,2))
           * (1 - cast(l_discount as decimal(18,2))) AS volume
  FROM supplier s
  JOIN lineitem l ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l_shipdate BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
)
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


# ---------------------------------------------------------------------------
# Q8 — national market share: sumIf numerator over a 5-join volume
# frame; the share divides two identically-built doubles
# ---------------------------------------------------------------------------

_Q8_CH = """
select o_year,
       toFloat64(sumIf(volume, supp_nation = 'NATION_3')) as nation_volume,
       toFloat64(sum(volume)) as total_volume,
       toFloat64(sumIf(volume, supp_nation = 'NATION_3'))
         / toFloat64(sum(volume)) as mkt_share
from (
  select toYear(o_orderdate) as o_year,
         toDecimal64(l_extendedprice, 2)
           * (toDecimal64(1, 2) - toDecimal64(l_discount, 2)) as volume,
         n2.n_name as supp_nation
  from part p
  join lineitem l on p.p_partkey = l.l_partkey
  join orders o on o.o_orderkey = l.l_orderkey
  join customer c on c.c_custkey = o.o_custkey
  join nation n1 on c.c_nationkey = n1.n_nationkey
  join region r on n1.n_regionkey = r.r_regionkey
  join supplier s on s.s_suppkey = l.l_suppkey
  join nation n2 on s.s_nationkey = n2.n_nationkey
  where r.r_name = 'AMERICA'
    and p.p_type = 'ECONOMY'
    and o_orderdate between toDate('1996-01-01') and toDate('1997-12-31')
)
group by o_year
order by o_year
"""

Q8_ORACLE = """
SELECT o_year,
       cast(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume END)
            as double) AS nation_volume,
       cast(sum(volume) as double) AS total_volume,
       cast(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume END)
            as double)
         / cast(sum(volume) as double) AS mkt_share
FROM (
  SELECT year(o_orderdate) AS o_year,
         cast(l_extendedprice as decimal(18,2))
           * (1 - cast(l_discount as decimal(18,2))) AS volume,
         n2.n_name AS supp_nation
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
  JOIN region r ON n1.n_regionkey = r.r_regionkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
  WHERE r.r_name = 'AMERICA'
    AND p.p_type = 'ECONOMY'
    AND o_orderdate BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
)
GROUP BY o_year
ORDER BY o_year
"""


# ---------------------------------------------------------------------------
# Q9 — product-type volume by supplier nation and year: LIKE on the
# part dimension inside a 5-join star
# ---------------------------------------------------------------------------

_Q9_CH = f"""
select nation, o_year, toFloat64(sum(volume)) as sum_volume
from (
  select n_name as nation, toYear(o_orderdate) as o_year,
         toDecimal64(l_extendedprice, 2)
           * (toDecimal64(1, 2) - toDecimal64(l_discount, 2)) as volume
  from part p
  join lineitem l on p.p_partkey = l.l_partkey
  join supplier s on s.s_suppkey = l.l_suppkey
  join orders o on o.o_orderkey = l.l_orderkey
  join nation n on s.s_nationkey = n.n_nationkey
  where p_name like '%ed%'
)
group by nation, o_year
order by nation, o_year desc
"""

Q9_ORACLE = """
SELECT nation, o_year, cast(sum(volume) as double) AS sum_volume
FROM (
  SELECT n_name AS nation, year(o_orderdate) AS o_year,
         cast(l_extendedprice as decimal(18,2))
           * (1 - cast(l_discount as decimal(18,2))) AS volume
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  WHERE p_name LIKE '%ed%'
)
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
"""


# ---------------------------------------------------------------------------
# Q10 — returned items: 4-way join, wide GROUP BY, top-20 under a
# total order
# ---------------------------------------------------------------------------

_Q10_CH = f"""
select c_custkey, c_name,
       toFloat64({_REV_CH}) as revenue,
       c_acctbal, n_name
from customer c
join orders o on c.c_custkey = o.o_custkey
join lineitem l on l.l_orderkey = o.o_orderkey
join nation n on c.c_nationkey = n.n_nationkey
where o_orderdate >= toDate('1996-10-01')
  and o_orderdate < toDate('1996-10-01') + toIntervalMonth(3)
  and l_returnflag = 'R'
group by c_custkey, c_name, c_acctbal, n_name
order by revenue desc, c_custkey
limit 20
"""

Q10_ORACLE = f"""
SELECT c_custkey, c_name,
       cast({_REV_DK} as double) AS revenue,
       c_acctbal, n_name
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o_orderdate >= DATE '1996-10-01'
  AND o_orderdate < DATE '1996-10-01' + INTERVAL 3 MONTH
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# ---------------------------------------------------------------------------
# Q12 — priority classes per return flag: countIf combinators over a
# join (stands in for the missing l_shipmode dimension)
# ---------------------------------------------------------------------------

_Q12_CH = """
select l_returnflag,
       toInt64(countIf(o_orderpriority in ('1-URGENT', '2-HIGH')))
         as high_line_count,
       toInt64(countIf(o_orderpriority not in ('1-URGENT', '2-HIGH')))
         as low_line_count
from orders
join lineitem on o_orderkey = l_orderkey
where l_shipdate >= toDate('1996-01-01')
  and l_shipdate < toDate('1997-01-01')
group by l_returnflag
order by l_returnflag
"""

Q12_ORACLE = """
SELECT l_returnflag,
       cast(count(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                       THEN 1 END) as bigint) AS high_line_count,
       cast(count(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                       THEN 1 END) as bigint) AS low_line_count
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= DATE '1996-01-01'
  AND l_shipdate < DATE '1997-01-01'
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution: LEFT JOIN with an extra
# NOT LIKE predicate in ON, then a second-level aggregation
# ---------------------------------------------------------------------------

_Q13_CH = """
select c_count, toInt64(count(*)) as custdist
from (
  select c_custkey, toInt64(count(o_orderkey)) as c_count
  from customer
  left join orders on c_custkey = o_custkey
                   and o_orderpriority not like '%LOW%'
  group by c_custkey
)
group by c_count
order by custdist desc, c_count desc
"""

Q13_ORACLE = """
SELECT c_count, cast(count(*) as bigint) AS custdist
FROM (
  SELECT c_custkey, cast(count(o_orderkey) as bigint) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey
                   AND o_orderpriority NOT LIKE '%LOW%'
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# ---------------------------------------------------------------------------
# Q14 — promo revenue: sumIf over LIKE on the part type
# ---------------------------------------------------------------------------

_Q14_CH = """
select toFloat64(sumIf(volume, p_type like 'PROMO%')) as promo_revenue,
       toFloat64(sum(volume)) as total_revenue
from (
  select toDecimal64(l_extendedprice, 2)
           * (toDecimal64(1, 2) - toDecimal64(l_discount, 2)) as volume,
         p_type
  from lineitem
  join part on l_partkey = p_partkey
  where l_shipdate >= toDate('1996-09-01')
    and l_shipdate < toDate('1996-10-01')
)
"""

Q14_ORACLE = """
SELECT cast(sum(CASE WHEN p_type LIKE 'PROMO%' THEN volume END)
            as double) AS promo_revenue,
       cast(sum(volume) as double) AS total_revenue
FROM (
  SELECT cast(l_extendedprice as decimal(18,2))
           * (1 - cast(l_discount as decimal(18,2))) AS volume,
         p_type
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= DATE '1996-09-01'
    AND l_shipdate < DATE '1996-10-01'
)
"""


# ---------------------------------------------------------------------------
# Q15 — top supplier: CTE referenced twice, scalar MAX over the CTE,
# exact-decimal equality join back
# ---------------------------------------------------------------------------

_Q15_CH = f"""
with revenue as (
  select l_suppkey as supplier_no,
         {_REV_CH} as total_revenue
  from lineitem
  where l_shipdate >= toDate('1996-01-01')
    and l_shipdate < toDate('1996-04-01')
  group by l_suppkey
)
select s_suppkey, s_name, toFloat64(total_revenue) as total_revenue
from supplier
join revenue on s_suppkey = supplier_no
where total_revenue = (select max(total_revenue) from revenue)
order by s_suppkey
"""

Q15_ORACLE = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         {_REV_DK} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= DATE '1996-01-01'
    AND l_shipdate < DATE '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, cast(total_revenue as double) AS total_revenue
FROM supplier
JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


# ---------------------------------------------------------------------------
# Q16 — parts/supplier relationship: uniqExact + NOT IN subquery with
# LIKE, IN value list
# ---------------------------------------------------------------------------

_Q16_CH = """
select p_brand, p_type, p_size, toInt64(uniqExact(l_suppkey)) as supplier_cnt
from lineitem
join part on p_partkey = l_partkey
where p_brand <> 'Brand#1'
  and p_size in (1, 5, 10, 15, 20, 25, 30, 35)
  and l_suppkey not in (select s_suppkey from supplier
                        where s_name like '%07')
group by p_brand, p_type, p_size
order by supplier_cnt desc, p_brand, p_type, p_size
limit 20
"""

Q16_ORACLE = """
SELECT p_brand, p_type, p_size,
       cast(count(DISTINCT l_suppkey) as bigint) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1'
  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                        WHERE s_name LIKE '%07')
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
LIMIT 20
"""


# ---------------------------------------------------------------------------
# Q17 — small-quantity orders: correlated SCALAR subquery (per-part
# average) in the WHERE clause; integral doubles make the avg exact
# ---------------------------------------------------------------------------

_Q17_CH = """
select toFloat64(sum(toDecimal64(l_extendedprice, 2))) / 7 as avg_yearly
from lineitem l
join part p on p.p_partkey = l.l_partkey
where p_brand = 'Brand#3'
  and l_quantity < 0.2 * (select avg(l2.l_quantity) from lineitem l2
                          where l2.l_partkey = p.p_partkey)
"""

Q17_ORACLE = """
SELECT cast(sum(cast(l_extendedprice as decimal(18,2))) as double) / 7
         AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p_brand = 'Brand#3'
  AND l_quantity < 0.2 * (SELECT avg(l2.l_quantity) FROM lineitem l2
                          WHERE l2.l_partkey = p.p_partkey)
"""


# ---------------------------------------------------------------------------
# Q18 — large-volume customers: IN over a GROUP BY … HAVING subquery
# ---------------------------------------------------------------------------

_Q18_CH = """
select c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       toInt64(sum(toInt64(l_quantity))) as total_qty
from customer
join orders on c_custkey = o_custkey
join lineitem on o_orderkey = l_orderkey
where o_orderkey in (select l_orderkey from lineitem
                     group by l_orderkey
                     having sum(toInt64(l_quantity)) > 300)
group by c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
order by o_totalprice desc, o_orderdate, o_orderkey
limit 10
"""

Q18_ORACLE = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       cast(sum(cast(l_quantity as bigint)) as bigint) AS total_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                     GROUP BY l_orderkey
                     HAVING sum(cast(l_quantity as bigint)) > 300)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
LIMIT 10
"""


# ---------------------------------------------------------------------------
# Q19 — discounted revenue: OR of AND-blocks mixing both join sides
# ---------------------------------------------------------------------------

_Q19_CH = f"""
select toFloat64({_REV_CH}) as revenue
from lineitem
join part on p_partkey = l_partkey
where (p_brand = 'Brand#1' and p_size between 1 and 10
       and l_quantity between 1 and 15)
   or (p_brand = 'Brand#2' and p_size between 5 and 20
       and l_quantity between 10 and 25)
   or (p_brand = 'Brand#3' and p_size between 15 and 40
       and l_quantity between 20 and 35)
"""

Q19_ORACLE = f"""
SELECT cast({_REV_DK} as double) AS revenue
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 1 AND 15)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 5 AND 20
       AND l_quantity BETWEEN 10 AND 25)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 15 AND 40
       AND l_quantity BETWEEN 20 AND 35)
"""


# ---------------------------------------------------------------------------
# Q20 — suppliers of selected parts above a shipped-quantity floor:
# nested IN subqueries + HAVING + UInt32 param splice
# ---------------------------------------------------------------------------

_Q20_CH = """
select s_suppkey, s_name, s_acctbal
from supplier
where s_suppkey in (
  select l_suppkey from lineitem
  where l_partkey in (select p_partkey from part where p_name like 'red%')
    and l_shipdate >= toDate('1996-01-01')
    and l_shipdate < toDate('1997-01-01')
  group by l_suppkey
  having sum(toInt64(l_quantity)) > {minq:UInt32}
)
order by s_suppkey
"""

Q20_ORACLE = """
SELECT s_suppkey, s_name, s_acctbal
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
    AND l_shipdate >= DATE '1996-01-01'
    AND l_shipdate < DATE '1997-01-01'
  GROUP BY l_suppkey
  HAVING sum(cast(l_quantity as bigint)) > 400
)
ORDER BY s_suppkey
"""


# ---------------------------------------------------------------------------
# Q21 — suppliers who shipped last: correlated EXISTS + NOT EXISTS
# pair over the same fact table (multi-supplier orders, final
# shipper), day-interval arithmetic
# ---------------------------------------------------------------------------

_Q21_CH = """
select s_name, toInt64(count(*)) as numwait
from supplier, lineitem l1, orders o
where s_suppkey = l1.l_suppkey
  and o_orderkey = l1.l_orderkey
  and o_orderstatus = 'F'
  and l1.l_shipdate > o.o_orderdate + toIntervalDay(60)
  and exists (select 1 from lineitem l2
              where l2.l_orderkey = l1.l_orderkey
                and l2.l_suppkey <> l1.l_suppkey)
  and not exists (select 1 from lineitem l3
                  where l3.l_orderkey = l1.l_orderkey
                    and l3.l_suppkey <> l1.l_suppkey
                    and l3.l_shipdate > l1.l_shipdate)
group by s_name
order by numwait desc, s_name
limit 10
"""

Q21_ORACLE = """
SELECT s_name, cast(count(*) as bigint) AS numwait
FROM supplier, lineitem l1, orders o
WHERE s_suppkey = l1.l_suppkey
  AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F'
  AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > l1.l_shipdate)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 10
"""


# ---------------------------------------------------------------------------
# Q22 — above-average dormant-segment customers: uncorrelated scalar
# subquery threshold (exact decimal-sum average) + correlated NOT
# EXISTS + substring-derived group key
# ---------------------------------------------------------------------------

_Q22_CH = """
select cntrycode, toInt64(count(*)) as numcust,
       toFloat64(sum(toDecimal64(c_acctbal, 2))) as totacctbal
from (
  select substring(c_name, 18, 1) as cntrycode, c_acctbal, c_custkey
  from customer
  where c_acctbal > (select toFloat64(sum(toDecimal64(c_acctbal, 2)))
                            / toInt64(count(*))
                     from customer where c_acctbal > 0)
    and not exists (select 1 from orders
                    where o_custkey = c_custkey
                      and o_orderpriority = '1-URGENT')
)
group by cntrycode
order by cntrycode
"""

Q22_ORACLE = """
SELECT cntrycode, cast(count(*) as bigint) AS numcust,
       cast(sum(cast(c_acctbal as decimal(18,2))) as double) AS totacctbal
FROM (
  SELECT substring(c_name, 18, 1) AS cntrycode, c_acctbal, c_custkey
  FROM customer
  WHERE c_acctbal > (SELECT cast(sum(cast(c_acctbal as decimal(18,2)))
                                 as double)
                            / cast(count(*) as bigint)
                     FROM customer WHERE c_acctbal > 0)
    AND NOT EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey
                      AND o_orderpriority = '1-URGENT')
)
GROUP BY cntrycode
ORDER BY cntrycode
"""


TPCH_QUERIES: list[QueryDef] = [
    QueryDef("q3_shipping_priority",
             _tpch_runner(_Q3_CH,
                          (QueryParam("seg", ParamType.STRING, 1),),
                          {"seg": "BUILDING"}),
             Q3_ORACLE,
             "TPC-H Q3 as stored CH SQL: 3-way join + String param + top-10"),
    QueryDef("q4_order_priority", _tpch_runner(_Q4_CH), Q4_ORACLE,
             "TPC-H Q4 as stored CH SQL: correlated EXISTS + interval add"),
    QueryDef("q5_local_supplier", _tpch_runner(_Q5_CH), Q5_ORACLE,
             "TPC-H Q5 as stored CH SQL: 6-table comma join"),
    QueryDef("q6_revenue_change", _tpch_runner(_Q6_CH), Q6_ORACLE,
             "TPC-H Q6 as stored CH SQL: scan + BETWEEN filters"),
    QueryDef("q7_volume_shipping", _tpch_runner(_Q7_CH), Q7_ORACLE,
             "TPC-H Q7 as stored CH SQL: nation pair + toYear"),
    QueryDef("q8_market_share", _tpch_runner(_Q8_CH), Q8_ORACLE,
             "TPC-H Q8 as stored CH SQL: sumIf share over 8-table star"),
    QueryDef("q9_product_profit", _tpch_runner(_Q9_CH), Q9_ORACLE,
             "TPC-H Q9 as stored CH SQL: LIKE dim filter, nation-year rollup"),
    QueryDef("q10_returned_items", _tpch_runner(_Q10_CH), Q10_ORACLE,
             "TPC-H Q10 as stored CH SQL: wide groupBy + top-20"),
    QueryDef("q12_priority_class", _tpch_runner(_Q12_CH), Q12_ORACLE,
             "TPC-H Q12 as stored CH SQL: countIf combinators"),
    QueryDef("q13_customer_distribution", _tpch_runner(_Q13_CH), Q13_ORACLE,
             "TPC-H Q13 as stored CH SQL: LEFT JOIN w/ NOT LIKE ON-pred, 2-level agg"),
    QueryDef("q14_promo_revenue", _tpch_runner(_Q14_CH), Q14_ORACLE,
             "TPC-H Q14 as stored CH SQL: sumIf over LIKE"),
    QueryDef("q15_top_supplier", _tpch_runner(_Q15_CH), Q15_ORACLE,
             "TPC-H Q15 as stored CH SQL: CTE twice + scalar max-over-CTE"),
    QueryDef("q16_parts_supplier", _tpch_runner(_Q16_CH), Q16_ORACLE,
             "TPC-H Q16 as stored CH SQL: uniqExact + NOT IN subquery"),
    QueryDef("q17_small_quantity", _tpch_runner(_Q17_CH), Q17_ORACLE,
             "TPC-H Q17 as stored CH SQL: correlated scalar avg subquery"),
    QueryDef("q18_large_volume", _tpch_runner(_Q18_CH), Q18_ORACLE,
             "TPC-H Q18 as stored CH SQL: IN over GROUP BY HAVING"),
    QueryDef("q19_discounted_revenue", _tpch_runner(_Q19_CH), Q19_ORACLE,
             "TPC-H Q19 as stored CH SQL: OR of AND-blocks across join sides"),
    QueryDef("q20_supplier_parts",
             _tpch_runner(_Q20_CH,
                          (QueryParam("minq", ParamType.UINT32, 1),),
                          {"minq": "400"}),
             Q20_ORACLE,
             "TPC-H Q20 as stored CH SQL: nested IN + HAVING + UInt32 param"),
    QueryDef("q21_waiting_suppliers", _tpch_runner(_Q21_CH), Q21_ORACLE,
             "TPC-H Q21 as stored CH SQL: EXISTS + NOT EXISTS correlated pair"),
    QueryDef("q22_dormant_customers", _tpch_runner(_Q22_CH), Q22_ORACLE,
             "TPC-H Q22 as stored CH SQL: scalar threshold + NOT EXISTS + substring key"),
]


# ---------------------------------------------------------------------------
# Window-analytics suite (r9): the OTHER dominant shape of stored CH
# analytics — window functions over frames, LIMIT BY, WITH CUBE —
# again as externally-shaped stored text through the translator.
# ---------------------------------------------------------------------------

_QW1_CH = """
select o_custkey, toInt64(o_orderkey) as okey,
       toFloat64(sum(toDecimal64(o_totalprice, 2))
         over (partition by o_custkey order by o_orderdate, o_orderkey
               rows between unbounded preceding and current row)) as cum,
       toFloat64(lagInFrame(toDecimal64(o_totalprice, 2), 1, 0)
         over (partition by o_custkey order by o_orderdate, o_orderkey
               rows between unbounded preceding and current row)) as prev
from orders
order by o_custkey, okey
limit 2 by o_custkey
"""

QW1_ORACLE = """
SELECT o_custkey, cast(o_orderkey as bigint) AS okey,
       cast(sum(cast(o_totalprice as decimal(18,2)))
         OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         as double) AS cum,
       cast(lag(cast(o_totalprice as decimal(18,2)), 1, 0)
         OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
         as double) AS prev
FROM orders
QUALIFY row_number() OVER (PARTITION BY o_custkey
                           ORDER BY o_orderkey) <= 2
ORDER BY o_custkey, okey
"""

_QW2_CH = """
select st, toDateTime(m) as m, toFloat64(rev) as rev,
       toFloat64(sum(rev) over w3) / toInt64(count(*) over w3) as mov3,
       toFloat64(rev - lagInFrame(rev, 1, toDecimal64(0, 2))
         over (partition by st order by m
               rows between unbounded preceding and current row)) as delta
from (
  select o_orderstatus as st, toStartOfMonth(o_orderdate) as m,
         sum(toDecimal64(o_totalprice, 2)) as rev
  from orders group by st, m
)
window w3 as (partition by st order by m
              rows between 2 preceding and current row)
order by st, m
"""

QW2_ORACLE = """
SELECT st, cast(m as timestamp) AS m, cast(rev as double) AS rev,
       cast(sum(rev) OVER w3 as double)
         / cast(count(*) OVER w3 as bigint) AS mov3,
       cast(rev - lag(rev, 1, cast(0 as decimal(18,2)))
         OVER (PARTITION BY st ORDER BY m) as double) AS delta
FROM (
  SELECT o_orderstatus AS st, date_trunc('month', o_orderdate) AS m,
         sum(cast(o_totalprice as decimal(18,2))) AS rev
  FROM orders GROUP BY 1, 2
)
WINDOW w3 AS (PARTITION BY st ORDER BY m
              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
ORDER BY st, m
"""

_QW3_CH = """
select coalesce(o_orderstatus, 'ALL') as st,
       coalesce(o_orderpriority, 'ALL') as pri,
       toInt64(count(*)) as n,
       toFloat64(sum(toDecimal64(o_totalprice, 2))) as rev
from orders
group by o_orderstatus, o_orderpriority with cube
order by st, pri
"""

QW3_ORACLE = """
SELECT coalesce(o_orderstatus, 'ALL') AS st,
       coalesce(o_orderpriority, 'ALL') AS pri,
       cast(count(*) as bigint) AS n,
       cast(sum(cast(o_totalprice as decimal(18,2))) as double) AS rev
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY st, pri
"""

_QW4_CH = """
select n_name, s_name, toInt64(rnk) as rnk
from (
  select n_name, s_name,
         rank() over (partition by n_name order by bal desc, s_name) as rnk
  from (
    select n_name, s_name, max(toDecimal64(s_acctbal, 2)) as bal
    from supplier join nation on s_nationkey = n_nationkey
    group by n_name, s_name
  )
)
where rnk <= 3
order by n_name, rnk, s_name
"""

QW4_ORACLE = """
SELECT n_name, s_name, cast(rnk as bigint) AS rnk
FROM (
  SELECT n_name, s_name,
         rank() OVER (PARTITION BY n_name ORDER BY bal DESC, s_name) AS rnk
  FROM (
    SELECT n_name, s_name, max(cast(s_acctbal as decimal(18,2))) AS bal
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name, s_name
  )
)
WHERE rnk <= 3
ORDER BY n_name, rnk, s_name
"""

WINDOW_QUERIES: list[QueryDef] = [
    QueryDef("qw1_cumulative_revenue", _tpch_runner(_QW1_CH), QW1_ORACLE,
             "cumulative window + lagInFrame (frame-stripped) + LIMIT BY"),
    QueryDef("qw2_moving_stats", _tpch_runner(_QW2_CH), QW2_ORACLE,
             "named WINDOW clause, decimal moving sum/count, lag delta"),
    QueryDef("qw3_cube_totals", _tpch_runner(_QW3_CH), QW3_ORACLE,
             "GROUP BY … WITH CUBE pass-through vs native CUBE"),
    QueryDef("qw4_rank_topk", _tpch_runner(_QW4_CH), QW4_ORACLE,
             "rank-per-partition top-k via derived subquery"),
]


# ---------------------------------------------------------------------------
# Synthetic partsupp suite (round 10, verdict item 4): the classic
# q2/q11 shapes (and the true-form q16/q20) were unportable because
# the synthetic schema has no partsupp — so partsupp is SYNTHESIZED
# deterministically inside each query as a CTE over part × 4 supplier
# slots with seeded integer arithmetic (no RNG), expressed identically
# in CH dialect and the DuckDB oracle; both engines derive the same
# rows from the same parquet inputs. Supplier assignment follows
# dbgen's stride shape ((p + i*(S/4 + p/S) + i) mod S) with S FIXED at
# the prime 199 rather than count(supplier): a count-derived modulus
# makes ps_suppkey non-foldable, which blocks hash joins on the
# supplier key and nests lineitem in a BroadcastNestedLoopJoin — fatal
# at scale. With a constant S the key is a pure part-side expression
# (hash-joinable); suppkeys beyond the supplier table simply dangle,
# identically in both engines. Supply cost is
# cents-exact: (p*7 + i*13) % 99900 + 100 cents, so money aggregates
# recompute the integer cents and divide once at the end.
# ---------------------------------------------------------------------------

_PS_CH = """partsupp as (
  select p_partkey as ps_partkey,
         (p_partkey + i * (49 + intDiv(p_partkey, 199)) + i) % 199
           as ps_suppkey,
         (p_partkey * 47 + i * 31) % 9999 + 1 as ps_availqty,
         toFloat64((p_partkey * 7 + i * 13) % 99900 + 100) / 100
           as ps_supplycost
  from (select p_partkey, arrayJoin([0, 1, 2, 3]) as i from part)
)"""

_PS_DK = """partsupp AS (
  SELECT p_partkey AS ps_partkey,
         (p_partkey + i * (49 + p_partkey // 199) + i) % 199
           AS ps_suppkey,
         (p_partkey * 47 + i * 31) % 9999 + 1 AS ps_availqty,
         cast((p_partkey * 7 + i * 13) % 99900 + 100 as double) / 100
           AS ps_supplycost
  FROM (SELECT p_partkey, unnest([0, 1, 2, 3]) AS i FROM part)
)"""


# Q2 — min-cost supplier: correlated MIN over a 4-way join (the
# translator shape nothing else exercises: a scalar subquery
# correlated on the outer part key, over the same CTE)
_Q2_CH = f"""
with {_PS_CH}
select s_acctbal, s_name, n_name, toInt64(p_partkey) as p_partkey, p_brand
from part, supplier, partsupp, nation, region
where p_partkey = ps_partkey
  and s_suppkey = ps_suppkey
  and p_size = {{psize:UInt32}}
  and p_type = 'LARGE'
  and s_nationkey = n_nationkey
  and n_regionkey = r_regionkey
  and r_name = 'EUROPE'
  and ps_supplycost = (
    select min(ps_supplycost)
    from partsupp, supplier, nation, region
    where p_partkey = ps_partkey
      and s_suppkey = ps_suppkey
      and s_nationkey = n_nationkey
      and n_regionkey = r_regionkey
      and r_name = 'EUROPE')
order by s_acctbal desc, n_name, s_name, p_partkey
limit 100
"""

Q2_ORACLE = f"""
WITH {_PS_DK}
SELECT s_acctbal, s_name, n_name,
       cast(p_partkey as bigint) AS p_partkey, p_brand
FROM part, supplier, partsupp, nation, region
WHERE p_partkey = ps_partkey
  AND s_suppkey = ps_suppkey
  AND p_size = 3
  AND p_type = 'LARGE'
  AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey
  AND r_name = 'EUROPE'
  AND ps_supplycost = (
    SELECT min(ps_supplycost)
    FROM partsupp, supplier, nation, region
    WHERE p_partkey = ps_partkey
      AND s_suppkey = ps_suppkey
      AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
      AND r_name = 'EUROPE')
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


# Q11 — important stock: HAVING over a scalar subquery of the SAME
# aggregate (cents-exact money math in both engines)
_Q11_CH = f"""
with {_PS_CH}
select toInt64(ps_partkey) as ps_partkey,
       toFloat64(sum(toInt64(round(ps_supplycost * 100)) * ps_availqty))
         / 100 as val
from partsupp, supplier, nation
where ps_suppkey = s_suppkey
  and s_nationkey = n_nationkey
  and n_name = {{nat:String}}
group by ps_partkey
having sum(toInt64(round(ps_supplycost * 100)) * ps_availqty) > (
    select sum(toInt64(round(ps_supplycost * 100)) * ps_availqty) * 0.001
    from partsupp, supplier, nation
    where ps_suppkey = s_suppkey
      and s_nationkey = n_nationkey
      and n_name = {{nat:String}})
order by val desc, ps_partkey
limit 30
"""

Q11_ORACLE = f"""
WITH {_PS_DK}
SELECT cast(ps_partkey as bigint) AS ps_partkey,
       cast(sum(cast(round(ps_supplycost * 100) as bigint)
                * ps_availqty) as double) / 100 AS val
FROM partsupp, supplier, nation
WHERE ps_suppkey = s_suppkey
  AND s_nationkey = n_nationkey
  AND n_name = 'NATION_7'
GROUP BY ps_partkey
HAVING sum(cast(round(ps_supplycost * 100) as bigint) * ps_availqty) > (
    SELECT sum(cast(round(ps_supplycost * 100) as bigint)
               * ps_availqty) * 0.001
    FROM partsupp, supplier, nation
    WHERE ps_suppkey = s_suppkey
      AND s_nationkey = n_nationkey
      AND n_name = 'NATION_7')
ORDER BY val DESC, ps_partkey
LIMIT 30
"""


# Q16 true form — partsupp-side distinct supplier count (the adapted
# q16_parts_supplier counts via lineitem; this one exercises the real
# partsupp shape)
_Q16T_CH = f"""
with {_PS_CH}
select p_brand, p_type, p_size, toInt64(uniqExact(ps_suppkey)) as supplier_cnt
from partsupp, part
where p_partkey = ps_partkey
  and p_brand <> 'Brand#1'
  and p_type not like 'PROMO%'
  and p_size in (1, 5, 10, 15, 20, 25, 30, 35)
  and ps_suppkey not in (select s_suppkey from supplier
                         where s_name like '%07')
group by p_brand, p_type, p_size
order by supplier_cnt desc, p_brand, p_type, p_size
limit 20
"""

Q16T_ORACLE = f"""
WITH {_PS_DK}
SELECT p_brand, p_type, p_size,
       cast(count(DISTINCT ps_suppkey) as bigint) AS supplier_cnt
FROM partsupp, part
WHERE p_partkey = ps_partkey
  AND p_brand <> 'Brand#1'
  AND p_type NOT LIKE 'PROMO%'
  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier
                         WHERE s_name LIKE '%07')
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
LIMIT 20
"""


# Q20 true form — nested IN over partsupp with a scalar subquery
# correlated on TWO partsupp columns against lineitem
_Q20T_CH = f"""
with {_PS_CH}
select s_name, toInt64(s_suppkey) as s_suppkey
from supplier, nation
where s_suppkey in (
    select ps_suppkey from partsupp
    where ps_partkey in (select p_partkey from part
                         where p_name like 'small%')
      and ps_availqty > (
        select 0.5 * sum(l_quantity) from lineitem
        where l_partkey = ps_partkey
          and l_suppkey = ps_suppkey
          and l_shipdate >= toDate('1997-01-01')
          and l_shipdate < toDate('1998-01-01')))
  and s_nationkey = n_nationkey
  and n_name = {{nat:String}}
order by s_name
"""

Q20T_ORACLE = f"""
WITH {_PS_DK}
SELECT s_name, cast(s_suppkey as bigint) AS s_suppkey
FROM supplier, nation
WHERE s_suppkey IN (
    SELECT ps_suppkey FROM partsupp
    WHERE ps_partkey IN (SELECT p_partkey FROM part
                         WHERE p_name LIKE 'small%')
      AND ps_availqty > (
        SELECT 0.5 * sum(l_quantity) FROM lineitem
        WHERE l_partkey = ps_partkey
          AND l_suppkey = ps_suppkey
          AND l_shipdate >= DATE '1997-01-01'
          AND l_shipdate < DATE '1998-01-01'))
  AND s_nationkey = n_nationkey
  AND n_name = 'NATION_6'
ORDER BY s_name
"""


TPCH_QUERIES.extend([
    QueryDef("q2_min_cost_supplier",
             _tpch_runner(_Q2_CH,
                          (QueryParam("psize", ParamType.UINT32, 1),),
                          {"psize": "3"}),
             Q2_ORACLE,
             "TPC-H Q2 over synthesized partsupp: correlated MIN over a 4-way join"),
    QueryDef("q11_important_stock",
             _tpch_runner(_Q11_CH,
                          (QueryParam("nat", ParamType.STRING, 1),),
                          {"nat": "NATION_7"}),
             Q11_ORACLE,
             "TPC-H Q11 over synthesized partsupp: HAVING vs scalar subquery of same agg"),
    QueryDef("q16_true_partsupp", _tpch_runner(_Q16T_CH), Q16T_ORACLE,
             "TPC-H Q16 true form: distinct partsupp suppliers + NOT IN"),
    QueryDef("q20_true_partsupp",
             _tpch_runner(_Q20T_CH,
                          (QueryParam("nat", ParamType.STRING, 1),),
                          {"nat": "NATION_6"}),
             Q20T_ORACLE,
             "TPC-H Q20 true form: nested IN over partsupp + 2-column correlated scalar"),
])
