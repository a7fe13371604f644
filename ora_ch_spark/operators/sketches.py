"""Mergeable sketch operators — the 100 TB rollup primitives.

At cluster scale you cannot afford a re-scan per question: distinct
counts and quantiles are computed ONCE per partition/day as tiny
mergeable summaries, then any rollup (per-group, global, sliding
windows of days) is a merge of summaries — no second pass over the
data. This is the engine-side generalization of the reference's
metadata probes (row-count / max-value without scanning,
``ora/jdbcSession.scala`` task-stat queries): the reference keeps
per-table scalars, a 100 TB pipeline keeps per-slice sketches.

Two sketches, both exact-replayable in ANSI SQL so the DuckDB
differential gate can hash-match them bit for bit (the repo rule:
algorithm-replay oracles, not row-count checks):

- **HyperLogLog distinct counts** (Flajolet et al. 2007). md5-derived
  60-bit hashes (``functions/hashes.py`` cross-engine idiom), p=6 →
  m=64 registers. The register table ``(group, bucket, M)`` is the
  sketch; merge = ``max`` per bucket — associative, idempotent,
  shuffle-light (≤ m rows per group regardless of input size). The
  estimator is kept **integer-exact until a single final double
  expression**: Z is accumulated as Σ 2^(maxM−Mj) in int64 (exact —
  ≤ m·2^55 < 2^63) rather than the textbook Σ 2^−Mj in floating
  point, whose result depends on summation order and would break
  cross-engine hashing. Raw estimator only (no bias/linear-counting
  branch): corrections need ``ln``, whose libm rounding is not
  contractually identical across engines; the raw estimate is
  deterministic and its ±1.04/√m relative error is documented.

- **Fixed-width histogram quantiles**. ``bin = floor(value/width)``
  counts per group; merge = count sum. Quantile q = upper edge of the
  first bin whose cumulative count reaches q·n — error bounded by
  bin width, zero error dependence on data order. The shape every
  telemetry pipeline uses for p50/p90/p99 at scale.

Scale posture: both sketches are one scan + one ≤ m-rows-per-group
shuffle; merged rollups touch only sketch rows (64 per group / bin
counts), never the base table. Register tables can be persisted to
the TableStore and merged across days — the incremental-view pattern
(``operators/incremental.py``) applied to approximate aggregates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ora_ch_spark.functions.hashes import md5_long

HLL_P = 6  # 2^6 = 64 registers
HLL_M = 1 << HLL_P
HASH_BITS = 60  # 15 md5 hex chars
W = HASH_BITS - HLL_P  # value bits per register
# alpha_64 * m^2 (Flajolet et al. 2007, alpha_m for m=64 is 0.709)
ALPHA_M2 = 0.709 * HLL_M * HLL_M


def hll_registers(
    df: DataFrame, key: Column, group_cols: list[str]
) -> DataFrame:
    """Per-group HLL register table: (group..., bucket, M).

    ``bucket`` = low p bits of the 60-bit md5 hash, ``M`` = max over
    rows of rho(high 54 bits) where rho = leading zeros + 1 (and 0
    maps to W+1, the convention for an all-zero value). ≤ 64 rows per
    group, independent of input size — THE sketch property."""
    h = md5_long(key)
    # high W bits via bit shift — integer-exact (h/64 in double would
    # round above 2^53 and is not contractually bit-equal to `//`)
    r = F.shiftrightunsigned(h, HLL_P)
    # bitlen(r) = length(bin(r)) for r>0; rho = W - bitlen + 1
    rho = F.when(r == 0, F.lit(W + 1)).otherwise(
        F.lit(W + 1) - F.length(F.bin(r))
    )
    return (
        df.select(
            *group_cols,
            (h % HLL_M).alias("bucket"),
            rho.alias("rho"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("M"))
    )


def hll_merge(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge register tables down to a coarser grouping (or to a
    single global sketch with ``group_cols=[]``): max per bucket.
    Associative and idempotent — merging a day's sketch twice, or in
    any order, yields the same registers."""
    return registers.groupBy(*group_cols, "bucket").agg(
        F.max("M").alias("M")
    )


def hll_estimate(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """Raw HLL estimate per group from a register table.

    Z is kept integer-exact: with maxM = max register value in the
    group, Σ_j 2^(maxM−Mj) over observed buckets plus (m−V)·2^maxM
    for the 2^p−V never-hit buckets (which hold M=0) is an int64 sum
    ≤ m·2^(W+1) < 2^63 — order-independent, unlike the floating
    Σ 2^−Mj. The single double expression at the end is identical
    text in the DuckDB oracle, so IEEE evaluation matches bitwise."""
    per_group = registers.groupBy(*group_cols).agg(
        F.max("M").alias("maxM"),
        F.count(F.lit(1)).alias("V"),
    )
    z = registers.join(per_group, group_cols or None, "inner") if group_cols else (
        registers.crossJoin(F.broadcast(per_group))
    )
    # SQL shiftleft via expr: the PySpark wrapper insists on an int
    # literal for numBits, the SQL function takes a column fine
    z = z.groupBy(*(group_cols + ["maxM", "V"])).agg(
        F.sum(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(maxM - M AS INT))")
        ).alias("Zobs")
    )
    z = z.withColumn(
        "Z",
        F.col("Zobs")
        + (F.lit(HLL_M) - F.col("V"))
        * F.expr("shiftleft(CAST(1 AS BIGINT), CAST(maxM AS INT))"),
    )
    est = (
        F.lit(ALPHA_M2)
        * F.pow(F.lit(2.0), F.col("maxM"))
        / F.col("Z").cast("double")
    )
    return z.select(
        *group_cols,
        F.col("V").cast("bigint").alias("n_buckets"),
        est.alias("est_distinct"),
    )


def hll_oracle_sql(
    key_sql: str, group_sql: str, relation: str, group_alias: str = "grp"
) -> str:
    """DuckDB replay of registers → merge-free per-group estimate.
    ``key_sql`` must produce the exact string Spark hashed."""
    return f"""
WITH reg AS (
  SELECT {group_sql} AS {group_alias},
         h % {HLL_M} AS bucket,
         max(CASE WHEN h // {HLL_M} = 0 THEN {W + 1}
                  ELSE {W + 1} - length(bin(h // {HLL_M})) END) AS M
  FROM (SELECT {group_sql},
               ('0x' || substr(md5({key_sql}), 1, 15))::BIGINT AS h
        FROM {relation})
  GROUP BY 1, 2
),
pg AS (SELECT {group_alias}, max(M) AS maxM, count(*) AS V FROM reg GROUP BY 1),
zs AS (
  SELECT r.{group_alias}, pg.maxM, pg.V,
         sum(1::BIGINT << cast(pg.maxM - r.M as int))::BIGINT AS Zobs
  FROM reg r JOIN pg USING ({group_alias})
  GROUP BY 1, 2, 3
)
SELECT {group_alias},
       cast(V as bigint) AS n_buckets,
       {ALPHA_M2!r} * power(2.0, maxM)
         / cast(Zobs + ({HLL_M} - V) * (1::BIGINT << cast(maxM as int)) as double)
         AS est_distinct
FROM zs
"""


CMS_D = 4  # hash rows
CMS_W = 256  # counters per row


def cms_build(df: DataFrame, key: Column, weight: Column | None = None) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005): d×w counter
    table ``(row, col, c)`` — each input item increments counter
    (i, md5(i:key) mod w) for every hash row i. Built here from one
    scan via a union of d cheap projections (Catalyst collapses them
    into one Expand over the scan); merge = counter SUM, so per-slice
    sketches roll up without re-scanning. d·w = 1024 cells regardless
    of input size."""
    w = weight if weight is not None else F.lit(1).cast("bigint")
    parts = [
        df.select(
            F.lit(i).alias("row"),
            (md5_long(F.concat_ws(":", F.lit(str(i)), key)) % CMS_W).alias("col"),
            w.alias("w"),
        )
        for i in range(CMS_D)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.groupBy("row", "col").agg(F.sum("w").alias("c"))


def cms_merge(sketches: DataFrame) -> DataFrame:
    """Merge unioned CMS counter tables: counter sum per cell."""
    return sketches.groupBy("row", "col").agg(F.sum("c").alias("c"))


def cms_estimate(cms: DataFrame, keys: DataFrame, key_col: str) -> DataFrame:
    """Point-frequency estimates for ``keys``: min over the d rows of
    the addressed counters (classic CMS upper-bound estimate — exact
    count ≤ estimate, overestimate only from collisions). Implemented
    as d chained broadcast joins of the ≤ w-row per-hash counter
    slices onto the keys frame — one pass over keys, the sketch never
    shuffles, and no key-side join is needed to recombine rows (which
    would plan as sort-merge joins on unstatted frames)."""
    out = keys
    for i in range(CMS_D):
        cms_i = cms.filter(F.col("row") == i).select(
            F.col("col").alias(f"__col{i}"), F.col("c").alias(f"__c{i}")
        )
        out = (
            out.withColumn(
                f"__col{i}",
                md5_long(F.concat_ws(":", F.lit(str(i)), F.col(key_col))) % CMS_W,
            )
            .join(F.broadcast(cms_i), f"__col{i}", "left")
            .drop(f"__col{i}")
        )
    # a key whose cell was never incremented reads counter 0 (left
    # join + coalesce) — unseen keys get estimate 0, not a dropped row
    return out.select(
        key_col,
        F.least(
            *[F.coalesce(F.col(f"__c{i}"), F.lit(0).cast("bigint")) for i in range(CMS_D)]
        ).alias("est_cnt"),
    )


def cms_oracle_sql(
    key_sql: str, relation: str, key_alias: str = "k", where: str = "TRUE"
) -> str:
    """DuckDB replay: build + estimate for every distinct key."""
    unions = "\nUNION ALL\n".join(
        f"SELECT {i} AS row, ('0x' || substr(md5('{i}' || ':' || {key_sql}), 1, 15))::BIGINT % {CMS_W} AS col, 1 AS w\n"
        f"FROM {relation} WHERE {where}"
        for i in range(CMS_D)
    )
    probes = "\nUNION ALL\n".join(
        f"SELECT {key_alias}, {i} AS row, ('0x' || substr(md5('{i}' || ':' || cast({key_alias} as varchar)), 1, 15))::BIGINT % {CMS_W} AS col FROM keys"
        for i in range(CMS_D)
    )
    return f"""
WITH cms AS (
  SELECT row, col, cast(sum(w) as bigint) AS c FROM ({unions}) GROUP BY 1, 2
),
keys AS (SELECT DISTINCT {key_sql} AS {key_alias} FROM {relation} WHERE {where}),
probe AS ({probes})
SELECT p.{key_alias}, cast(min(c.c) as bigint) AS est_cnt
FROM probe p JOIN cms c ON c.row = p.row AND c.col = p.col
GROUP BY 1
"""


def histogram_sketch(
    df: DataFrame, value_col: str, group_cols: list[str], width: float
) -> DataFrame:
    """Fixed-width histogram: (group..., bin, cnt). Mergeable by
    summing cnt; one scan, one small shuffle on (group, bin). NULL
    values are excluded (aggregate semantics) — they would otherwise
    form a NULL bin whose sort position differs between engines."""
    b = F.floor(F.col(value_col) / F.lit(width)).cast("bigint")
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(*group_cols, b.alias("bin"))
        .groupBy(*group_cols, "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def histogram_quantiles(
    hist: DataFrame,
    group_cols: list[str],
    width: float,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Approximate quantiles from a (merged) histogram: for each q,
    the upper edge of the first bin whose cumulative count reaches
    q·n. Error ≤ ``width``; fully deterministic (integer counts,
    exact bin-edge arithmetic)."""
    w_cum = (
        Window.partitionBy(*group_cols)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_tot = Window.partitionBy(*group_cols)
    cum = hist.withColumn("cum", F.sum("cnt").over(w_cum)).withColumn(
        "total", F.sum("cnt").over(w_tot)
    )
    aggs = [F.sum("cnt").alias("n")]
    for q in qs:
        tag = f"p{int(q * 100)}"
        hit_bin = F.min(
            F.when(
                F.col("cum").cast("double") >= F.lit(q) * F.col("total").cast("double"),
                F.col("bin"),
            )
        )
        aggs.append(((hit_bin + 1).cast("double") * F.lit(width)).alias(tag))
    return cum.groupBy(*group_cols).agg(*aggs)


def histogram_oracle_sql(
    value_sql: str,
    group_sql: str,
    relation: str,
    width: float,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    group_alias: str = "grp",
) -> str:
    """DuckDB replay: same bins, same cumulative rule, same edges."""
    q_cols = ",\n       ".join(
        f"cast(min(CASE WHEN cast(cum as double) >= {q!r} * cast(total as double)"
        f" THEN bin END) + 1 as double) * {width!r} AS p{int(q * 100)}"
        for q in qs
    )
    return f"""
WITH hist AS (
  SELECT {group_sql} AS {group_alias},
         cast(floor(({value_sql}) / {width!r}) as bigint) AS bin,
         count(*) AS cnt
  FROM {relation} WHERE ({value_sql}) IS NOT NULL GROUP BY 1, 2
),
cum AS (
  SELECT {group_alias}, bin, cnt,
         sum(cnt) OVER (PARTITION BY {group_alias} ORDER BY bin
                        ROWS UNBOUNDED PRECEDING) AS cum,
         sum(cnt) OVER (PARTITION BY {group_alias}) AS total
  FROM hist
)
SELECT {group_alias}, cast(sum(cnt) as bigint) AS n,
       {q_cols}
FROM cum GROUP BY {group_alias}
"""


def hll_intersect_estimate(
    reg_a: DataFrame, reg_b: DataFrame
) -> DataFrame:
    """Distinct-count estimates for two sketches AND their set
    algebra, from registers alone: |A|, |B|, |A∪B| (bucket-max
    merge), and |A∩B| by inclusion–exclusion — the standard HLL
    answer to "how many users did BOTH things" without touching the
    base data. Inclusion–exclusion inherits the raw estimator's
    error, amplified for small intersections (documented; theta
    sketches are the exact-trade-off alternative). Single row:
    (est_a, est_b, est_union, est_intersect)."""
    a = hll_estimate(reg_a.withColumn("g", F.lit("a")), ["g"]).select(
        F.col("est_distinct").alias("est_a")
    )
    b = hll_estimate(reg_b.withColumn("g", F.lit("b")), ["g"]).select(
        F.col("est_distinct").alias("est_b")
    )
    u = hll_estimate(
        hll_merge(
            reg_a.select("bucket", "M").unionByName(reg_b.select("bucket", "M")),
            [],
        ).withColumn("g", F.lit("u")),
        ["g"],
    ).select(F.col("est_distinct").alias("est_union"))
    return (
        a.crossJoin(b)
        .crossJoin(u)
        .select(
            "est_a",
            "est_b",
            "est_union",
            (F.col("est_a") + F.col("est_b") - F.col("est_union")).alias(
                "est_intersect"
            ),
        )
    )
