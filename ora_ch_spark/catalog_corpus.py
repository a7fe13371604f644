"""LLM-data-pipeline catalog entries, part 2: corpus selection
and hygiene, BM25, k-means/SemDeDup, SCD2, quality filtering,
profiling, mergeable sketches. Split out of catalog_ext.py in
round 8 (mechanical move; entry list and declaration order
unchanged in ``catalog_ext.EXT_QUERIES``)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from ora_ch_spark.io import load_table
from ora_ch_spark.operators import dedup as D
from ora_ch_spark.operators import similarity as S
from ora_ch_spark.operators import text as TX
from ora_ch_spark.catalog_pipeline import (  # shared helpers
    _HLL_KEY_SQL,
    _MIX_WEIGHTS,
    _QE,
    CHUNK_CHARS,
    CHUNK_OVERLAP,
)

_ZPRED = "user_id >= 30 and user_id < 60 and value >= 25.0 and value < 50.0"


def zorder_pruned_scan_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order the events table inside a TableStore copy, then answer
    a 2-D range predicate through the zone-map pruned read path —
    the gate hashes that pruning NEVER changes results (the pruning
    RATIO is pinned by tests/test_store_manifest.py)."""
    from ora_ch_spark.catalog import _tmp_store
    from ora_ch_spark.operators.layout import cluster_table

    store = _tmp_store(spark)
    store.create_database("ch")
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    store.write("ch", "ev_z", ev.repartition(16, "event_id"))
    cluster_table(store, "ch", "ev_z", ["user_id", "value"], bits=10)
    return store.read_pruned("ch", "ev_z", _ZPRED)


ZORDER_PRUNED_ORACLE = f"""
SELECT event_id, user_id, value FROM events
WHERE {_ZPRED.replace("and", "AND")}
"""


def resample_gapfill_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly regularization of the event stream for a bounded entity
    slice (users < 50): gaps materialized, sums forward-filled."""
    from ora_ch_spark.operators.timeseries import resample_gapfill

    ev = load_table(spark, sf_dir, "events").filter("user_id < 50")
    return resample_gapfill(ev, freq="hour")


RESAMPLE_GAPFILL_ORACLE = """
WITH e AS (
  SELECT user_id, date_trunc('hour', ts) AS bucket, value
  FROM events WHERE user_id < 50
),
agg AS (
  SELECT user_id, bucket, count(*) AS n_events,
         cast(sum(cast(value as decimal(18,2))) as double) AS val_sum
  FROM e GROUP BY 1, 2
),
spans AS (SELECT user_id, min(bucket) AS b0, max(bucket) AS b1 FROM agg GROUP BY 1),
spine AS (
  SELECT user_id, unnest(generate_series(b0, b1, INTERVAL 1 HOUR)) AS bucket
  FROM spans
),
j AS (
  SELECT s.user_id, s.bucket, a.n_events, a.val_sum
  FROM spine s LEFT JOIN agg a ON s.user_id = a.user_id AND s.bucket = a.bucket
)
SELECT user_id, bucket, coalesce(n_events, 0) AS n_events, val_sum,
       last_value(val_sum IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY bucket
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS val_filled
FROM j
"""


def mixture_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5:2:2:1 en/de/fr/zh mixture (es excluded) — the data-mixing
    step; returns the selected docs."""
    from ora_ch_spark.operators.sampling import mixture_sample

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    return mixture_sample(docs, _MIX_WEIGHTS, group_col="lang")


def _mixture_oracle() -> str:
    total_w = sum(_MIX_WEIGHTS.values())
    wrows = " UNION ALL ".join(
        f"SELECT '{g}' AS lang, {w} AS w" for g, w in sorted(_MIX_WEIGHTS.items())
    )
    return f"""
WITH wt AS ({wrows}),
cnt AS (
  SELECT wt.lang, w, count(d.doc_id) AS n
  FROM wt LEFT JOIN documents d USING (lang) GROUP BY 1, 2
),
feas AS (SELECT min(n * {total_w} // w) AS T FROM cnt),
tgt AS (SELECT lang, (T * w) // {total_w} AS t FROM cnt CROSS JOIN feas),
rk AS (
  SELECT d.doc_id, d.lang, d.source, t,
         row_number() OVER (
           PARTITION BY d.lang
           ORDER BY md5('mix:' || cast(d.doc_id as varchar)) ASC, d.doc_id ASC
         ) AS rn
  FROM documents d JOIN tgt USING (lang)
)
SELECT doc_id, lang, source FROM rk WHERE rn <= t
"""


def temperature_mixture_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T=2 temperature rebalancing over languages: low-resource
    groups up-weighted to sqrt-proportional shares."""
    from ora_ch_spark.operators.sampling import temperature_mixture_sample

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    return temperature_mixture_sample(docs, temperature=2.0).orderBy("doc_id")


# replays the whole recipe in SQL: per-group counts → integer weights
# w = max(1, floor(1e6·sqrt(n))) → mixture_sample's exact sizing
TEMPERATURE_MIXTURE_ORACLE = """
WITH cnt0 AS (
  SELECT lang, count(*) AS n FROM documents
  WHERE lang IS NOT NULL GROUP BY 1
),
wt AS (
  SELECT lang, n,
         greatest(1, cast(floor(1000000 * sqrt(n)) as bigint)) AS w
  FROM cnt0
),
tw AS (SELECT sum(w) AS tot FROM wt),
feas AS (SELECT min(n * tot // w) AS T FROM wt CROSS JOIN tw),
tgt AS (
  SELECT lang, (T * w) // tot AS t
  FROM wt CROSS JOIN tw CROSS JOIN feas
),
rk AS (
  SELECT d.doc_id, d.lang, d.source, t,
         row_number() OVER (
           PARTITION BY d.lang
           ORDER BY md5('tmix:' || cast(d.doc_id as varchar)) ASC, d.doc_id ASC
         ) AS rn
  FROM documents d JOIN tgt USING (lang)
)
SELECT doc_id, lang, source FROM rk WHERE rn <= t
ORDER BY doc_id
"""


def weighted_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 weighted draw: weight = 1 + min(n_chars div 200, 3) —
    longer docs proportionally likelier, tiers not raw lengths."""
    from ora_ch_spark.operators.sampling import weighted_sample

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        (F.lit(1) + F.least(F.expr("n_chars div 200"), F.lit(3))).alias("weight"),
    )
    return weighted_sample(docs, n=100)


WEIGHTED_SAMPLE_ORACLE = """
WITH w AS (
  SELECT doc_id, 1 + least(n_chars // 200, 3) AS weight FROM documents
),
reps AS (
  SELECT doc_id, weight, unnest(range(weight)) AS i FROM w
),
keys AS (
  SELECT doc_id, weight,
         max(md5('wt:' || cast(doc_id as varchar) || ':' || cast(i as varchar))) AS sel_key
  FROM reps GROUP BY 1, 2
)
SELECT doc_id, weight, sel_key FROM keys
ORDER BY sel_key DESC, doc_id ASC LIMIT 100
"""


def quality_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ora_ch_spark.operators.sampling import topk_per_group

    docs = load_table(spark, sf_dir, "documents")
    q = TX.quality_score(docs).select("doc_id", "quality_score")
    joined = docs.select("doc_id", "lang").join(q, "doc_id")
    return topk_per_group(joined, 10).select(
        "doc_id", "lang", "quality_score", "rank_in_group"
    )


def _quality_topk_oracle() -> str:
    stop_set = ", ".join(f"'{w}'" for w in TX.STOPWORDS_EN)
    return f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok FROM documents
),
agg AS (
  SELECT doc_id, count(*) AS n_tokens,
         sum(CASE WHEN tok IN ({stop_set}) THEN 1 ELSE 0 END) AS n_stop,
         sum(length(tok)) AS sum_tok_len
  FROM tok GROUP BY doc_id
),
q AS (
  SELECT doc_id,
         0.4 * (cast(n_stop as double) / cast(n_tokens as double))
       + 0.3 * least(cast(sum_tok_len as double) / cast(n_tokens as double) / 10.0, 1.0)
       + 0.3 * least(cast(n_tokens as double) / 100.0, 1.0) AS quality_score
  FROM agg
),
r AS (
  SELECT d.doc_id, d.lang, q.quality_score,
         row_number() OVER (PARTITION BY d.lang
                            ORDER BY q.quality_score DESC, d.doc_id) AS rank_in_group
  FROM documents d JOIN q ON d.doc_id = q.doc_id
)
SELECT doc_id, lang, quality_score, cast(rank_in_group as int) AS rank_in_group
FROM r WHERE rank_in_group <= 10
"""


def dedup_incremental_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus = even doc_ids (already-ingested); batch = odd doc_ids
    (new crawl) plus exact re-crawls of every 10th corpus doc under
    fresh ids — the operator screens the batch against the corpus only
    (no corpus×corpus pairs) and must flag the re-crawls 'exact'."""
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter("doc_id % 2 = 0")
    recrawl = corpus.filter("doc_id % 10 = 0").withColumn(
        "doc_id", F.col("doc_id") + F.lit(1_000_000)
    )
    out = D.incremental_minhash_dedup(
        corpus, docs.filter("doc_id % 2 = 1").unionByName(recrawl)
    )
    # null-free projection for the value-hash gate
    return out.select(
        "doc_id",
        F.col("dup_exact").cast("int").alias("dup_exact"),
        F.coalesce("near_dup_of", F.lit(-1)).alias("near_dup_of"),
        F.coalesce("max_jaccard", F.lit(-1.0)).alias("max_jaccard"),
        "verdict",
    )


def _incremental_oracle(
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.8,
    corpus_sql: str = "SELECT * FROM documents WHERE doc_id % 2 = 0",
    batch_sql: str = (
        "SELECT * FROM documents WHERE doc_id % 2 = 1\n"
        "  UNION ALL\n"
        "  SELECT doc_id + 1000000 AS doc_id, text, lang, source, n_chars\n"
        "  FROM documents WHERE doc_id % 2 = 0 AND doc_id % 10 = 0"
    ),
    final_select: str | None = None,
) -> str:
    """Replays incremental_minhash_dedup: per-side single-pass MinHash
    signatures, packed band keys, corpus×batch-only candidates, exact
    intersection verify, then the exact/near/keep verdict.
    ``corpus_sql``/``batch_sql`` parameterize the two relations so
    composites (e.g. the ingest pipeline) reuse the replay;
    ``final_select`` overrides the per-doc verdict projection."""
    from ora_ch_spark.operators.dedup import MINHASH_PRIME, minhash_coeffs

    rows = num_hashes // bands
    pack = 1 << 31
    mins = ",\n         ".join(
        f"min(({a} * (hv % 4294967296) + {b}) % {MINHASH_PRIME}) AS mh{h}"
        for h, (a, b) in enumerate(minhash_coeffs(num_hashes))
    )

    def band_select(side: str, b: int) -> str:
        idx = [b * rows + r for r in range(rows)]
        keys = []
        for j, i in enumerate(range(0, len(idx), 2)):
            if i + 1 < len(idx):
                keys.append(
                    f"(mh{idx[i]} % {pack}) * {pack} + (mh{idx[i + 1]} % {pack}) AS k{j}"
                )
            else:
                keys.append(f"mh{idx[i]} AS k{j}")
        return f"  SELECT doc_id, {b} AS band, " + ", ".join(keys) + f" FROM sig_{side}"

    n_keys = (rows + 1) // 2
    key_eq = " AND ".join(f"c.k{j} = b.k{j}" for j in range(n_keys))

    def side_ctes(side: str, rel: str) -> str:
        bands_sql = "\n  UNION ALL\n".join(band_select(side, b) for b in range(bands))
        return f"""
tok_{side} AS (
  SELECT doc_id, string_split(lower(text), ' ') AS w FROM {rel}
),
sh_{side} AS (
  SELECT doc_id, unnest(list_distinct(
           [w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)]
         )) AS shingle
  FROM tok_{side} WHERE len(w) >= 3
),
shh_{side} AS (
  SELECT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS hv FROM sh_{side}
),
sig_{side} AS (
  SELECT doc_id,
         {mins}
  FROM shh_{side} GROUP BY doc_id
),
bands_{side} AS (
{bands_sql}
),
sizes_{side} AS (SELECT doc_id, count(*) AS n FROM sh_{side} GROUP BY doc_id)"""

    default_final = """
SELECT b.doc_id,
       CASE WHEN e.doc_id IS NOT NULL THEN 1 ELSE 0 END AS dup_exact,
       coalesce(n.near_dup_of, -1) AS near_dup_of,
       coalesce(n.max_jaccard, -1.0) AS max_jaccard,
       CASE WHEN e.doc_id IS NOT NULL THEN 'exact'
            WHEN n.near_dup_of IS NOT NULL THEN 'near'
            ELSE 'keep' END AS verdict
FROM batch b
LEFT JOIN exact e ON b.doc_id = e.doc_id
LEFT JOIN near n ON b.doc_id = n.doc_id
"""
    return f"""
WITH corpus AS ({corpus_sql}),
batch AS (
  {batch_sql}
),
{side_ctes("c", "corpus")},
{side_ctes("b", "batch")},
exact AS (
  SELECT DISTINCT b.doc_id
  FROM batch b JOIN (SELECT DISTINCT md5(text) AS dig FROM corpus) d
    ON md5(b.text) = d.dig
),
cand AS (
  SELECT DISTINCT c.doc_id AS id_c, b.doc_id AS id_b
  FROM bands_c c JOIN bands_b b ON c.band = b.band AND {key_eq}
),
inter AS (
  SELECT p.id_c, p.id_b, count(DISTINCT sa.hv) AS i
  FROM cand p
  JOIN shh_c sa ON sa.doc_id = p.id_c
  JOIN shh_b sb ON sb.doc_id = p.id_b AND sb.hv = sa.hv
  GROUP BY p.id_c, p.id_b
),
near AS (
  SELECT id_b AS doc_id, min(id_c) AS near_dup_of, max(jac) AS max_jaccard
  FROM (
    SELECT i.id_c, i.id_b,
           cast(i.i as double) / cast(nc.n + nb.n - i.i as double) AS jac
    FROM inter i
    JOIN sizes_c nc ON i.id_c = nc.doc_id
    JOIN sizes_b nb ON i.id_b = nb.doc_id
  ) WHERE jac >= {threshold}
  GROUP BY id_b
)
{final_select or default_final}
"""


def dedup_components_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs → duplicate CLUSTERS via alternating large-star/
    small-star (O(log n) rounds — survives chain-shaped clusters that
    exceed min-label propagation's diameter bound; both forms are
    differential-tested equal). Oracle = the same fixpoint from a
    DuckDB recursive CTE over the same pairs."""
    docs = load_table(spark, sf_dir, "documents")
    # persist: connected_components_star consumes the pair frame
    # twice (edge persist + node set) — without this the whole
    # shingle->minhash->band pipeline re-runs per consumer
    pairs = D.minhash_lsh_dedup(docs).persist()
    return D.connected_components_star(pairs)


def pipeline_ingest_batch_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The continuous-crawl composite: quality/language-screen a new
    batch (odd doc_ids), then screen the survivors against the
    existing corpus (even doc_ids) with the incremental dedup, and
    report per-source acceptance stats — the nightly-ingest shape of
    `clean_corpus` (which is the bootstrap shape)."""
    from ora_ch_spark.operators.pipeline import _fused_lang_quality

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter("doc_id % 2 = 0")
    batch = docs.filter("doc_id % 2 = 1")
    lq = _fused_lang_quality(batch)
    kept = (
        batch.join(lq, "doc_id")
        .filter("predicted_lang = 'en' AND quality_score >= 0.3")
        .select(*docs.columns)
        # persist: the incremental dedup consumes `kept` twice (md5
        # digest screen + shingle arrays) — without this the
        # regex-heavy lang/quality screen re-runs per consumer
        # (measured 3.3-3.8 → 2.3-2.5 s at sf0.1; PLANS.md r9)
        .persist()
    )
    out = D.incremental_minhash_dedup(corpus, kept)
    ex = (F.col("verdict") == "exact").cast("long")
    nr = (F.col("verdict") == "near").cast("long")
    kp = (F.col("verdict") == "keep").cast("long")
    return (
        out.join(batch.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_screened"),
            F.sum(ex).alias("n_exact"),
            F.sum(nr).alias("n_near"),
            F.sum(kp).alias("n_keep"),
        )
    )


def _ingest_batch_oracle() -> str:
    stop_set = ", ".join(f"'{w}'" for w in TX.STOPWORDS_EN)
    lex_values = ", ".join(
        f"('{lang}', '{w}')"
        for lang, words in sorted(TX.LANG_LEXICON.items())
        for w in words
    )
    batch_sql = f"""SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars
  FROM documents d
  JOIN (
    SELECT tq.doc_id
    FROM (
      SELECT doc_id,
             0.4 * (cast(n_stop as double) / cast(n_tokens as double))
           + 0.3 * least(cast(sum_tok_len as double) / cast(n_tokens as double) / 10.0, 1.0)
           + 0.3 * least(cast(n_tokens as double) / 100.0, 1.0) AS quality_score
      FROM (
        SELECT doc_id, count(*) AS n_tokens,
               sum(CASE WHEN tok IN ({stop_set}) THEN 1 ELSE 0 END) AS n_stop,
               sum(length(tok)) AS sum_tok_len
        FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
              FROM documents WHERE doc_id % 2 = 1)
        GROUP BY doc_id
      )
    ) tq
    JOIN (
      SELECT doc_id FROM (
        SELECT doc_id, cand_lang,
               row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, cand_lang) AS rn
        FROM (
          SELECT doc_id, cand_lang, count(*) AS hits
          FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
                FROM documents WHERE doc_id % 2 = 1) t
          JOIN (SELECT * FROM (VALUES {lex_values}) lx(cand_lang, tok)) lex USING (tok)
          GROUP BY 1, 2
        )
      ) WHERE rn = 1 AND cand_lang = 'en'
    ) pl ON tq.doc_id = pl.doc_id
    WHERE tq.quality_score >= 0.3
  ) keepb ON d.doc_id = keepb.doc_id
  WHERE d.doc_id % 2 = 1"""
    final = """
SELECT b.source,
       count(*) AS n_screened,
       cast(sum(CASE WHEN e.doc_id IS NOT NULL THEN 1 ELSE 0 END) as bigint) AS n_exact,
       cast(sum(CASE WHEN e.doc_id IS NULL AND n.near_dup_of IS NOT NULL THEN 1 ELSE 0 END) as bigint) AS n_near,
       cast(sum(CASE WHEN e.doc_id IS NULL AND n.near_dup_of IS NULL THEN 1 ELSE 0 END) as bigint) AS n_keep
FROM batch b
LEFT JOIN exact e ON b.doc_id = e.doc_id
LEFT JOIN near n ON b.doc_id = n.doc_id
GROUP BY b.source
"""
    return _incremental_oracle(batch_sql=batch_sql, final_select=final)


# ---------------------------------------------------------------------------
# Line-level corpus hygiene (C4 line dedup / boilerplate removal)
# ---------------------------------------------------------------------------

_LD_TPL = 12  # tokens per synthetic line for the line-dedup entry
_BP_TPL = 4   # shorter lines for boilerplate so cross-doc repeats exist
_BP_MIN_DOCS = 5  # ~1% of lines flagged at sf0.01, ~2% at sf0.1 — measured


def _chunk_lines_sql(tpl: int) -> str:
    """DuckDB replay of chunk_lines: 0-based line_no, fixed-size token
    windows (two positionally-zipped unnests)."""
    return f"""
d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
l AS (
  SELECT doc_id, unnest(range(0, nl)) AS line_no,
         unnest([array_to_string(t[j * {tpl} + 1 : j * {tpl} + {tpl}], ' ')
                 for j in range(0, nl)]) AS line
  FROM (SELECT doc_id, t, cast(ceil(len(t) / {tpl}.0) as bigint) AS nl FROM d)
)"""


_REASSEMBLE_SQL = """
r AS (
  SELECT doc_id, count(*) AS n_kept,
         string_agg(line, ' ' ORDER BY line_no) AS txt
  FROM kept GROUP BY 1
),
tot AS (SELECT doc_id, count(*) AS n_lines FROM l GROUP BY 1)
SELECT tot.doc_id, n_lines,
       cast(coalesce(n_kept, 0) as bigint) AS n_kept,
       md5(coalesce(txt, '')) AS kept_md5,
       length(coalesce(txt, ''))::BIGINT AS kept_len
FROM tot LEFT JOIN r USING (doc_id)"""


def line_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ora_ch_spark.operators.lines import chunk_lines, line_dedup

    docs = load_table(spark, sf_dir, "documents")
    return line_dedup(chunk_lines(docs, tokens_per_line=_LD_TPL))


# keep-first == row_number over (doc, line_no) per line == min(struct)
LINE_DEDUP_ORACLE = f"""
WITH {_chunk_lines_sql(_LD_TPL)},
kept AS (
  SELECT doc_id, line_no, line FROM (
    SELECT *, row_number() OVER (PARTITION BY line
                                 ORDER BY doc_id, line_no) AS rn FROM l
  ) WHERE rn = 1
),
{_REASSEMBLE_SQL}
"""


def boilerplate_strip_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ora_ch_spark.operators.lines import chunk_lines, strip_boilerplate

    docs = load_table(spark, sf_dir, "documents")
    return strip_boilerplate(
        chunk_lines(docs, tokens_per_line=_BP_TPL), min_docs=_BP_MIN_DOCS
    )


BOILERPLATE_ORACLE = f"""
WITH {_chunk_lines_sql(_BP_TPL)},
boiler AS (
  SELECT line FROM (
    SELECT line, count(DISTINCT doc_id) AS nd FROM l GROUP BY 1
  ) WHERE nd >= {_BP_MIN_DOCS}
),
kept AS (SELECT doc_id, line_no, line FROM l WHERE line NOT IN (SELECT line FROM boiler)),
{_REASSEMBLE_SQL}
"""


# ---------------------------------------------------------------------------
# BM25 keyword search (inverted-index ranking)
# ---------------------------------------------------------------------------

_BM25_QUERIES: list[tuple[int, list[str]]] = [
    (1, ["table", "scan"]),
    (2, ["window", "agg", "join"]),
    (3, ["customer", "stream"]),
]


def bm25_search_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ora_ch_spark.operators.search import bm25_topk

    docs = load_table(spark, sf_dir, "documents")
    return bm25_topk(docs, _BM25_QUERIES)


def _bm25_oracle() -> str:
    """Replays rational-idf BM25 (k1=1.25, b=0.75 — all derived
    constants exact binary fractions) with the same evaluation order
    as the Spark expressions; per-term contributions rounded to 9dp
    and summed as DECIMAL so addition order can't matter."""
    qvals = ", ".join(
        f"({qid}, '{t}')" for qid, terms in _BM25_QUERIES for t in terms
    )
    return f"""
WITH qt AS (SELECT * FROM (VALUES {qvals}) v(query_id, term)),
tk AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents),
dl AS (SELECT doc_id, count(*) AS dl FROM tk GROUP BY 1),
tot AS (SELECT count(*) AS n_docs,
               cast(sum(dl) as double) / count(*) AS avgdl FROM dl),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tk
       WHERE term IN (SELECT DISTINCT term FROM qt) GROUP BY 1, 2),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
c AS (
  SELECT tf.doc_id, tf.term,
         round(
           ((cast(n_docs - df as double) + 0.5) / (cast(df as double) + 0.5))
           * (cast(tf as double) * 2.25
              / (cast(tf as double)
                 + 1.25 * (0.25 + 0.75 * cast(dl as double) / avgdl))),
           9)::DECIMAL(28,9) AS c
  FROM tf JOIN dl USING (doc_id) JOIN dfreq USING (term) CROSS JOIN tot
),
s AS (
  SELECT query_id, doc_id, round(cast(sum(c) as double), 6) AS score
  FROM c JOIN qt USING (term) GROUP BY 1, 2
)
SELECT query_id, doc_id,
       cast(row_number() OVER (PARTITION BY query_id
                               ORDER BY score DESC, doc_id) as int) AS rank,
       score
FROM s
QUALIFY rank <= 10
"""


# ---------------------------------------------------------------------------
# K-means over embeddings (Lloyd, quantized-integer trajectory)
# ---------------------------------------------------------------------------

_KM_K = 8


def kmeans_embeddings_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ora_ch_spark.operators.cluster import kmeans_assign

    # canonical output order (gate entries end in a defined total
    # order; mapInPandas emission order is partition-dependent)
    return kmeans_assign(
        load_table(spark, sf_dir, "embeddings"), k=_KM_K, iters=2
    ).orderBy("vec_id")


# full 2-iteration trajectory replay: init = k lowest vec_ids,
# assign (tie → lowest cluster), integer-grid centroid update
# (floor of exact-double mean), final assign. CTE block shared with
# the diversity-sample and kmeans-IVF oracles, which continue the
# pipeline (ce1 = the trained centroids, per-dimension).
def _kmeans_ctes(k: int) -> str:
    return f"""
WITH q AS (SELECT vec_id, {_QE} AS qe FROM embeddings),
e AS (SELECT vec_id, unnest(qe) AS v, unnest(range(1, len(qe) + 1)) AS i FROM q),
c0 AS (
  SELECT cast(row_number() OVER (ORDER BY vec_id) - 1 as int) AS cluster, vec_id
  FROM (SELECT vec_id FROM q ORDER BY vec_id LIMIT {k})
),
ce0 AS (SELECT c0.cluster, e.i, e.v FROM c0 JOIN e USING (vec_id)),
d1 AS (
  SELECT e.vec_id, ce0.cluster, sum((e.v - ce0.v) * (e.v - ce0.v)) AS dist
  FROM e JOIN ce0 ON e.i = ce0.i GROUP BY 1, 2
),
a1 AS (
  SELECT vec_id, cluster FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY dist, cluster) AS rn FROM d1
  ) WHERE rn = 1
),
ce1 AS (
  SELECT a1.cluster, e.i,
         cast(floor(cast(sum(e.v) as double) / count(*)) as bigint) AS v
  FROM a1 JOIN e USING (vec_id) GROUP BY 1, 2
),
d2 AS (
  SELECT e.vec_id, ce1.cluster, sum((e.v - ce1.v) * (e.v - ce1.v)) AS dist
  FROM e JOIN ce1 ON e.i = ce1.i GROUP BY 1, 2
),
a2 AS (
  SELECT vec_id, cluster, dist FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY dist, cluster) AS rn FROM d2
  ) WHERE rn = 1
)"""

_KMEANS_CTES = _kmeans_ctes(_KM_K)

# cast(dist as bigint): DuckDB sum(BIGINT) is HUGEINT, which lands in
# pandas as float64 while Spark's bigint sum is int64 — same values,
# different dtype, and a dtype-sensitive hash calls that a mismatch
# (the r4 gate did exactly that for every un-cast HUGEINT sum; the
# ORDER BY additionally pins a total output order)
KMEANS_ORACLE = _KMEANS_CTES + (
    "\nSELECT vec_id, cluster, cast(dist as bigint) AS dist FROM a2"
    "\nORDER BY vec_id\n"
)


def semdedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: kmeans-blocked within-cluster cosine dedup — the
    centroid-aware counterpart of the LSH-blocked embedding dedup."""
    from ora_ch_spark.operators.cluster import semdedup

    return semdedup(load_table(spark, sf_dir, "embeddings"), threshold=0.45, k=_KM_K)


# continues the kmeans trajectory replay: within-cluster pairs from
# the final assignment a2, integer dots/norms from the exploded table
# e, lowest-id witness per dropped vector
SEMDEDUP_ORACLE = _KMEANS_CTES + """,
nrm AS (SELECT vec_id, sum(v * v) AS nn FROM e GROUP BY 1),
pr AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.cluster
  FROM a2 a JOIN a2 b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
),
pdot AS (
  SELECT pr.id_a, pr.id_b, pr.cluster, sum(ea.v * eb.v) AS d
  FROM pr JOIN e ea ON ea.vec_id = pr.id_a
          JOIN e eb ON eb.vec_id = pr.id_b AND eb.i = ea.i
  GROUP BY 1, 2, 3
),
pcos AS (
  SELECT id_a, id_b, cluster,
         cast(d as double)
         / (sqrt(cast(na.nn as double)) * sqrt(cast(nb.nn as double))) AS cosine
  FROM pdot JOIN nrm na ON id_a = na.vec_id JOIN nrm nb ON id_b = nb.vec_id
),
hits AS (SELECT * FROM pcos WHERE cosine >= 0.45),
w AS (
  SELECT id_b, cluster, id_a, cosine,
         row_number() OVER (PARTITION BY id_b ORDER BY id_a) AS rn
  FROM hits
)
SELECT id_b AS vec_id, cluster, id_a AS witness_id, cosine
FROM w WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# SCD type-2 dimension merge
# ---------------------------------------------------------------------------

_SCD_INIT = "1992-01-01"
_SCD_BATCH = "1995-06-01"


def _scd2_updates(cust: DataFrame) -> DataFrame:
    """Deterministic snapshot batch derived from the customer table:
    every 7th key arrives in the batch (some with changed balance,
    every 14th with a changed segment, every 21st-but-not-14th fully
    unchanged — exercising the no-spurious-version rule), plus 15
    brand-new keys. +100.0 on a double is a single exact IEEE op, so
    change detection is engine-identical."""
    upd = cust.filter("c_custkey % 7 = 0").select(
        "c_custkey",
        F.when(F.col("c_custkey") % 21 == 0, F.col("c_acctbal"))
        .otherwise(F.col("c_acctbal") + F.lit(100.0))
        .alias("c_acctbal"),
        F.when(F.col("c_custkey") % 14 == 0, F.lit("SHIFTED"))
        .otherwise(F.col("c_mktsegment"))
        .alias("c_mktsegment"),
    )
    new = cust.filter("c_custkey % 100 = 0").select(
        (F.col("c_custkey") + 1000000).alias("c_custkey"),
        F.lit(0.0).alias("c_acctbal"),
        F.lit("NEWKEY").alias("c_mktsegment"),
    )
    return upd.unionByName(new)


def scd2_merge_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 history merge: bootstrap customer as the open history,
    apply one snapshot batch (changes + no-ops + new keys)."""
    from ora_ch_spark.operators.scd import as_scd2_base, scd2_merge

    cust = load_table(spark, sf_dir, "customer")
    base = as_scd2_base(
        cust, "c_custkey", ["c_acctbal", "c_mktsegment"], _SCD_INIT
    )
    return scd2_merge(
        base,
        _scd2_updates(cust),
        key_col="c_custkey",
        tracked_cols=["c_acctbal", "c_mktsegment"],
        batch_date=_SCD_BATCH,
    )


SCD2_ORACLE = f"""
WITH upd AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 21 = 0 THEN c_acctbal
              ELSE c_acctbal + 100.0 END AS c_acctbal,
         CASE WHEN c_custkey % 14 = 0 THEN 'SHIFTED'
              ELSE c_mktsegment END AS c_mktsegment
  FROM customer WHERE c_custkey % 7 = 0
  UNION ALL
  SELECT c_custkey + 1000000, 0.0, 'NEWKEY'
  FROM customer WHERE c_custkey % 100 = 0
),
cur AS (
  SELECT c_custkey, c_acctbal, c_mktsegment,
         TIMESTAMP '{_SCD_INIT}'::TIMESTAMP_NS AS eff_from,
         CAST(NULL AS TIMESTAMP_NS) AS eff_to, TRUE AS is_current
  FROM customer
),
chg AS (
  SELECT c.c_custkey
  FROM cur c JOIN upd u USING (c_custkey)
  WHERE c.c_acctbal IS DISTINCT FROM u.c_acctbal
     OR c.c_mktsegment IS DISTINCT FROM u.c_mktsegment
)
SELECT c.c_custkey, c.c_acctbal, c.c_mktsegment, c.eff_from,
       TIMESTAMP '{_SCD_BATCH}'::TIMESTAMP_NS AS eff_to, FALSE AS is_current
FROM cur c JOIN chg USING (c_custkey)
UNION ALL
SELECT * FROM cur WHERE c_custkey NOT IN (SELECT c_custkey FROM chg)
UNION ALL
SELECT u.c_custkey, u.c_acctbal, u.c_mktsegment,
       TIMESTAMP '{_SCD_BATCH}'::TIMESTAMP_NS, CAST(NULL AS TIMESTAMP_NS), TRUE
FROM upd u
WHERE u.c_custkey IN (SELECT c_custkey FROM chg)
   OR u.c_custkey NOT IN (SELECT c_custkey FROM cur)
"""


def sim_topk_pq_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-compressed top-5 by ADC distance: 4 subspaces × 16 codes,
    full integer-kmeans training replayed by the oracle."""
    from ora_ch_spark.operators.pq import pq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return pq_topk(emb, query_ids=emb.filter("vec_id < 10")).orderBy(
        "q_id", "rank"
    )


def _pq_oracle(m: int = 4, k: int = 16, sub: int = 16, topk: int = 5) -> str:
    """Replays PQ end-to-end: per-subspace Lloyd (init = first k ids,
    one floor-of-mean update), encode via the final codebooks, ADC
    table from the query rows of the same distance relation, summed
    lookups ranked ascending."""
    blocks = []
    for s in range(m):
        lo = s * sub
        blocks.append(f"""
sub{s} AS (SELECT vec_id, v, i - {lo} AS j FROM e WHERE i > {lo} AND i <= {lo + sub}),
c0_{s} AS (
  SELECT cast(row_number() OVER (ORDER BY vec_id) - 1 as int) AS code, vec_id
  FROM (SELECT vec_id FROM q ORDER BY vec_id LIMIT {k})
),
ce0_{s} AS (SELECT c0_{s}.code, s.j, s.v FROM c0_{s} JOIN sub{s} s USING (vec_id)),
d1_{s} AS (
  SELECT s.vec_id, ce.code, sum((s.v - ce.v) * (s.v - ce.v)) AS dist
  FROM sub{s} s JOIN ce0_{s} ce ON s.j = ce.j GROUP BY 1, 2
),
a1_{s} AS (
  SELECT vec_id, code FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, code) AS rn
    FROM d1_{s}) WHERE rn = 1
),
ce1_{s} AS (
  SELECT a1.code, s.j,
         cast(floor(cast(sum(s.v) as double) / count(*)) as bigint) AS v
  FROM a1_{s} a1 JOIN sub{s} s USING (vec_id) GROUP BY 1, 2
),
d2_{s} AS (
  SELECT s.vec_id, ce.code, sum((s.v - ce.v) * (s.v - ce.v)) AS dist
  FROM sub{s} s JOIN ce1_{s} ce ON s.j = ce.j GROUP BY 1, 2
),
enc_{s} AS (
  SELECT vec_id, code FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, code) AS rn
    FROM d2_{s}) WHERE rn = 1
),
dt_{s} AS (SELECT vec_id AS q_id, code, dist FROM d2_{s} WHERE vec_id < 10)""")
    parts = "\n  UNION ALL\n".join(
        f"  SELECT dt_{s}.q_id, e{s}.vec_id AS n_id, dt_{s}.dist"
        f" FROM enc_{s} e{s} JOIN dt_{s} ON e{s}.code = dt_{s}.code"
        for s in range(m)
    )
    return f"""
WITH q AS (SELECT vec_id, {_QE} AS qe FROM embeddings),
e AS (SELECT vec_id, unnest(qe) AS v, unnest(range(1, len(qe) + 1)) AS i FROM q),
{",".join(blocks)},
parts AS (
{parts}
),
adc AS (
  SELECT q_id, n_id, sum(dist) AS adc_dist
  FROM parts WHERE q_id != n_id GROUP BY 1, 2
)
SELECT q_id, n_id,
       cast(row_number() OVER (PARTITION BY q_id
                               ORDER BY adc_dist, n_id) as int) AS rank,
       cast(adc_dist as bigint) AS adc_dist
FROM adc QUALIFY rank <= {topk}
ORDER BY q_id, rank
"""


def sim_topk_sq8_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 scalar-quantized top-5: per-dimension 8-bit linear codes
    against corpus min/max, asymmetric (full-precision query vs
    decoded corpus) exact-integer L2."""
    from ora_ch_spark.operators.pq import sq8_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return sq8_topk(emb, query_ids=emb.filter("vec_id < 10")).orderBy(
        "q_id", "rank"
    )


# stats → encode → decode → asymmetric distance, all on the integer
# grid; // and div agree because every divided operand is ≥ 0
SIM_SQ8_ORACLE = f"""
WITH q AS (SELECT vec_id, {_QE} AS qe FROM embeddings),
e AS (SELECT vec_id, unnest(qe) AS v, unnest(range(1, len(qe) + 1)) AS i FROM q),
st AS (
  SELECT i, min(v) AS mn, greatest(1, max(v) - min(v)) AS rng
  FROM e GROUP BY 1
),
recon AS (
  SELECT e.vec_id, e.i,
         st.mn + ((((e.v - st.mn) * 255) // st.rng) * st.rng) // 255 AS rv
  FROM e JOIN st USING (i)
),
qq AS (SELECT vec_id AS q_id, i, v FROM e WHERE vec_id < 10),
dist AS (
  SELECT qq.q_id, r.vec_id AS n_id,
         sum((qq.v - r.rv) * (qq.v - r.rv)) AS sq_dist
  FROM qq JOIN recon r USING (i)
  WHERE qq.q_id != r.vec_id
  GROUP BY 1, 2
)
SELECT q_id, n_id,
       cast(row_number() OVER (PARTITION BY q_id
                               ORDER BY sq_dist, n_id) as int) AS rank,
       cast(sq_dist as bigint) AS sq_dist
FROM dist QUALIFY rank <= 5
ORDER BY q_id, rank
"""


def retrieval_eval_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gated index-quality metrics: the SQ8 run scored against the
    exact-L2 truth ranking — recall@5 / precision@5 / MRR@5 per
    query, every number replayed by the oracle."""
    from pyspark.sql import Window

    from ora_ch_spark.operators.mining import retrieval_eval
    from ora_ch_spark.operators.pq import sq8_topk
    from ora_ch_spark.operators.similarity import quantize

    emb = load_table(spark, sf_dir, "embeddings")
    run = sq8_topk(emb, query_ids=emb.filter("vec_id < 10"))
    q = quantize(emb).select("vec_id", "qe")
    pairs = (
        q.selectExpr("vec_id as n_id", "qe as qn")
        .crossJoin(
            F.broadcast(
                q.filter("vec_id < 10").selectExpr("vec_id as q_id", "qe as qq")
            )
        )
        .filter("q_id != n_id")
        .selectExpr(
            "q_id", "n_id",
            "aggregate(zip_with(qq, qn, (x, y) -> (x-y)*(x-y)), 0L,"
            " (acc, v) -> acc + v) as d",
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.asc("d"), F.asc("n_id"))
    truth = (
        pairs.withColumn("rank", F.row_number().over(w)).filter("rank <= 5")
        .select("q_id", "n_id", "rank")
    )
    return retrieval_eval(run, truth, 5).orderBy("q_id")


def _retrieval_eval_oracle() -> str:
    return f"""
WITH runq AS ({SIM_SQ8_ORACLE}),
q2 AS (SELECT vec_id, {_QE} AS qe FROM embeddings),
e2 AS (SELECT vec_id, unnest(qe) AS v, unnest(range(1, len(qe) + 1)) AS i FROM q2),
qq2 AS (SELECT vec_id AS q_id, i, v FROM e2 WHERE vec_id < 10),
dist2 AS (
  SELECT qq2.q_id, e2.vec_id AS n_id,
         sum((qq2.v - e2.v) * (qq2.v - e2.v)) AS d
  FROM qq2 JOIN e2 ON qq2.i = e2.i AND e2.vec_id != qq2.q_id
  GROUP BY 1, 2
),
truth AS (
  SELECT q_id, n_id,
         row_number() OVER (PARTITION BY q_id ORDER BY d, n_id) AS rank
  FROM dist2 QUALIFY rank <= 5
),
sizes AS (
  SELECT t.q_id, t.n_truth, r.n_run FROM
    (SELECT q_id, count(*) AS n_truth FROM truth GROUP BY 1) t
  FULL OUTER JOIN
    (SELECT q_id, count(*) AS n_run FROM runq GROUP BY 1) r
  USING (q_id)
),
hits AS (
  SELECT r.q_id, count(*) AS n_hits, min(r.rank) AS first_hit
  FROM runq r JOIN truth t ON r.q_id = t.q_id AND r.n_id = t.n_id
  GROUP BY 1
)
SELECT s.q_id,
       cast(coalesce(h.n_hits, 0) as bigint) AS n_hits,
       cast(coalesce(h.n_hits, 0) as double) / s.n_truth AS recall_at_k,
       cast(coalesce(h.n_hits, 0) as double) / s.n_run AS precision_at_k,
       coalesce(1.0 / h.first_hit, 0.0) AS mrr_at_k
FROM sizes s LEFT JOIN hits h USING (q_id)
ORDER BY q_id
"""


def sim_topk_ivf_kmeans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k with a LEARNED coarse quantizer: the k-means
    centroids (k=16, 2 Lloyd iterations) replace the first-16-by-id
    seed pick — same index plan, better list geometry."""
    from ora_ch_spark.operators.cluster import kmeans_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    seeds = kmeans_centroids(emb, k=16, iters=2).select(
        F.col("cluster").alias("c_id"), F.col("cq").alias("qc")
    )
    return S.ivf_topk(emb, query_ids=emb.filter("vec_id < 10"), seeds=seeds)


# kmeans training replay (k=16) up to ce1 = trained per-dim centroids,
# then the IVF probe/assign/rank replay against those centroids
SIM_IVF_KMEANS_ORACLE = _kmeans_ctes(16) + """,
nrm AS (SELECT vec_id, sum(v * v) AS nn FROM e GROUP BY 1),
snrm AS (SELECT cluster AS c_id, sum(v * v) AS nn FROM ce1 GROUP BY 1),
cdot AS (
  SELECT e.vec_id, ce1.cluster AS c_id, sum(e.v * ce1.v) AS d
  FROM e JOIN ce1 ON e.i = ce1.i GROUP BY 1, 2
),
ccos AS (
  SELECT cdot.vec_id, cdot.c_id,
         cast(d as double) / (sqrt(cast(n1.nn as double)) * sqrt(cast(n2.nn as double))) AS cos
  FROM cdot JOIN nrm n1 ON cdot.vec_id = n1.vec_id JOIN snrm n2 ON cdot.c_id = n2.c_id
),
iassign AS (
  SELECT vec_id, c_id AS centroid FROM (
    SELECT vec_id, c_id, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, c_id) AS r
    FROM ccos
  ) WHERE r = 1
),
probes AS (
  SELECT vec_id AS q_id, c_id AS centroid FROM (
    SELECT vec_id, c_id, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, c_id) AS r
    FROM ccos WHERE vec_id < 10
  ) WHERE r <= 2
),
cands AS (
  SELECT p.q_id, a.vec_id AS n_id
  FROM probes p JOIN iassign a ON p.centroid = a.centroid
  WHERE a.vec_id != p.q_id
),
dot2 AS (
  SELECT c.q_id, c.n_id, sum(ea.v * eb.v) AS d
  FROM cands c
  JOIN e ea ON ea.vec_id = c.q_id
  JOIN e eb ON eb.vec_id = c.n_id AND eb.i = ea.i
  GROUP BY 1, 2
),
iscored AS (
  SELECT q_id, n_id,
         cast(d as double) / (sqrt(cast(nq.nn as double)) * sqrt(cast(nb.nn as double))) AS cosine
  FROM dot2 JOIN nrm nq ON q_id = nq.vec_id JOIN nrm nb ON n_id = nb.vec_id
),
iranked AS (
  SELECT q_id, n_id, cosine,
         cast(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) as int) AS rank
  FROM iscored
)
SELECT q_id, n_id, rank, cosine FROM iranked WHERE rank <= 5
"""


# ---------------------------------------------------------------------------
# Quantile-threshold quality filter / tf-idf terms / bigram LM score
# ---------------------------------------------------------------------------


def quality_quantile_filter_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language median-quality cut: score every doc, keep docs at
    or above the language's discrete median score."""
    from ora_ch_spark.operators.sampling import quantile_threshold_filter

    docs = load_table(spark, sf_dir, "documents")
    scored = TX.quality_score(docs, carry_cols=("lang",))
    return quantile_threshold_filter(scored, group_col="lang")


def _quality_quantile_oracle() -> str:
    stop_set = ", ".join(f"'{w}'" for w in TX.STOPWORDS_EN)
    return f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok FROM documents
),
agg AS (
  SELECT doc_id, count(*) AS n_tokens,
         sum(CASE WHEN tok IN ({stop_set}) THEN 1 ELSE 0 END) AS n_stop,
         sum(length(tok)) AS sum_tok_len
  FROM tok GROUP BY doc_id
),
q AS (
  SELECT d.lang, a.doc_id,
         0.4 * (cast(n_stop as double) / cast(n_tokens as double))
       + 0.3 * least(cast(sum_tok_len as double) / cast(n_tokens as double) / 10.0, 1.0)
       + 0.3 * least(cast(n_tokens as double) / 100.0, 1.0) AS quality_score
  FROM agg a JOIN documents d USING (doc_id)
),
sz AS (SELECT lang, count(*) AS n_docs FROM q GROUP BY 1),
thr AS (
  SELECT lang, n_docs, quality_score AS threshold FROM (
    SELECT q.*, sz.n_docs,
           row_number() OVER (PARTITION BY lang
                              ORDER BY quality_score, doc_id) AS rn
    FROM q JOIN sz USING (lang)
  ) WHERE rn = cast(ceil(0.5 * n_docs) as int)
),
k AS (
  SELECT q.lang, count(*) AS n_kept
  FROM q JOIN thr USING (lang)
  WHERE quality_score >= threshold GROUP BY 1
)
SELECT lang, n_docs, threshold, n_kept FROM thr JOIN k USING (lang)
"""


def tfidf_top_terms_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ora_ch_spark.operators.search import tfidf_top_terms

    return tfidf_top_terms(load_table(spark, sf_dir, "documents"))


TFIDF_TERMS_ORACLE = """
WITH tk AS (SELECT source, unnest(string_split(lower(text), ' ')) AS term FROM documents),
tf AS (SELECT source, term, count(*) AS tf FROM tk GROUP BY 1, 2),
dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
ng AS (SELECT count(DISTINCT source) AS n_groups FROM documents),
s AS (
  SELECT source, term, tf, df,
         cast(tf as double) * cast(n_groups + 1 as double)
           / cast(df + 1 as double) AS tfidf
  FROM tf JOIN dfq USING (term) CROSS JOIN ng
)
SELECT source,
       cast(row_number() OVER (PARTITION BY source
                               ORDER BY tfidf DESC, term) as int) AS rank,
       term, tf, df, tfidf
FROM s
QUALIFY rank <= 5
"""


def bigram_lm_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ora_ch_spark.operators.search import bigram_lm_score

    return bigram_lm_score(load_table(spark, sf_dir, "documents"))


# replay: positional-zip bigrams, corpus conditional probabilities,
# 9dp-rounded decimal mean per doc (null when no bigrams)
BIGRAM_LM_ORACLE = """
WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
bg AS (
  SELECT doc_id, unnest(t[1:len(t) - 1]) AS w1, unnest(t[2:len(t)]) AS w2
  FROM d WHERE len(t) >= 2
),
pc AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
pfx AS (SELECT w1, cast(sum(c12) as bigint) AS c1 FROM pc GROUP BY 1),
pr AS (
  SELECT w1, w2,
         round(cast(c12 as double) / cast(c1 as double), 9)::DECIMAL(28,9) AS p
  FROM pc JOIN pfx USING (w1)
),
sc AS (
  SELECT doc_id, count(*) AS n_bigrams,
         round(cast(sum(p) as double) / cast(count(*) as double), 6) AS lm_score
  FROM bg JOIN pr USING (w1, w2) GROUP BY 1
)
SELECT dd.doc_id,
       cast(coalesce(n_bigrams, 0) as bigint) AS n_bigrams,
       lm_score
FROM (SELECT doc_id FROM documents) dd LEFT JOIN sc USING (doc_id)
"""


# ---------------------------------------------------------------------------
# Binned interval join + table profiling
# ---------------------------------------------------------------------------


def interval_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily 08:00–10:30 maintenance windows (derived from the event
    days) range-joined to events via time binning; per-window rollup.
    Empty windows survive with zero counts (left join)."""
    from ora_ch_spark.operators.asof import interval_join_binned

    ev = load_table(spark, sf_dir, "events")
    iv = (
        ev.select(F.date_trunc("day", F.col("ts")).alias("day"))
        .distinct()
        .select(
            (F.col("day") + F.expr("INTERVAL 8 HOURS")).alias("window_start"),
            (F.col("day") + F.expr("INTERVAL 630 MINUTES")).alias("window_end"),
        )
    )
    joined = interval_join_binned(ev, iv)
    agg = joined.groupBy("window_start", "window_end").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
    )
    return iv.join(agg, ["window_start", "window_end"], "left").select(
        "window_start",
        "window_end",
        F.coalesce(F.col("n_events"), F.lit(0).cast("bigint")).alias("n_events"),
        "total_value",
    )


# the oracle uses DuckDB's native range join — a genuinely different
# algorithm (IEJoin) than the binned equi-join, so this differentially
# proves the binning transformation itself
INTERVAL_JOIN_ORACLE = """
WITH days AS (SELECT DISTINCT date_trunc('day', ts) AS day FROM events),
iv AS (
  SELECT day + INTERVAL 8 HOUR AS window_start,
         day + INTERVAL 630 MINUTE AS window_end
  FROM days
)
SELECT window_start, window_end,
       cast(count(e.ts) as bigint) AS n_events,
       cast(sum(cast(e.value as decimal(18,2))) as double) AS total_value
FROM iv LEFT JOIN events e
  ON e.ts >= window_start AND e.ts <= window_end
GROUP BY 1, 2
"""


def profile_events_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ora_ch_spark.operators.profile import profile_table

    return profile_table(load_table(spark, sf_dir, "events"))


def _profile_oracle() -> str:
    cols = {
        "event_id": "num", "ts": "us", "user_id": "num",
        "event_type": "str", "value": "num", "props": "str",
    }
    parts = []
    for c, kind in cols.items():
        if kind == "num":
            mn, mx = f"cast(min({c}) as double)", f"cast(max({c}) as double)"
            mns = mxs = "cast(null as varchar)"
        elif kind == "us":
            mn, mx = f"epoch_us(min({c}))::DOUBLE", f"epoch_us(max({c}))::DOUBLE"
            mns = mxs = "cast(null as varchar)"
        else:
            mn = mx = "cast(null as double)"
            mns, mxs = f"min({c})", f"max({c})"
        parts.append(f"""
SELECT '{c}' AS col_name, (SELECT count(*) FROM events) AS n_rows,
       count({c}) AS n_nonnull, count(DISTINCT {c}) AS n_distinct,
       {mn} AS min_num, {mx} AS max_num, {mns} AS min_str, {mxs} AS max_str
FROM events""")
    return "\nUNION ALL\n".join(parts)


# ---------------------------------------------------------------------------
# Mergeable sketches (operators/sketches.py) — distinct counts and
# quantiles as per-group summaries merged WITHOUT re-scanning the
# base table; the `__all__` row in each result is computed purely
# from the per-group sketch rows (register max / count sum).
# ---------------------------------------------------------------------------

# the Spark-side key (concat_ws in hll_distinct_rollup_q) must build
# the exact string this SQL expression builds — that pairing IS the
# cross-engine contract
def hll_distinct_rollup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct user-days (~DAU) per event_type via md5-HLL registers,
    plus a global '__all__' row obtained by MERGING the per-type
    registers (max per bucket) — no second scan of events. Exact
    distincts ride along to expose the sketch error in the output."""
    from ora_ch_spark.operators import sketches as SK

    ev = load_table(spark, sf_dir, "events")
    key = F.concat_ws(
        ":", F.col("user_id"), F.col("ts").cast("date").cast("string")
    )
    base = ev.select(F.col("event_type").alias("grp"), key.alias("k"))
    reg = SK.hll_registers(base, F.col("k"), ["grp"]).persist()
    merged = (
        SK.hll_merge(reg.drop("grp"), [])
        .withColumn("grp", F.lit("__all__"))
        .select("grp", "bucket", "M")
    )
    est = SK.hll_estimate(reg.unionByName(merged), ["grp"])
    exact = base.groupBy("grp").agg(
        F.countDistinct("k").alias("exact_distinct")
    )
    exact_all = base.agg(
        F.lit("__all__").alias("grp"),
        F.countDistinct("k").alias("exact_distinct"),
    )
    return est.join(
        exact.unionByName(exact_all), "grp", "inner"
    ).select("grp", "n_buckets", "est_distinct", "exact_distinct")


def _hll_rollup_oracle() -> str:
    from ora_ch_spark.operators.sketches import ALPHA_M2, HLL_M, W

    return f"""
WITH h AS (
  SELECT event_type AS grp,
         {_HLL_KEY_SQL} AS k,
         ('0x' || substr(md5({_HLL_KEY_SQL}), 1, 15))::BIGINT AS hv
  FROM events
),
reg AS (
  SELECT grp, hv % {HLL_M} AS bucket,
         max(CASE WHEN hv // {HLL_M} = 0 THEN {W + 1}
                  ELSE {W + 1} - length(bin(hv // {HLL_M})) END) AS M
  FROM h GROUP BY 1, 2
),
regall AS (
  SELECT grp, bucket, M FROM reg
  UNION ALL
  SELECT '__all__' AS grp, bucket, max(M) AS M FROM reg GROUP BY 2
),
pg AS (SELECT grp, max(M) AS maxM, count(*) AS V FROM regall GROUP BY 1),
zs AS (
  SELECT r.grp, pg.maxM, pg.V,
         sum(1::BIGINT << cast(pg.maxM - r.M as int))::BIGINT AS Zobs
  FROM regall r JOIN pg USING (grp) GROUP BY 1, 2, 3
),
est AS (
  SELECT grp, cast(V as bigint) AS n_buckets,
         {ALPHA_M2!r} * power(2.0, maxM)
           / cast(Zobs + ({HLL_M} - V) * (1::BIGINT << cast(maxM as int)) as double)
           AS est_distinct
  FROM zs
),
ex AS (
  SELECT grp, count(DISTINCT k) AS exact_distinct FROM h GROUP BY 1
  UNION ALL
  SELECT '__all__' AS grp, count(DISTINCT k) AS exact_distinct FROM h
)
SELECT grp, n_buckets, est_distinct, exact_distinct
FROM est JOIN ex USING (grp)
"""


def hll_sliding_window_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 3-day distinct users per event_type — the sliding-
    window form of the HLL rollup: per-day registers are built ONCE,
    each day's window estimate merges the 3 relevant register sets
    (explode day → covered target days, bucket-max) — the base table
    is never re-scanned per window, which is the entire point of
    mergeable sketches for windowed metrics at 100 TB. Exact trailing
    distincts ride along to expose the sketch error."""
    from ora_ch_spark.operators import sketches as SK

    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        F.col("event_type").alias("grp"),
        F.col("ts").cast("date").alias("day"),
        F.col("user_id").cast("string").alias("k"),
    )
    reg = SK.hll_registers(base, F.col("k"), ["grp", "day"]).persist()
    days = base.select("grp", "day").distinct()
    # a day's registers serve the windows ending on day..day+2
    spread = reg.withColumn(
        "t", F.explode(F.expr("sequence(day, date_add(day, 2))"))
    )
    win = (
        spread.groupBy("grp", F.col("t").alias("day"), "bucket")
        .agg(F.max("M").alias("M"))
        .join(days, ["grp", "day"], "left_semi")  # only days with data
    )
    est = SK.hll_estimate(win, ["grp", "day"])
    exact = (
        base.select("grp", "day").distinct()
        .withColumn("src", F.explode(F.expr("sequence(date_sub(day, 2), day)")))
        .join(
            base.select(F.col("grp"), F.col("day").alias("src"), "k"),
            ["grp", "src"],
        )
        .groupBy("grp", "day")
        .agg(F.countDistinct("k").alias("exact_distinct"))
    )
    return (
        est.join(exact, ["grp", "day"])
        .select(
            "grp",
            F.col("day").cast("string").alias("day"),
            "n_buckets", "est_distinct", "exact_distinct",
        )
        .orderBy("grp", "day")
    )


def _hll_sliding_oracle() -> str:
    from ora_ch_spark.operators.sketches import ALPHA_M2, HLL_M, W

    return f"""
WITH h AS (
  SELECT event_type AS grp, ts::DATE AS day,
         cast(user_id as varchar) AS k,
         ('0x' || substr(md5(cast(user_id as varchar)), 1, 15))::BIGINT AS hv
  FROM events
),
reg AS (
  SELECT grp, day, hv % {HLL_M} AS bucket,
         max(CASE WHEN hv // {HLL_M} = 0 THEN {W + 1}
                  ELSE {W + 1} - length(bin(hv // {HLL_M})) END) AS M
  FROM h GROUP BY 1, 2, 3
),
days AS (SELECT DISTINCT grp, day FROM h),
spread AS (
  SELECT r.grp, r.day + cast(off as int) AS day, r.bucket, r.M
  FROM reg r, (SELECT unnest(range(0, 3)) AS off)
),
win AS (
  SELECT s.grp, s.day, s.bucket, max(s.M) AS M
  FROM spread s SEMI JOIN days d ON s.grp = d.grp AND s.day = d.day
  GROUP BY 1, 2, 3
),
pg AS (SELECT grp, day, max(M) AS maxM, count(*) AS V FROM win GROUP BY 1, 2),
zs AS (
  SELECT w.grp, w.day, pg.maxM, pg.V,
         sum(1::BIGINT << cast(pg.maxM - w.M as int))::BIGINT AS Zobs
  FROM win w JOIN pg USING (grp, day) GROUP BY 1, 2, 3, 4
),
est AS (
  SELECT grp, day, cast(V as bigint) AS n_buckets,
         {ALPHA_M2!r} * power(2.0, maxM)
           / cast(Zobs + ({HLL_M} - V) * (1::BIGINT << cast(maxM as int)) as double)
           AS est_distinct
  FROM zs
),
ex AS (
  SELECT d.grp, d.day, count(DISTINCT h2.k) AS exact_distinct
  FROM days d JOIN h h2
    ON h2.grp = d.grp AND h2.day BETWEEN d.day - 2 AND d.day
  GROUP BY 1, 2
)
SELECT grp, cast(day as varchar) AS day, n_buckets, est_distinct,
       exact_distinct
FROM est JOIN ex USING (grp, day)
ORDER BY grp, day
"""


HIST_WIDTH = 5.0


def hist_quantile_sketch_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p90/p99 of events.value per event_type from a fixed-width
    histogram sketch; the '__all__' row merges the per-type histograms
    (count sum per bin) — again no base-table re-scan."""
    from ora_ch_spark.operators import sketches as SK

    ev = load_table(spark, sf_dir, "events").withColumnRenamed(
        "event_type", "grp"
    )
    hist = SK.histogram_sketch(ev, "value", ["grp"], HIST_WIDTH).persist()
    merged = (
        hist.groupBy("bin")
        .agg(F.sum("cnt").alias("cnt"))
        .withColumn("grp", F.lit("__all__"))
        .select("grp", "bin", "cnt")
    )
    return SK.histogram_quantiles(
        hist.unionByName(merged), ["grp"], HIST_WIDTH
    )


def _hist_quantile_oracle() -> str:
    # bespoke replay (operators/sketches.py histogram_oracle_sql is the
    # single-level form) with the merged '__all__' histogram unioned in
    return f"""
WITH hist0 AS (
  SELECT event_type AS grp,
         cast(floor(value / {HIST_WIDTH!r}) as bigint) AS bin,
         count(*) AS cnt
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
),
hist AS (
  SELECT grp, bin, cnt FROM hist0
  UNION ALL
  SELECT '__all__' AS grp, bin, sum(cnt) AS cnt FROM hist0 GROUP BY 2
),
cum AS (
  SELECT grp, bin, cnt,
         sum(cnt) OVER (PARTITION BY grp ORDER BY bin
                        ROWS UNBOUNDED PRECEDING) AS cum,
         sum(cnt) OVER (PARTITION BY grp) AS total
  FROM hist
)
SELECT grp, cast(sum(cnt) as bigint) AS n,
       cast(min(CASE WHEN cast(cum as double) >= 0.5 * cast(total as double)
                THEN bin END) + 1 as double) * {HIST_WIDTH!r} AS p50,
       cast(min(CASE WHEN cast(cum as double) >= 0.9 * cast(total as double)
                THEN bin END) + 1 as double) * {HIST_WIDTH!r} AS p90,
       cast(min(CASE WHEN cast(cum as double) >= 0.99 * cast(total as double)
                THEN bin END) + 1 as double) * {HIST_WIDTH!r} AS p99
FROM cum GROUP BY grp
"""


def cms_heavy_hitters_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch frequency estimates for the top-20 users by
    exact event count: (user_id, exact_cnt, est_cnt) with
    est_cnt ≥ exact_cnt (CMS one-sided error). The sketch is 4×256
    counters regardless of input size; per-slice sketches merge by
    counter sum (operators/sketches.py cms_merge)."""
    from ora_ch_spark.operators import sketches as SK

    ev = load_table(spark, sf_dir, "events")
    base = ev.select(F.col("user_id").cast("string").alias("k"))
    cms = SK.cms_build(base, F.col("k")).persist()
    exact = base.groupBy("k").agg(F.count(F.lit(1)).alias("exact_cnt"))
    est = SK.cms_estimate(cms, exact.select("k"), "k")
    top = exact.orderBy(
        F.col("exact_cnt").desc(), F.col("k").cast("bigint")
    ).limit(20)
    return top.join(est, "k", "inner").select(
        F.col("k").cast("bigint").alias("user_id"), "exact_cnt", "est_cnt"
    )


def _cms_oracle() -> str:
    from ora_ch_spark.operators.sketches import cms_oracle_sql

    est = cms_oracle_sql("cast(user_id as varchar)", "events")
    return f"""
WITH est AS ({est}),
ex AS (
  SELECT cast(user_id as varchar) AS k, cast(count(*) as bigint) AS exact_cnt
  FROM events GROUP BY 1
),
top AS (SELECT * FROM ex ORDER BY exact_cnt DESC, cast(k as bigint) LIMIT 20)
SELECT cast(t.k as bigint) AS user_id, t.exact_cnt, e.est_cnt
FROM top t JOIN est e USING (k)
"""


BLOOM_THR = 400000.0


def bloom_prune_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom pre-filter in front of a fact⋈dim semi-join: build the
    filter over high-value order keys, prune lineitem with k
    broadcast position probes, exact-join the survivors. One row:
    (n_fact, n_bloom_pass, n_exact, n_false_pos) — quantifying the
    shuffle rows the filter saves and the FP overhead it costs."""
    from ora_ch_spark.operators import bloomjoin as BJ

    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > BLOOM_THR
    )
    li = load_table(spark, sf_dir, "lineitem")
    bloom = BJ.bloom_build(orders, "o_orderkey").persist()
    pruned = BJ.bloom_prune(li, "l_orderkey", bloom).persist()
    exact = pruned.join(
        F.broadcast(orders.select(F.col("o_orderkey").alias("l_orderkey"))),
        "l_orderkey",
        "left_semi",
    )
    return (
        li.agg(F.count(F.lit(1)).alias("n_fact"))
        .crossJoin(pruned.agg(F.count(F.lit(1)).alias("n_bloom_pass")))
        .crossJoin(exact.agg(F.count(F.lit(1)).alias("n_exact")))
        .select(
            "n_fact",
            "n_bloom_pass",
            "n_exact",
            (F.col("n_bloom_pass") - F.col("n_exact")).alias("n_false_pos"),
        )
    )


def _bloom_oracle() -> str:
    from ora_ch_spark.operators.bloomjoin import BLOOM_K, BLOOM_M

    def pos(i: str) -> str:
        return (
            f"('0x' || substr(md5('bf{i}' || ':' || k), 1, 15))::BIGINT % {BLOOM_M}"
        )

    builds = "\nUNION ALL\n".join(
        f"SELECT {pos(i)} AS pos FROM keys" for i in range(BLOOM_K)
    )
    probes = " AND ".join(
        f"EXISTS (SELECT 1 FROM bloom b WHERE b.pos = {pos(i)})"
        for i in range(BLOOM_K)
    )
    return f"""
WITH keys AS (
  SELECT o_orderkey, cast(o_orderkey as varchar) AS k
  FROM orders WHERE o_totalprice > {BLOOM_THR!r}
),
bloom AS (SELECT DISTINCT pos FROM ({builds})),
fact AS (SELECT l_orderkey, cast(l_orderkey as varchar) AS k FROM lineitem),
passed AS (SELECT * FROM fact WHERE {probes})
SELECT
  (SELECT cast(count(*) as bigint) FROM lineitem) AS n_fact,
  (SELECT cast(count(*) as bigint) FROM passed) AS n_bloom_pass,
  (SELECT cast(count(*) as bigint) FROM passed p
    WHERE EXISTS (SELECT 1 FROM keys kk WHERE kk.o_orderkey = p.l_orderkey)) AS n_exact,
  (SELECT cast(count(*) as bigint) FROM passed) -
  (SELECT cast(count(*) as bigint) FROM passed p
    WHERE EXISTS (SELECT 1 FROM keys kk WHERE kk.o_orderkey = p.l_orderkey)) AS n_false_pos
"""


FUNNEL_STEPS = ("view", "click", "purchase")
FUNNEL_WINDOW_S = 72 * 3600  # spreads the sf0.01 cohort 35/50/65 across levels


def funnel_conversion_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH windowFunnel-style conversion depth (first-anchor rule):
    view → click → purchase within 72 h of each user's first view;
    rolled up to (level, n_users)."""
    from ora_ch_spark.operators.funnel import funnel_counts, window_funnel

    ev = load_table(spark, sf_dir, "events")
    return funnel_counts(
        window_funnel(ev, list(FUNNEL_STEPS), FUNNEL_WINDOW_S)
    )


def _funnel_oracle() -> str:
    w = FUNNEL_WINDOW_S * 1_000_000
    s1, s2, s3 = FUNNEL_STEPS
    return f"""
WITH b AS (SELECT user_id AS u, epoch_us(ts) AS us, event_type AS et FROM events),
f1 AS (SELECT u, min(us) AS t1 FROM b WHERE et = '{s1}' GROUP BY 1),
f2 AS (
  SELECT f1.u, f1.t1,
         min(CASE WHEN b.us > f1.t1 AND b.us <= f1.t1 + {w} THEN b.us END) AS t2
  FROM f1 LEFT JOIN b ON b.u = f1.u AND b.et = '{s2}'
  GROUP BY 1, 2
),
f3 AS (
  SELECT f2.u, f2.t1, f2.t2,
         min(CASE WHEN b.us > f2.t2 AND b.us <= f2.t1 + {w} THEN b.us END) AS t3
  FROM f2 LEFT JOIN b ON b.u = f2.u AND b.et = '{s3}'
  GROUP BY 1, 2, 3
),
lv AS (
  SELECT u, cast(1 + (t2 IS NOT NULL)::int + (t3 IS NOT NULL)::int as int) AS level
  FROM f3
)
SELECT level, cast(count(*) as bigint) AS n_users FROM lv GROUP BY 1
"""


RETENTION_CONDS = (
    "event_type = 'signup' AND ts < timestamp'2024-01-08 00:00:00'",
    "event_type = 'purchase' AND ts >= timestamp'2024-01-08 00:00:00'"
    " AND ts < timestamp'2024-01-15 00:00:00'",
    "event_type = 'purchase' AND ts >= timestamp'2024-01-15 00:00:00'"
    " AND ts < timestamp'2024-01-22 00:00:00'",
    "event_type = 'purchase' AND ts >= timestamp'2024-01-22 00:00:00'"
    " AND ts < timestamp'2024-01-29 00:00:00'",
)


def retention_cohort_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH retention()-style weekly cohort: users who signed up in the
    first week, seen PURCHASING in each of the next three weeks."""
    from ora_ch_spark.operators.funnel import retention

    ev = load_table(spark, sf_dir, "events")
    return retention(ev, list(RETENTION_CONDS))


def _retention_oracle() -> str:
    flags = ",\n         ".join(
        f"max(CASE WHEN {c} THEN 1 ELSE 0 END) AS f{i}"
        for i, c in enumerate(RETENTION_CONDS)
    )
    sums = ", ".join(
        f"sum(f0 * f{i}) AS r{i}" for i in range(len(RETENTION_CONDS))
    )
    rows = "\nUNION ALL\n".join(
        f"SELECT cast({i} as int) AS cond_index, cast(r{i} as bigint) AS n_users FROM s"
        for i in range(len(RETENTION_CONDS))
    )
    return f"""
WITH f AS (
  SELECT user_id,
         {flags}
  FROM events GROUP BY 1
),
s AS (SELECT {sums} FROM f)
{rows}
"""




def chunk_documents_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ora_ch_spark.operators.text import chunk_documents

    return chunk_documents(
        load_table(spark, sf_dir, "documents"), CHUNK_CHARS, CHUNK_OVERLAP
    )


def _chunk_oracle() -> str:
    stride = CHUNK_CHARS - CHUNK_OVERLAP
    return f"""
WITH n AS (
  SELECT doc_id, coalesce(text, '') AS text,
         greatest(1, cast(ceil((length(coalesce(text, '')) - {CHUNK_OVERLAP}) / {stride}.0) as int)) AS n_chunks
  FROM documents
),
i AS (SELECT doc_id, text, n_chunks, unnest(range(0, n_chunks)) AS cid FROM n)
SELECT doc_id, cast(cid as int) AS chunk_id,
       cast(cid * {stride} + 1 as int) AS chunk_start,
       substr(text, cast(cid * {stride} + 1 as int), {CHUNK_CHARS}) AS chunk_text,
       n_chunks
FROM i
"""


def diversity_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ora_ch_spark.operators.cluster import diversity_sample

    return diversity_sample(load_table(spark, sf_dir, "embeddings")).orderBy(
        "vec_id"
    )


# kmeans trajectory replay + md5-rank fixed-per-cluster reservoir
DIVERSITY_SAMPLE_ORACLE = _KMEANS_CTES + """
SELECT vec_id, cluster, cast(dist as bigint) AS dist FROM (
  SELECT a2.*, row_number() OVER (
    PARTITION BY cluster
    ORDER BY md5('div:' || cast(vec_id as varchar)), vec_id) AS rr
  FROM a2
) WHERE rr <= 10
ORDER BY vec_id
"""


def pipeline_curate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ora_ch_spark.operators.pipeline import curate_corpus

    return curate_corpus(load_table(spark, sf_dir, "documents"))


def _curate_oracle() -> str:
    """Full replay of curate_corpus: boilerplate strip (4-token lines,
    ≥5 docs) → quality score over the REBUILT text → per-lang discrete
    median cut → exact dedup by rebuilt-text digest → funnel summary."""
    stop_set = ", ".join(f"'{w}'" for w in TX.STOPWORDS_EN)
    return f"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
l AS (
  SELECT doc_id, unnest(range(0, nl)) AS line_no,
         unnest([array_to_string(t[j * 4 + 1 : j * 4 + 4], ' ')
                 for j in range(0, nl)]) AS line
  FROM (SELECT doc_id, t, cast(ceil(len(t) / 4.0) as bigint) AS nl FROM d)
),
boiler AS (
  SELECT line FROM (
    SELECT line, count(DISTINCT doc_id) AS nd FROM l GROUP BY 1
  ) WHERE nd >= 5
),
reb AS (
  SELECT doc_id, string_agg(line, ' ' ORDER BY line_no) AS txt
  FROM l WHERE line NOT IN (SELECT line FROM boiler) GROUP BY 1
),
ct AS (
  SELECT dd.doc_id, dd.lang, coalesce(reb.txt, '') AS text
  FROM documents dd LEFT JOIN reb USING (doc_id)
),
tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok FROM ct),
agg AS (
  SELECT doc_id, count(*) AS n_tokens,
         sum(CASE WHEN tok IN ({stop_set}) THEN 1 ELSE 0 END) AS n_stop,
         sum(length(tok)) AS sum_tok_len
  FROM tok GROUP BY doc_id
),
q AS (
  SELECT ct.doc_id, ct.lang, md5(ct.text) AS digest,
         0.4 * (cast(n_stop as double) / cast(n_tokens as double))
       + 0.3 * least(cast(sum_tok_len as double) / cast(n_tokens as double) / 10.0, 1.0)
       + 0.3 * least(cast(n_tokens as double) / 100.0, 1.0) AS score
  FROM agg JOIN ct USING (doc_id)
),
sz AS (SELECT lang, count(*) AS n_docs FROM q GROUP BY 1),
thr AS (
  SELECT lang, score AS t FROM (
    SELECT q.*, sz.n_docs,
           row_number() OVER (PARTITION BY lang ORDER BY score, doc_id) AS rn
    FROM q JOIN sz USING (lang)
  ) WHERE rn = cast(ceil(0.5 * n_docs) as bigint)
),
kq AS (SELECT q.* FROM q JOIN thr USING (lang) WHERE score >= t),
win AS (
  SELECT digest, min(doc_id) AS keep_id FROM kq GROUP BY 1
),
nf AS (
  SELECT kq.lang, count(*) AS n_final
  FROM win JOIN kq ON win.keep_id = kq.doc_id GROUP BY 1
),
nq AS (SELECT lang, count(*) AS n_quality FROM kq GROUP BY 1)
SELECT lang, n_docs, n_quality, n_final
FROM sz JOIN nq USING (lang) JOIN nf USING (lang)
"""


def graph_pagerank_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-exact PageRank over the customer→supplier trade graph
    (3 iterations, top-100 by rank) — the iterative score-propagation
    family beside the star connected components."""
    from ora_ch_spark.operators.graph import pagerank

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.col("o_custkey").alias("src"),
            (F.lit(1_000_000) + F.col("l_suppkey")).alias("dst"),
        )
    )
    return (
        pagerank(edges, iters=3)
        .orderBy(F.desc("rank"), F.asc("node"))
        .limit(100)
    )


# unrolled 3-iteration replay; HUGEINT sums cast per the r5 lesson
def _pagerank_oracle(iters: int = 3) -> str:
    body = [
        """
WITH e AS (
  SELECT DISTINCT o_custkey AS src, 1000000 + l_suppkey AS dst
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
od AS (SELECT src, count(*) AS odeg FROM e GROUP BY 1),
r0 AS (SELECT node, cast(1000000000 as bigint) AS rank FROM nodes)"""
    ]
    for i in range(1, iters + 1):
        body.append(f""",
c{i} AS (
  SELECT e.dst, cast(sum(r.rank // od.odeg) as bigint) AS s
  FROM e JOIN od USING (src) JOIN r{i - 1} r ON r.node = e.src
  GROUP BY 1
),
r{i} AS (
  SELECT n.node,
         cast(150000000 + (85 * coalesce(c{i}.s, 0)) // 100 as bigint) AS rank
  FROM nodes n LEFT JOIN c{i} ON n.node = c{i}.dst
)""")
    body.append(f"""
SELECT node, rank FROM r{iters}
ORDER BY rank DESC, node ASC LIMIT 100
""")
    return "".join(body)


def pipeline_rag_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ora_ch_spark.operators.pipeline import rag_chunk_topk

    return rag_chunk_topk(load_table(spark, sf_dir, "documents")).orderBy(
        "q_id", "rank"
    )


def _rag_oracle(
    chunk_chars: int = 240,
    overlap: int = 40,
    dims: int = 8,
    n_lists: int = 16,
    n_probe: int = 2,
    k: int = 5,
) -> str:
    """Full replay of rag_chunk_topk: chunking, md5 feature-hash
    embedding, IVF seed/assign/probe routing, exact cosine top-k."""
    stride = chunk_chars - overlap
    lane_rows = "\n  UNION ALL\n".join(
        f"  SELECT cid, {i + 1} AS i,"
        f" ('0x' || substr(md5(chunk_text), {i * 4 + 1}, 4))::BIGINT - 32768 AS v"
        f" FROM ch"
        for i in range(dims)
    )
    return f"""
WITH n AS (
  SELECT doc_id, coalesce(text, '') AS text,
         greatest(1, cast(ceil((length(coalesce(text, '')) - {overlap}) / {stride}.0) as int)) AS n_chunks
  FROM documents
),
ch AS (
  SELECT doc_id * 1000000 + cid AS cid, doc_id,
         substr(text, cast(cid * {stride} + 1 as int), {chunk_chars}) AS chunk_text
  FROM (SELECT doc_id, text, unnest(range(0, n_chunks)) AS cid FROM n)
),
e AS (
{lane_rows}
),
nrm AS (SELECT cid, sum(v * v) AS nn FROM e GROUP BY 1),
s0 AS (
  SELECT cid, row_number() OVER (ORDER BY cid) - 1 AS c_id
  FROM (SELECT cid FROM ch ORDER BY cid LIMIT {n_lists})
),
se AS (SELECT s0.c_id, e.i, e.v FROM s0 JOIN e USING (cid)),
snrm AS (SELECT c_id, sum(v * v) AS nn FROM se GROUP BY 1),
cdot AS (
  SELECT e.cid, se.c_id, sum(e.v * se.v) AS d
  FROM e JOIN se ON e.i = se.i GROUP BY 1, 2
),
ccos AS (
  SELECT cdot.cid, cdot.c_id,
         cast(d as double) / (sqrt(cast(n1.nn as double)) * sqrt(cast(n2.nn as double))) AS cos
  FROM cdot JOIN nrm n1 ON cdot.cid = n1.cid JOIN snrm n2 ON cdot.c_id = n2.c_id
),
assign AS (
  SELECT cid AS n_id, c_id AS centroid FROM (
    SELECT cid, c_id, row_number() OVER (PARTITION BY cid ORDER BY cos DESC, c_id) AS r
    FROM ccos) WHERE r = 1
),
probes AS (
  SELECT cid AS q_id, c_id AS centroid FROM (
    SELECT cid, c_id, row_number() OVER (PARTITION BY cid ORDER BY cos DESC, c_id) AS r
    FROM ccos WHERE cid IN (SELECT cid FROM ch WHERE doc_id < 3)) WHERE r <= {n_probe}

),
cands AS (
  SELECT p.q_id, a.n_id FROM probes p JOIN assign a USING (centroid)
  WHERE a.n_id != p.q_id
),
dot2 AS (
  SELECT c.q_id, c.n_id, sum(ea.v * eb.v) AS d
  FROM cands c
  JOIN e ea ON ea.cid = c.q_id
  JOIN e eb ON eb.cid = c.n_id AND eb.i = ea.i
  GROUP BY 1, 2
),
scored AS (
  SELECT q_id, n_id,
         cast(d as double) / (sqrt(cast(nq.nn as double)) * sqrt(cast(nb.nn as double))) AS cosine
  FROM dot2 JOIN nrm nq ON q_id = nq.cid JOIN nrm nb ON n_id = nb.cid
)
SELECT q_id, n_id,
       cast(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) as int) AS rank,
       cosine
FROM scored QUALIFY rank <= {k}
ORDER BY q_id, rank
"""


def sim_maxsim_ivf_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-routed MaxSim (VERDICT r04 item 3): the persisted IVF
    index — built with the label column riding the assign table —
    routes each query to 2 probed lists; group maxsim is computed
    over probed-list members only. Exact twin: sim_maxsim_groups."""
    from ora_ch_spark.catalog import _tmp_store

    store = _tmp_store(spark)
    store.create_database("ch")
    emb = load_table(spark, sf_dir, "embeddings")
    S.build_ivf_index(store, "ch", emb, keep_cols=("label",))
    return S.maxsim_topk_groups_ivf(
        store, "ch", emb.filter("vec_id < 10")
    ).orderBy("q_id", "rank")


# replays the SIM_IVF routing (first-16 seeds, cosine argmax assign,
# 2 cosine-ranked probes) and scores maxsim over candidates only
SIM_MAXSIM_IVF_ORACLE = f"""
WITH q AS (SELECT vec_id, label, {_QE} AS qe FROM embeddings),
e AS (SELECT vec_id, unnest(qe) AS v, unnest(range(1, len(qe) + 1)) AS i FROM q),
nrm AS (SELECT vec_id, sum(v * v) AS nn FROM e GROUP BY 1),
se AS (SELECT vec_id AS c_id, v, i FROM e WHERE vec_id < 16),
snrm AS (SELECT c_id, sum(v * v) AS nn FROM se GROUP BY 1),
cdot AS (
  SELECT e.vec_id, se.c_id, sum(e.v * se.v) AS d
  FROM e JOIN se ON e.i = se.i GROUP BY 1, 2
),
ccos AS (
  SELECT cdot.vec_id, cdot.c_id,
         cast(d as double) / (sqrt(cast(n1.nn as double)) * sqrt(cast(n2.nn as double))) AS cos
  FROM cdot JOIN nrm n1 ON cdot.vec_id = n1.vec_id JOIN snrm n2 ON cdot.c_id = n2.c_id
),
assign AS (
  SELECT vec_id, c_id AS centroid FROM (
    SELECT vec_id, c_id, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, c_id) AS r
    FROM ccos
  ) WHERE r = 1
),
probes AS (
  SELECT vec_id AS q_id, c_id AS centroid FROM (
    SELECT vec_id, c_id, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, c_id) AS r
    FROM ccos WHERE vec_id < 10
  ) WHERE r <= 2
),
cands AS (
  SELECT p.q_id, a.vec_id AS n_id
  FROM probes p JOIN assign a ON p.centroid = a.centroid
  WHERE a.vec_id != p.q_id
),
dot2 AS (
  SELECT c.q_id, c.n_id, sum(ea.v * eb.v) AS d
  FROM cands c
  JOIN e ea ON ea.vec_id = c.q_id
  JOIN e eb ON eb.vec_id = c.n_id AND eb.i = ea.i
  GROUP BY 1, 2
),
scored AS (
  SELECT dot2.q_id, qv.label AS grp,
         cast(d as double) / (sqrt(cast(nq.nn as double)) * sqrt(cast(nb.nn as double))) AS cosine
  FROM dot2
  JOIN nrm nq ON dot2.q_id = nq.vec_id
  JOIN nrm nb ON dot2.n_id = nb.vec_id
  JOIN q qv ON dot2.n_id = qv.vec_id
),
g AS (SELECT q_id, grp, max(cosine) AS maxsim FROM scored GROUP BY 1, 2),
ranked AS (
  SELECT q_id, grp AS label, maxsim,
         cast(row_number() OVER (PARTITION BY q_id ORDER BY maxsim DESC, grp) as int) AS rank
  FROM g
)
SELECT q_id, label, rank, maxsim FROM ranked WHERE rank <= 3
ORDER BY q_id, rank
"""


def sim_maxsim_auto_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Size-adaptive MaxSim dispatch (r6 verdict item 6), pinned to
    the ROUTED branch: crossover thresholds of 0 classify any corpus
    as large, so ``maxsim_topk_groups_auto`` must hand off to the
    IVF-routed probe — hash-gated against the routed oracle (picking
    exact instead would hash-mismatch wherever probed-list recall
    differs from the full scan). The dispatch decision itself reads
    only the index manifest (zero Spark jobs; unit-pinned by
    tests/test_lines_search_cluster.py::test_maxsim_size_adaptive_dispatch)."""
    from ora_ch_spark.catalog import _tmp_store

    store = _tmp_store(spark)
    store.create_database("ch")
    emb = load_table(spark, sf_dir, "embeddings")
    S.build_ivf_index(store, "ch", emb, keep_cols=("label",))
    return S.maxsim_topk_groups_auto(
        store, "ch", emb.filter("vec_id < 10"),
        exact_max_rows=0, exact_max_bytes=0,
    ).orderBy("q_id", "rank")


def sim_topk_ivfadc_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC (VERDICT r04 item 4): coarse-quantizer routing over the
    PQ code table — compressed ADC scoring restricted to the probed
    inverted lists. Training replays pq_topk's exact trajectory."""
    from ora_ch_spark.operators.pq import ivfadc_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return ivfadc_topk(emb, query_ids=emb.filter("vec_id < 10")).orderBy(
        "q_id", "rank"
    )


def _ivfadc_oracle(
    m: int = 4,
    k: int = 16,
    sub: int = 16,
    topk: int = 5,
    n_lists: int = 16,
    n_probe: int = 2,
) -> str:
    """_pq_oracle's full training/encode/ADC replay + the coarse
    routing: first-``n_lists``-by-id seeds, argmin-sqdist list
    assignment (tie → lowest list), ``n_probe`` lists per query, ADC
    summed over candidate pairs only."""
    blocks = []
    for s in range(m):
        lo = s * sub
        blocks.append(f"""
sub{s} AS (SELECT vec_id, v, i - {lo} AS j FROM e WHERE i > {lo} AND i <= {lo + sub}),
c0_{s} AS (
  SELECT cast(row_number() OVER (ORDER BY vec_id) - 1 as int) AS code, vec_id
  FROM (SELECT vec_id FROM q ORDER BY vec_id LIMIT {k})
),
ce0_{s} AS (SELECT c0_{s}.code, s.j, s.v FROM c0_{s} JOIN sub{s} s USING (vec_id)),
d1_{s} AS (
  SELECT s.vec_id, ce.code, sum((s.v - ce.v) * (s.v - ce.v)) AS dist
  FROM sub{s} s JOIN ce0_{s} ce ON s.j = ce.j GROUP BY 1, 2
),
a1_{s} AS (
  SELECT vec_id, code FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, code) AS rn
    FROM d1_{s}) WHERE rn = 1
),
ce1_{s} AS (
  SELECT a1.code, s.j,
         cast(floor(cast(sum(s.v) as double) / count(*)) as bigint) AS v
  FROM a1_{s} a1 JOIN sub{s} s USING (vec_id) GROUP BY 1, 2
),
d2_{s} AS (
  SELECT s.vec_id, ce.code, sum((s.v - ce.v) * (s.v - ce.v)) AS dist
  FROM sub{s} s JOIN ce1_{s} ce ON s.j = ce.j GROUP BY 1, 2
),
enc_{s} AS (
  SELECT vec_id, code FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, code) AS rn
    FROM d2_{s}) WHERE rn = 1
),
dt_{s} AS (SELECT vec_id AS q_id, code, dist FROM d2_{s} WHERE vec_id < 10)""")
    parts = "\n  UNION ALL\n".join(
        f"  SELECT dt_{s}.q_id, e{s}.vec_id AS n_id, dt_{s}.dist"
        f" FROM enc_{s} e{s} JOIN dt_{s} ON e{s}.code = dt_{s}.code"
        for s in range(m)
    )
    return f"""
WITH q AS (SELECT vec_id, {_QE} AS qe FROM embeddings),
e AS (SELECT vec_id, unnest(qe) AS v, unnest(range(1, len(qe) + 1)) AS i FROM q),
g0 AS (
  SELECT cast(row_number() OVER (ORDER BY vec_id) - 1 as int) AS gl, vec_id
  FROM (SELECT vec_id FROM q ORDER BY vec_id LIMIT {n_lists})
),
ge AS (SELECT g0.gl, e.i, e.v FROM g0 JOIN e USING (vec_id)),
gd AS (
  SELECT e.vec_id, ge.gl, sum((e.v - ge.v) * (e.v - ge.v)) AS dist
  FROM e JOIN ge ON e.i = ge.i GROUP BY 1, 2
),
glists AS (
  SELECT vec_id AS n_id, gl AS list FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, gl) AS rn
    FROM gd) WHERE rn = 1
),
gprobes AS (
  SELECT vec_id AS q_id, gl AS list FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, gl) AS rn
    FROM gd WHERE vec_id < 10) WHERE rn <= {n_probe}
),
gcands AS (
  SELECT p.q_id, l.n_id FROM gprobes p JOIN glists l USING (list)
  WHERE l.n_id != p.q_id
),
{",".join(blocks)},
parts AS (
{parts}
),
adc AS (
  SELECT parts.q_id, parts.n_id, sum(dist) AS adc_dist
  FROM parts JOIN gcands ON parts.q_id = gcands.q_id AND parts.n_id = gcands.n_id
  GROUP BY 1, 2
)
SELECT q_id, n_id,
       cast(row_number() OVER (PARTITION BY q_id
                               ORDER BY adc_dist, n_id) as int) AS rank,
       cast(adc_dist as bigint) AS adc_dist
FROM adc QUALIFY rank <= {topk}
ORDER BY q_id, rank
"""


def sim_topk_ivf_sq8_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF × SQ8: coarse-routed scalar-quantized search — probed
    lists only, candidates scored by the decoded-corpus asymmetric
    distance."""
    from ora_ch_spark.operators.pq import ivf_sq8_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_sq8_topk(emb, query_ids=emb.filter("vec_id < 10")).orderBy(
        "q_id", "rank"
    )


def _ivf_sq8_oracle(topk: int = 5, n_lists: int = 16, n_probe: int = 2) -> str:
    """IVFADC's coarse-routing replay + SQ8's stats/decode replay,
    distance summed over candidate pairs only."""
    return f"""
WITH q AS (SELECT vec_id, {_QE} AS qe FROM embeddings),
e AS (SELECT vec_id, unnest(qe) AS v, unnest(range(1, len(qe) + 1)) AS i FROM q),
g0 AS (
  SELECT cast(row_number() OVER (ORDER BY vec_id) - 1 as int) AS gl, vec_id
  FROM (SELECT vec_id FROM q ORDER BY vec_id LIMIT {n_lists})
),
ge AS (SELECT g0.gl, e.i, e.v FROM g0 JOIN e USING (vec_id)),
gd AS (
  SELECT e.vec_id, ge.gl, sum((e.v - ge.v) * (e.v - ge.v)) AS dist
  FROM e JOIN ge ON e.i = ge.i GROUP BY 1, 2
),
glists AS (
  SELECT vec_id AS n_id, gl AS list FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, gl) AS rn
    FROM gd) WHERE rn = 1
),
gprobes AS (
  SELECT vec_id AS q_id, gl AS list FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, gl) AS rn
    FROM gd WHERE vec_id < 10) WHERE rn <= {n_probe}
),
gcands AS (
  SELECT p.q_id, l.n_id FROM gprobes p JOIN glists l USING (list)
  WHERE l.n_id != p.q_id
),
st AS (
  SELECT i, min(v) AS mn, greatest(1, max(v) - min(v)) AS rng
  FROM e GROUP BY 1
),
recon AS (
  SELECT e.vec_id, e.i,
         st.mn + ((((e.v - st.mn) * 255) // st.rng) * st.rng) // 255 AS rv
  FROM e JOIN st USING (i)
),
qq AS (SELECT vec_id AS q_id, i, v FROM e WHERE vec_id < 10),
dist AS (
  SELECT c.q_id, c.n_id, sum((qq.v - r.rv) * (qq.v - r.rv)) AS sq_dist
  FROM gcands c
  JOIN qq ON qq.q_id = c.q_id
  JOIN recon r ON r.vec_id = c.n_id AND r.i = qq.i
  GROUP BY 1, 2
)
SELECT q_id, n_id,
       cast(row_number() OVER (PARTITION BY q_id
                               ORDER BY sq_dist, n_id) as int) AS rank,
       cast(sq_dist as bigint) AS sq_dist
FROM dist QUALIFY rank <= {topk}
ORDER BY q_id, rank
"""


# ---------------------------------------------------------------------------
# Round-8 dialect batteries: windowFunnel strict modes (CH-exact
# event-loop fold vs a DuckDB RECURSIVE-CTE replay of the same
# published algorithm — a full second-engine re-implementation, not a
# shared code path), sequenceMatch/Count time constraints (?t op v)
# (EXISTS oracles for match; greedy-restart recursive replay for
# count), and WITH FILL INTERPOLATE + multi-key + GLOBAL NOT IN.
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# Gopher rule-based quality filter (Rae et al. 2021 quality rules,
# repetition-free subset — repetition rules are text_repetition)
# ---------------------------------------------------------------------------

def gopher_rules_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TX.gopher_rules(load_table(spark, sf_dir, "documents"))


GOPHER_RULES_ORACLE = """
WITH w AS (
  SELECT doc_id,
    string_split(text, ' ') AS ws,
    string_split(text, chr(10)) AS ls,
    lower(text) AS lt,
    len(text) - len(replace(text, '#', ''))
      + len(regexp_extract_all(text, '\\.\\.\\.')) AS n_sym
  FROM documents
),
m AS (
  SELECT doc_id,
    cast(len(ws) as bigint) AS n_words,
    cast(list_sum(list_prepend(0, list_transform(ws, x -> len(x)))) as double)
      / len(ws) AS mean_word_len,
    cast(n_sym as double) / len(ws) AS symbol_word_ratio,
    cast(len(list_filter(ls, l ->
      regexp_matches(l, '^\\s*([-*•]|[0-9]+[.)])\\s'))) as double)
      / len(ls) AS bullet_line_frac,
    cast(len(list_filter(ls, l ->
      regexp_matches(l, '\\.\\.\\.\\s*$'))) as double)
      / len(ls) AS ellipsis_line_frac,
    cast(len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]'))) as double)
      / len(ws) AS alpha_word_frac,
    cast(
      (regexp_matches(lt, '(^|[^a-z])the([^a-z]|$)'))::INT
      + (regexp_matches(lt, '(^|[^a-z])be([^a-z]|$)'))::INT
      + (regexp_matches(lt, '(^|[^a-z])to([^a-z]|$)'))::INT
      + (regexp_matches(lt, '(^|[^a-z])of([^a-z]|$)'))::INT
      + (regexp_matches(lt, '(^|[^a-z])and([^a-z]|$)'))::INT
      + (regexp_matches(lt, '(^|[^a-z])that([^a-z]|$)'))::INT
      + (regexp_matches(lt, '(^|[^a-z])have([^a-z]|$)'))::INT
      + (regexp_matches(lt, '(^|[^a-z])with([^a-z]|$)'))::INT
    as int) AS n_required_stops
  FROM w
)
SELECT *,
  (n_words BETWEEN 50 AND 100000
   AND mean_word_len BETWEEN 3.0 AND 10.0
   AND symbol_word_ratio <= 0.1
   AND bullet_line_frac <= 0.9
   AND ellipsis_line_frac <= 0.3
   AND alpha_word_frac >= 0.8
   AND n_required_stops >= 2) AS keep
FROM m
"""


# ---------------------------------------------------------------------------
# C4 line + page filter (Raffel et al. 2020 §2.2 heuristics) — the
# synthetic docs carry no punctuation/newlines, so the entry PLANTS
# deterministic rule triggers on the chunked pseudo-lines (terminal
# punctuation on ~3/4 of lines, lorem-ipsum and brace pages, a
# javascript mention sprinkle), then runs the REAL operator; the
# oracle replays planting + rules.
# ---------------------------------------------------------------------------

_C4_TPL = 12
_C4_PLANT = (
    "concat(line, CASE cast((doc_id + line_no) % 4 as int) "
    "WHEN 0 THEN '.' WHEN 1 THEN '?' WHEN 2 THEN '!' ELSE '' END, "
    "CASE WHEN doc_id % 53 = 0 AND line_no = 0 THEN ' lorem ipsum' "
    "ELSE '' END, "
    "CASE WHEN doc_id % 71 = 0 AND line_no = 1 THEN ' {' ELSE '' END, "
    "CASE WHEN (doc_id * 7 + line_no) % 29 = 0 THEN ' javascript' "
    "ELSE '' END)"
)


def c4_line_filter_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ora_ch_spark.operators.lines import c4_line_filter, chunk_lines

    docs = load_table(spark, sf_dir, "documents")
    lines = chunk_lines(docs, tokens_per_line=_C4_TPL).withColumn(
        "line", F.expr(_C4_PLANT)
    )
    return c4_line_filter(lines)


C4_LINE_FILTER_ORACLE = f"""
WITH {_chunk_lines_sql(_C4_TPL)},
pl AS (
  SELECT doc_id, line_no,
    line || (CASE cast((doc_id + line_no) % 4 as int)
             WHEN 0 THEN '.' WHEN 1 THEN '?' WHEN 2 THEN '!' ELSE '' END)
         || (CASE WHEN doc_id % 53 = 0 AND line_no = 0
             THEN ' lorem ipsum' ELSE '' END)
         || (CASE WHEN doc_id % 71 = 0 AND line_no = 1
             THEN ' {{' ELSE '' END)
         || (CASE WHEN (doc_id * 7 + line_no) % 29 = 0
             THEN ' javascript' ELSE '' END) AS line
  FROM l
),
flags AS (
  SELECT doc_id,
    bool_or(contains(lower(line), 'lorem ipsum')) AS has_lorem,
    bool_or(contains(line, '{{')) AS has_brace
  FROM pl GROUP BY 1
),
cand AS (
  SELECT * FROM pl
  WHERE regexp_matches(line, '[.!?"”]\\s*$')
    AND len(string_split(line, ' ')) >= 5
    AND NOT contains(lower(line), 'javascript')
),
pok AS (
  SELECT f.doc_id, f.has_lorem, f.has_brace,
    (NOT f.has_lorem AND NOT f.has_brace
     AND coalesce(c.n, 0) >= 3) AS page_kept
  FROM flags f LEFT JOIN
    (SELECT doc_id, count(*) AS n FROM cand GROUP BY 1) c USING (doc_id)
),
kept AS (
  SELECT cand.* FROM cand JOIN pok USING (doc_id) WHERE pok.page_kept
),
r AS (
  SELECT doc_id, count(*) AS n_kept,
         string_agg(line, ' ' ORDER BY line_no) AS txt
  FROM kept GROUP BY 1
),
tot AS (SELECT doc_id, count(*) AS n_lines FROM pl GROUP BY 1)
SELECT tot.doc_id, n_lines,
       cast(coalesce(n_kept, 0) as bigint) AS n_kept,
       md5(coalesce(txt, '')) AS kept_md5,
       length(coalesce(txt, ''))::BIGINT AS kept_len,
       pok.has_lorem, pok.has_brace, pok.page_kept
FROM tot LEFT JOIN r USING (doc_id) JOIN pok USING (doc_id)
"""


# ---------------------------------------------------------------------------
# DSIR importance scoring (hashed-bigram importance resampling weights)
# ---------------------------------------------------------------------------

_DSIR_TARGET = "source IN ('src1', 'src2', 'src3')"
_DSIR_B = 4096


def dsir_importance_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ora_ch_spark.operators.sampling import dsir_importance

    return dsir_importance(
        load_table(spark, sf_dir, "documents"),
        _DSIR_TARGET,
        n_buckets=_DSIR_B,
    ).select(
        "doc_id", "n_bigrams", F.round(F.col("score"), 6).alias("score")
    )


DSIR_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, source, string_split(lower(text), ' ') AS t FROM documents
),
grams AS (
  SELECT doc_id, source,
         unnest([t[i] || ' ' || t[i + 1]
                 for i in range(1, greatest(len(t), 1))]) AS gram
  FROM toks
),
dc AS (
  SELECT doc_id, source,
         ('0x' || substr(md5(gram), 1, 8))::BIGINT % {_DSIR_B} AS bucket,
         count(*) AS c
  FROM grams GROUP BY 1, 2, 3
),
tc AS (SELECT bucket, sum(c) AS ct FROM dc
       WHERE {_DSIR_TARGET} GROUP BY 1),
qc AS (SELECT bucket, sum(c) AS cq FROM dc GROUP BY 1),
tot AS (SELECT (SELECT coalesce(sum(ct), 0) FROM tc) AS tt,
               (SELECT coalesce(sum(cq), 0) FROM qc) AS qt),
ratio AS (
  SELECT qc.bucket,
    ln((coalesce(tc.ct, 0)::DOUBLE + 1.0) / (tot.tt + 1.0 * {_DSIR_B}))
    - ln((qc.cq::DOUBLE + 1.0) / (tot.qt + 1.0 * {_DSIR_B})) AS logratio
  FROM qc LEFT JOIN tc USING (bucket), tot
),
scored AS (
  SELECT dc.doc_id, sum(dc.c) AS n_bigrams,
         sum(dc.c::DOUBLE * ratio.logratio) AS score
  FROM dc JOIN ratio USING (bucket) GROUP BY 1
)
SELECT d.doc_id,
       cast(coalesce(s.n_bigrams, 0) as bigint) AS n_bigrams,
       round(coalesce(s.score, 0.0), 6) AS score
FROM documents d LEFT JOIN scored s USING (doc_id)
"""


# ---------------------------------------------------------------------------
# One-pass linear quality model (round 10) — normal-equations fit over
# EXACT integer Gram sums (operators/regress.py). The oracle replays
# the identical pipeline in DuckDB: same integral features, same exact
# hugeint Gram sums, the SAME fixed-order Cramer expansion in doubles
# — weights agree bitwise before the shared half-up round(…, 6).
# ---------------------------------------------------------------------------

def quality_linear_fit_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fit y(count of 'e') ≈ w0 + w1·n_chars + w2·space_count over
    documents in ONE aggregation pass; returns the weight row. The
    whole model state is k²/2 decimal sums — partial-aggregable, so
    the plan is scan → partial agg → single final row at any scale."""
    from ora_ch_spark.operators.regress import linear_fit_normal_eq

    docs = load_table(spark, sf_dir, "documents")
    feats = docs.select(
        F.col("n_chars").cast("long").alias("x1"),
        F.expr("length(text) - length(replace(text, ' ', ''))")
         .cast("long").alias("x2"),
        F.expr("length(text) - length(replace(text, 'e', ''))")
         .cast("long").alias("y"),
    )
    fit = linear_fit_normal_eq(feats, ["x1", "x2"], "y", ridge=1)
    from ora_ch_spark.io import local_df

    raw = local_df(
        spark,
        [(fit["n"], fit["weights"][0], fit["weights"][1],
          fit["weights"][2])],
        "n bigint, w0 double, w1 double, w2 double",
    )
    # round in SQL on BOTH engines (identical half-up rule on
    # bit-identical doubles)
    return raw.select(
        "n",
        F.round("w0", 6).alias("w0"),
        F.round("w1", 6).alias("w1"),
        F.round("w2", 6).alias("w2"),
    )


QUALITY_LINEAR_FIT_ORACLE = """
WITH f AS (
  SELECT n_chars::bigint AS x1,
         (length(text) - length(replace(text, ' ', '')))::bigint AS x2,
         (length(text) - length(replace(text, 'e', '')))::bigint AS y
  FROM documents
),
g AS (
  SELECT count(*)::bigint AS n,
         sum(x1) AS s1, sum(x2) AS s2,
         sum(x1 * x1) AS s11, sum(x1 * x2) AS s12, sum(x2 * x2) AS s22,
         sum(y) AS r0, sum(x1 * y) AS r1, sum(x2 * y) AS r2
  FROM f
),
m AS (
  -- A = [[n+1, s1, s2], [s1, s11+1, s12], [s2, s12, s22+1]] (ridge=1
  -- on every diagonal entry, added while still exact integers)
  SELECT n,
         (n + 1)::double AS a, s1::double AS b, s2::double AS c,
         s1::double AS d, (s11 + 1)::double AS e, s12::double AS f,
         s2::double AS gg, s12::double AS h, (s22 + 1)::double AS i,
         r0::double AS r0, r1::double AS r1, r2::double AS r2
  FROM g
),
dets AS (
  -- the same fixed-order 3x3 expansion regress._det3 uses
  SELECT n,
    a*(e*i - f*h) - b*(d*i - f*gg) + c*(d*h - e*gg) AS det,
    r0*(e*i - f*h) - b*(r1*i - f*r2) + c*(r1*h - e*r2) AS det0,
    a*(r1*i - f*r2) - r0*(d*i - f*gg) + c*(d*r2 - r1*gg) AS det1,
    a*(e*r2 - r1*h) - b*(d*r2 - r1*gg) + r0*(d*h - e*gg) AS det2
  FROM m
)
SELECT n,
       round(det0 / det, 6) AS w0,
       round(det1 / det, 6) AS w1,
       round(det2 / det, 6) AS w2
FROM dets
"""


def quality_linear_score_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train → score → select: the fitted weights (bitwise-exact, see
    quality_linear_fit) drive a pure-projection score over the corpus;
    top-10 by (rounded score, doc_id). Two passes total — the Gram
    aggregation and the scoring scan — both embarrassingly parallel."""
    from ora_ch_spark.operators.regress import (
        linear_fit_normal_eq,
        score_linear,
    )

    docs = load_table(spark, sf_dir, "documents")
    feats = docs.select(
        "doc_id",
        F.col("n_chars").cast("long").alias("x1"),
        F.expr("length(text) - length(replace(text, ' ', ''))")
         .cast("long").alias("x2"),
        F.expr("length(text) - length(replace(text, 'e', ''))")
         .cast("long").alias("y"),
    )
    fit = linear_fit_normal_eq(feats, ["x1", "x2"], "y", ridge=1)
    scored = score_linear(feats, ["x1", "x2"], fit["weights"], "score")
    return (
        scored.select("doc_id", F.round("score", 6).alias("score"))
        .orderBy(F.desc("score"), "doc_id")
        .limit(10)
    )


QUALITY_LINEAR_SCORE_TOPK_ORACLE = """
WITH f AS (
  SELECT doc_id,
         n_chars::bigint AS x1,
         (length(text) - length(replace(text, ' ', '')))::bigint AS x2,
         (length(text) - length(replace(text, 'e', '')))::bigint AS y
  FROM documents
),
g AS (
  SELECT count(*)::bigint AS n,
         sum(x1) AS s1, sum(x2) AS s2,
         sum(x1 * x1) AS s11, sum(x1 * x2) AS s12, sum(x2 * x2) AS s22,
         sum(y) AS r0, sum(x1 * y) AS r1, sum(x2 * y) AS r2
  FROM f
),
m AS (
  SELECT (n + 1)::double AS a, s1::double AS b, s2::double AS c,
         s1::double AS d, (s11 + 1)::double AS e, s12::double AS f,
         s2::double AS gg, s12::double AS h, (s22 + 1)::double AS i,
         r0::double AS r0, r1::double AS r1, r2::double AS r2
  FROM g
),
w AS (
  SELECT
    (r0*(e*i - f*h) - b*(r1*i - f*r2) + c*(r1*h - e*r2))
      / (a*(e*i - f*h) - b*(d*i - f*gg) + c*(d*h - e*gg)) AS w0,
    (a*(r1*i - f*r2) - r0*(d*i - f*gg) + c*(d*r2 - r1*gg))
      / (a*(e*i - f*h) - b*(d*i - f*gg) + c*(d*h - e*gg)) AS w1,
    (a*(e*r2 - r1*h) - b*(d*r2 - r1*gg) + r0*(d*h - e*gg))
      / (a*(e*i - f*h) - b*(d*i - f*gg) + c*(d*h - e*gg)) AS w2
  FROM m
)
SELECT doc_id,
       round(w0 + w1 * x1::double + w2 * x2::double, 6) AS score
FROM f CROSS JOIN w
ORDER BY score DESC, doc_id
LIMIT 10
"""
