"""Extension catalog — LLM-data-pipeline operators beyond the
reference surface: deduplication (exact / MinHash+LSH / SimHash /
n-gram Jaccard / embedding cosine), similarity search (brute-force
and LSH top-k), text analysis, multimodal plumbing, and the
Structured-Streaming forms of the reference's incremental semantics.

Every oracle below replays the Spark operator's exact algorithm in
DuckDB SQL (same md5-derived hashes, same integer quantization, same
tie-breaks), so the differential gate checks values bit-for-bit.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ora_ch_spark.catalog import QueryDef
from ora_ch_spark.functions.hashes import lsh_plane_signs
from ora_ch_spark.io import load_table
from ora_ch_spark.operators import dedup as D
from ora_ch_spark.operators import similarity as S
from ora_ch_spark.operators import text as TX
from ora_ch_spark.operators.multimodal import media_feature_pipeline
from ora_ch_spark.streaming.watermark import streaming_hourly_rollup

# ---------------------------------------------------------------------------
# Dedup
# ---------------------------------------------------------------------------

def dedup_exact_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.exact_dedup_groups(load_table(spark, sf_dir, "documents"))


DEDUP_EXACT_ORACLE = """
SELECT md5(text) AS text_hash, min(doc_id) AS keep_id, count(*) AS dup_count
FROM documents GROUP BY md5(text)
"""


def dedup_minhash_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.minhash_lsh_dedup(load_table(spark, sf_dir, "documents"))


def _minhash_oracle(
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.8,
    relation: str = "documents",
) -> str:
    """Replays the single-pass MinHash pipeline: 60-bit shingle
    hashes, universal hash over the mod-2³² fold, packed int64 band
    keys, exact-intersection verify on candidates."""
    from ora_ch_spark.operators.dedup import MINHASH_PRIME, minhash_coeffs

    rows = num_hashes // bands
    mins = ",\n         ".join(
        f"min(({a} * (hv % 4294967296) + {b}) % {MINHASH_PRIME}) AS mh{h}"
        for h, (a, b) in enumerate(minhash_coeffs(num_hashes))
    )
    pack = 1 << 31

    def band_select(b: int) -> str:
        idx = [b * rows + r for r in range(rows)]
        keys = []
        for j, i in enumerate(range(0, len(idx), 2)):
            if i + 1 < len(idx):
                keys.append(
                    f"(mh{idx[i]} % {pack}) * {pack} + (mh{idx[i + 1]} % {pack}) AS k{j}"
                )
            else:
                keys.append(f"mh{idx[i]} AS k{j}")
        return f"  SELECT doc_id, {b} AS band, " + ", ".join(keys) + " FROM sig"

    band_selects = "\n  UNION ALL\n".join(band_select(b) for b in range(bands))
    n_keys = (rows + 1) // 2
    key_eq = " AND ".join(f"a.k{j} = b.k{j}" for j in range(n_keys))
    return f"""
WITH tok AS (
  SELECT doc_id, string_split(lower(text), ' ') AS w FROM {relation}
),
sh AS (
  SELECT doc_id, unnest(list_distinct(
           [w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)]
         )) AS shingle
  FROM tok WHERE len(w) >= 3
),
shh AS (
  SELECT doc_id, shingle, ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS hv FROM sh
),
sig AS (
  SELECT doc_id,
         {mins}
  FROM shh GROUP BY doc_id
),
bands AS (
{band_selects}
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND {key_eq} AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.id_a, c.id_b, count(DISTINCT sa.hv) AS i
  FROM cand c
  JOIN shh sa ON sa.doc_id = c.id_a
  JOIN shh sb ON sb.doc_id = c.id_b AND sb.hv = sa.hv
  GROUP BY c.id_a, c.id_b
)
SELECT * FROM (
  SELECT i.id_a, i.id_b,
         cast(i.i as double) / cast(na.n + nb.n - i.i as double) AS jaccard
  FROM inter i
  JOIN sizes na ON i.id_a = na.doc_id
  JOIN sizes nb ON i.id_b = nb.doc_id
)
WHERE jaccard >= {threshold}
"""


def dedup_simhash_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.simhash_signatures(load_table(spark, sf_dir, "documents"))


DEDUP_SIMHASH_ORACLE = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t FROM documents
),
hv AS (SELECT doc_id, ('0x' || substr(md5(t), 1, 8))::BIGINT AS hv FROM tok),
bits AS (SELECT doc_id, hv, unnest(range(0, 32)) AS b FROM hv),
s AS (
  SELECT doc_id, b,
         sum(CASE WHEN (hv // (1::BIGINT << b)) % 2 = 1 THEN 1 ELSE -1 END) AS s
  FROM bits GROUP BY doc_id, b
)
SELECT doc_id,
       cast(sum(CASE WHEN s > 0 THEN (1::BIGINT << b) ELSE 0 END) as bigint) AS simhash
FROM s GROUP BY doc_id
"""


def dedup_ngram_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.char_ngram_jaccard_dedup(load_table(spark, sf_dir, "documents"))


DEDUP_NGRAM_ORACLE = """
WITH d AS (
  SELECT doc_id, lang, source, lower(text) AS t
  FROM documents WHERE length(text) >= 4
),
graw AS (
  SELECT doc_id, lang, source,
         unnest(list_distinct([t[i:i+3] for i in range(1, length(t) - 2)])) AS gram_s
  FROM d
),
g AS (
  SELECT doc_id, lang, source,
         ('0x' || substr(md5(gram_s), 1, 15))::BIGINT AS gram
  FROM graw
),
sizes AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
  FROM g a JOIN g b
    ON a.lang = b.lang AND a.source = b.source AND a.gram = b.gram
   AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT * FROM (
  SELECT i.id_a, i.id_b,
         cast(i.i as double) / cast(na.n + nb.n - i.i as double) AS jaccard
  FROM inter i
  JOIN sizes na ON i.id_a = na.doc_id
  JOIN sizes nb ON i.id_b = nb.doc_id
)
WHERE jaccard >= 0.6
"""


def dedup_substring_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ora_ch_spark.operators.dedup import substring_dedup

    return substring_dedup(load_table(spark, sf_dir, "documents"))


# algorithm replay of substring_dedup(window=60, winnow=8,
# min_shared=5): positional window hashes, min-per-8 winnowed
# fingerprints (list slice clamps at the end exactly like Spark's
# slice()), distinct, self-join, count filter
DEDUP_SUBSTRING_ORACLE = """
WITH d AS (
  SELECT doc_id, lower(text) AS t FROM documents WHERE length(text) >= 60
),
hs AS (
  SELECT doc_id,
         [('0x' || substr(md5(t[i:i+59]), 1, 15))::BIGINT
          for i in range(1, length(t) - 60 + 2)] AS h
  FROM d
),
g AS (
  SELECT doc_id, unnest(list_distinct(
           [list_min(h[j:j+7])
            for j in range(1, greatest(1, len(h) - 8 + 1) + 1)])) AS h
  FROM hs
)
SELECT * FROM (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared_windows
  FROM g a JOIN g b ON a.h = b.h AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
WHERE n_shared_windows >= 5
"""


_NEARDUP_PLANES = 6   # bits per table → buckets ≈ N/2⁶ per table
_NEARDUP_TABLES = 4   # OR-of-tables recall (banded, like MinHash bands)
_NEARDUP_THRESHOLD = 0.4


def dedup_embedding_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded multi-table LSH-blocked near-dup pairs — the 100 TB
    path: candidates must share a full 6-bit bucket in one of 4
    tables (pair space ≈ 4·N²/2⁶ worst case, vs N²/8 for the old
    single 3-plane table), then exact quantized cosine verifies
    candidates only. The all-pairs cross join stays available as the
    operator's verification fallback, deliberately NOT the catalog
    default."""
    return S.embedding_near_dup_pairs(
        load_table(spark, sf_dir, "embeddings"),
        threshold=_NEARDUP_THRESHOLD,
        use_lsh_blocking=True,
        n_planes=_NEARDUP_PLANES,
        n_tables=_NEARDUP_TABLES,
    )


_QE = "list_transform(embedding::DOUBLE[], x -> cast(floor(x * 10000) as bigint))"


def _embedding_neardup_oracle() -> str:
    signs = lsh_plane_signs(_NEARDUP_TABLES * _NEARDUP_PLANES, 64)

    def bucket_expr(t: int) -> str:
        return " + ".join(
            "(CASE WHEN ("
            + " + ".join(
                f"({signs[t * _NEARDUP_PLANES + p][d]}) * qe[{d + 1}]" for d in range(64)
            )
            + f") > 0 THEN {1 << p} ELSE 0 END)::BIGINT"
            for p in range(_NEARDUP_PLANES)
        )

    tables = "\nUNION ALL\n".join(
        f"SELECT vec_id, qe, {t} AS tbl, ({bucket_expr(t)}) AS bucket FROM q"
        for t in range(_NEARDUP_TABLES)
    )
    return f"""
WITH q AS (SELECT vec_id, {_QE} AS qe FROM embeddings),
b AS ({tables}),
e AS (SELECT vec_id, unnest(qe) AS v, unnest(range(1, len(qe) + 1)) AS i FROM q),
nrm AS (SELECT vec_id, sum(v * v) AS nn FROM e GROUP BY 1),
pairs AS (
  SELECT DISTINCT a.vec_id AS id_a, b2.vec_id AS id_b
  FROM b a JOIN b b2
    ON a.tbl = b2.tbl AND a.bucket = b2.bucket AND a.vec_id < b2.vec_id
),
dot AS (
  SELECT p.id_a, p.id_b, sum(ea.v * eb.v) AS d
  FROM pairs p
  JOIN e ea ON ea.vec_id = p.id_a
  JOIN e eb ON eb.vec_id = p.id_b AND eb.i = ea.i
  GROUP BY 1, 2
)
SELECT * FROM (
  SELECT id_a, id_b,
         cast(d as double) / (sqrt(cast(na.nn as double)) * sqrt(cast(nb.nn as double))) AS cosine
  FROM dot JOIN nrm na ON id_a = na.vec_id JOIN nrm nb ON id_b = nb.vec_id
)
WHERE cosine >= {_NEARDUP_THRESHOLD}
"""


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------

def sim_topk_bruteforce_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return S.cosine_topk_bruteforce(emb, query_ids=emb.filter("vec_id < 10"))


SIM_TOPK_ORACLE = f"""
WITH q AS (SELECT vec_id, {_QE} AS qe FROM embeddings),
e AS (SELECT vec_id, unnest(qe) AS v, unnest(range(1, len(qe) + 1)) AS i FROM q),
dot AS (
  SELECT a.vec_id AS q_id, b.vec_id AS n_id, sum(a.v * b.v) AS d
  FROM e a JOIN e b ON a.i = b.i AND a.vec_id < 10 AND a.vec_id != b.vec_id
  GROUP BY 1, 2
),
nrm AS (SELECT vec_id, sum(v * v) AS nn FROM e GROUP BY 1),
scored AS (
  SELECT q_id, n_id,
         cast(d as double) / (sqrt(cast(nq.nn as double)) * sqrt(cast(nb.nn as double))) AS cosine
  FROM dot JOIN nrm nq ON q_id = nq.vec_id JOIN nrm nb ON n_id = nb.vec_id
),
ranked AS (
  SELECT q_id, n_id, cosine,
         cast(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) as int) AS rank
  FROM scored
)
SELECT q_id, n_id, rank, cosine FROM ranked WHERE rank <= 5
"""


def sim_maxsim_groups_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return S.maxsim_topk_groups(emb, query_ids=emb.filter("vec_id < 10"))


SIM_MAXSIM_ORACLE = f"""
WITH q AS (SELECT vec_id, label, {_QE} AS qe FROM embeddings),
e AS (SELECT vec_id, unnest(qe) AS v, unnest(range(1, len(qe) + 1)) AS i FROM q),
dot AS (
  SELECT a.vec_id AS q_id, b.vec_id AS n_id, sum(a.v * b.v) AS d
  FROM e a JOIN e b ON a.i = b.i AND a.vec_id < 10 AND a.vec_id != b.vec_id
  GROUP BY 1, 2
),
nrm AS (SELECT vec_id, sum(v * v) AS nn FROM e GROUP BY 1),
scored AS (
  SELECT q_id, qv.label AS grp,
         cast(d as double) / (sqrt(cast(nq.nn as double)) * sqrt(cast(nb.nn as double))) AS cosine
  FROM dot
  JOIN nrm nq ON q_id = nq.vec_id
  JOIN nrm nb ON n_id = nb.vec_id
  JOIN q qv ON n_id = qv.vec_id
),
g AS (SELECT q_id, grp, max(cosine) AS maxsim FROM scored GROUP BY 1, 2),
ranked AS (
  SELECT q_id, grp AS label, maxsim,
         cast(row_number() OVER (PARTITION BY q_id ORDER BY maxsim DESC, grp) as int) AS rank
  FROM g
)
SELECT q_id, label, rank, maxsim FROM ranked WHERE rank <= 3
"""


_N_PLANES = 4
_DIMS = 64


def sim_topk_lsh_multiprobe_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return S.cosine_topk_lsh_multiprobe(
        emb, query_ids=emb.filter("vec_id < 10"), n_planes=_N_PLANES, dims=_DIMS
    )


def _lsh_multiprobe_oracle() -> str:
    signs = lsh_plane_signs(_N_PLANES, _DIMS)
    dots = ",\n       ".join(
        f"({_plane_dot_sql(p, signs)}) AS d{p}" for p in range(_N_PLANES)
    )
    # first-true-wins CASE == ties resolve to the lowest plane index
    flip_cases = " ".join(
        "WHEN "
        + " AND ".join(
            f"abs(d{p}) <= abs(d{p2})" for p2 in range(_N_PLANES) if p2 != p
        )
        + f" THEN {p}"
        for p in range(_N_PLANES)
    )
    return f"""
WITH q AS (SELECT vec_id, {_QE} AS qe FROM embeddings),
d AS (
  SELECT vec_id, qe,
       {dots},
       ({_bucket_sql(signs)}) AS bucket
  FROM q
),
fl AS (SELECT *, CASE {flip_cases} END AS flip FROM d),
probes AS (
  SELECT vec_id AS q_id, bucket AS pbucket FROM fl WHERE vec_id < 10
  UNION ALL
  SELECT vec_id AS q_id, xor(bucket, 1 << flip) AS pbucket FROM fl WHERE vec_id < 10
),
pairs AS (
  SELECT p.q_id, nb.vec_id AS n_id
  FROM probes p JOIN d nb ON p.pbucket = nb.bucket AND p.q_id != nb.vec_id
),
e AS (SELECT vec_id, unnest(qe) AS v, unnest(range(1, len(qe) + 1)) AS i FROM q),
nrm AS (SELECT vec_id, sum(v * v) AS nn FROM e GROUP BY 1),
dot AS (
  SELECT p.q_id, p.n_id, sum(ea.v * eb.v) AS d
  FROM pairs p
  JOIN e ea ON ea.vec_id = p.q_id
  JOIN e eb ON eb.vec_id = p.n_id AND eb.i = ea.i
  GROUP BY 1, 2
),
scored AS (
  SELECT q_id, n_id,
         cast(d as double) / (sqrt(cast(nq.nn as double)) * sqrt(cast(nb2.nn as double))) AS cosine
  FROM dot JOIN nrm nq ON q_id = nq.vec_id JOIN nrm nb2 ON n_id = nb2.vec_id
),
ranked AS (
  SELECT q_id, n_id, cosine,
         cast(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) as int) AS rank
  FROM scored
)
SELECT q_id, n_id, rank, cosine FROM ranked WHERE rank <= 5
"""


def _plane_dot_sql(p: int, signs: list[list[int]]) -> str:
    return " + ".join(f"({signs[p][d]}) * qe[{d + 1}]" for d in range(_DIMS))


def _bucket_sql(signs: list[list[int]]) -> str:
    return " + ".join(
        f"(CASE WHEN ({_plane_dot_sql(p, signs)}) > 0 THEN {1 << p} ELSE 0 END)::BIGINT"
        for p in range(_N_PLANES)
    )


def sim_lsh_bucket_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return S.lsh_bucket_assign(emb, n_planes=_N_PLANES, dims=_DIMS).select("vec_id", "bucket")


def _lsh_bucket_oracle() -> str:
    signs = lsh_plane_signs(_N_PLANES, _DIMS)
    return f"""
WITH q AS (SELECT vec_id, {_QE} AS qe FROM embeddings)
SELECT vec_id, ({_bucket_sql(signs)}) AS bucket FROM q
"""


def sim_topk_lsh_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return S.cosine_topk_lsh(
        emb, query_ids=emb.filter("vec_id < 10"), n_planes=_N_PLANES, dims=_DIMS
    )


def _lsh_topk_oracle() -> str:
    signs = lsh_plane_signs(_N_PLANES, _DIMS)
    return f"""
WITH q AS (SELECT vec_id, {_QE} AS qe FROM embeddings),
b AS (SELECT vec_id, qe, ({_bucket_sql(signs)}) AS bucket FROM q),
e AS (SELECT vec_id, unnest(qe) AS v, unnest(range(1, len(qe) + 1)) AS i FROM q),
nrm AS (SELECT vec_id, sum(v * v) AS nn FROM e GROUP BY 1),
pairs AS (
  SELECT qa.vec_id AS q_id, qa.bucket, nb.vec_id AS n_id
  FROM b qa JOIN b nb ON qa.bucket = nb.bucket AND qa.vec_id != nb.vec_id
  WHERE qa.vec_id < 10
),
dot AS (
  SELECT p.q_id, p.bucket, p.n_id, sum(ea.v * eb.v) AS d
  FROM pairs p
  JOIN e ea ON ea.vec_id = p.q_id
  JOIN e eb ON eb.vec_id = p.n_id AND eb.i = ea.i
  GROUP BY 1, 2, 3
),
scored AS (
  SELECT q_id, bucket, n_id,
         cast(d as double) / (sqrt(cast(nq.nn as double)) * sqrt(cast(nb2.nn as double))) AS cosine
  FROM dot JOIN nrm nq ON q_id = nq.vec_id JOIN nrm nb2 ON n_id = nb2.vec_id
),
ranked AS (
  SELECT q_id, bucket, n_id, cosine,
         cast(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) as int) AS rank
  FROM scored
)
SELECT q_id, bucket, n_id, rank, cosine FROM ranked WHERE rank <= 5
"""


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------

def text_lang_id_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TX.lang_id(load_table(spark, sf_dir, "documents"))


def _lang_id_oracle() -> str:
    values = ", ".join(
        f"('{lang}', '{w}')"
        for lang, words in sorted(TX.LANG_LEXICON.items())
        for w in words
    )
    return f"""
WITH lex AS (SELECT * FROM (VALUES {values}) t(cand_lang, tok)),
tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok FROM documents),
hits AS (
  SELECT doc_id, cand_lang, count(*) AS hits
  FROM tok JOIN lex USING (tok) GROUP BY 1, 2
),
best AS (
  SELECT doc_id, cand_lang, hits,
         row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, cand_lang) AS rn
  FROM hits
)
SELECT d.doc_id,
       coalesce(b.cand_lang, 'und') AS predicted_lang,
       cast(coalesce(b.hits, 0) as bigint) AS lex_hits
FROM documents d
LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON d.doc_id = b.doc_id
"""


def text_quality_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TX.quality_score(load_table(spark, sf_dir, "documents"))


def _quality_oracle() -> str:
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
base AS (
  SELECT doc_id, length(text)::BIGINT AS n_chars,
         length(regexp_replace(lower(text), '[a-z]', '', 'g'))::BIGINT AS n_nonalpha
  FROM documents
)
SELECT doc_id, n_tokens, n_chars,
       cast(sum_tok_len as double) / cast(n_tokens as double) AS avg_token_len,
       cast(n_stop as double) / cast(n_tokens as double) AS stopword_ratio,
       CASE WHEN n_chars > 0
            THEN cast(n_chars - n_nonalpha as double) / cast(n_chars as double)
            ELSE 0.0 END AS alpha_ratio,
       0.4 * (cast(n_stop as double) / cast(n_tokens as double))
     + 0.3 * least(cast(sum_tok_len as double) / cast(n_tokens as double) / 10.0, 1.0)
     + 0.3 * least(cast(n_tokens as double) / 100.0, 1.0) AS quality_score,
       CASE WHEN 0.4 * (cast(n_stop as double) / cast(n_tokens as double))
               + 0.3 * least(cast(sum_tok_len as double) / cast(n_tokens as double) / 10.0, 1.0)
               + 0.3 * least(cast(n_tokens as double) / 100.0, 1.0) >= 0.5 THEN 'high'
            WHEN 0.4 * (cast(n_stop as double) / cast(n_tokens as double))
               + 0.3 * least(cast(sum_tok_len as double) / cast(n_tokens as double) / 10.0, 1.0)
               + 0.3 * least(cast(n_tokens as double) / 100.0, 1.0) >= 0.3 THEN 'medium'
            ELSE 'low' END AS quality_bucket
FROM base JOIN agg USING (doc_id)
"""


def text_token_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TX.token_stats(load_table(spark, sf_dir, "documents"))


TOKEN_STATS_ORACLE = """
WITH agg AS (
  SELECT doc_id, count(*) AS n_tokens,
         count(DISTINCT tok) AS n_distinct_tokens,
         cast(sum(cast(ceil(length(tok) / 4.0) as bigint)) as bigint) AS n_subword_est
  FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok FROM documents)
  GROUP BY doc_id
),
re AS (
  SELECT doc_id,
         len(regexp_extract_all(lower(text), ' ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+'))::BIGINT AS n_bpe_tokens
  FROM documents
)
SELECT agg.*, re.n_bpe_tokens FROM agg JOIN re USING (doc_id)
"""


def text_fingerprint_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TX.fingerprint(load_table(spark, sf_dir, "documents"))


FINGERPRINT_ORACLE = """
WITH fp AS (
  SELECT doc_id,
         md5(array_to_string(list_sort(list_distinct(string_split(lower(text), ' '))), ' ')) AS fingerprint,
         list_reduce(
           list_prepend(0::BIGINT,
             list_transform(string_split(lower(text), ' '),
                            t -> ('0x' || substr(md5(t), 1, 8))::BIGINT)),
           (a, x) -> (a * 31 + x % 2147483647) % 2147483647) AS rolling_hash
  FROM documents
)
SELECT doc_id, fingerprint, rolling_hash,
       count(*) OVER (PARTITION BY fingerprint) AS n_docs_sharing
FROM fp
"""


# ---------------------------------------------------------------------------
# Multimodal + streaming
# ---------------------------------------------------------------------------

def multimodal_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return media_feature_pipeline(load_table(spark, sf_dir, "documents"))


MULTIMODAL_ORACLE = """
SELECT doc_id, 'image' AS media_type,
       length(text)::BIGINT AS n_bytes,
       md5(text) AS content_hash,
       cast(1 + (ascii(substr(text, 1, 1)) % 64) as int) AS width,
       cast(1 + (ascii(substr(text, 2, 1)) % 64) as int) AS height,
       cast(1 + (length(text) % 7) as int) AS n_frames
FROM documents
"""


def asof_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event matched to the user's latest 'purchase'
    event at-or-before it. Verified against DuckDB's NATIVE ASOF JOIN
    — a composed Spark operator cross-validated by an engine that has
    the primitive built in. Outputs the gap in floor-epoch µs (no raw
    ns timestamps)."""
    from ora_ch_spark.operators.asof import asof_join, dedup_right_per_ts

    ev = load_table(spark, sf_dir, "events")
    purchases = dedup_right_per_ts(
        ev.filter("event_type = 'purchase'").select("user_id", "ts", "event_id"),
        ["user_id"], "ts", "event_id",
    ).withColumnRenamed("event_id", "p_id")
    joined = asof_join(
        ev.select("user_id", "ts", "event_id"),
        purchases,
        key_cols=["user_id"],
        right_value_cols=["p_id"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("asof_p_id").alias("purchase_id"),
        (F.unix_micros("ts") - F.unix_micros("asof_ts")).alias("gap_us"),
    )


def _asof_oracle() -> str:
    return """
WITH e AS (
  SELECT user_id, ts::TIMESTAMP AS ts, event_id, event_type FROM events
),
praw AS (SELECT user_id, ts, event_id FROM e WHERE event_type = 'purchase'),
p AS (
  SELECT user_id, ts, max(event_id) AS p_id FROM praw GROUP BY user_id, ts
)
SELECT e.event_id, e.user_id, p.p_id AS purchase_id,
       epoch_us(e.ts) - epoch_us(p.ts) AS gap_us
FROM e ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.ts >= p.ts
"""


_ASOF_TOL_S = 3600  # 1 hour


def asof_join_tolerance_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a match tolerance (pandas/polars
    ``tolerance``): purchases farther than 1 h before the event do
    not match — the asof columns come back NULL."""
    from ora_ch_spark.operators.asof import asof_join, dedup_right_per_ts

    ev = load_table(spark, sf_dir, "events")
    purchases = dedup_right_per_ts(
        ev.filter("event_type = 'purchase'").select("user_id", "ts", "event_id"),
        ["user_id"], "ts", "event_id",
    ).withColumnRenamed("event_id", "p_id")
    joined = asof_join(
        ev.select("user_id", "ts", "event_id"),
        purchases,
        key_cols=["user_id"],
        right_value_cols=["p_id"],
        tolerance_seconds=_ASOF_TOL_S,
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("asof_p_id").alias("purchase_id"),
        (F.unix_micros("ts") - F.unix_micros("asof_ts")).alias("gap_us"),
    ).orderBy("event_id")


def _asof_tolerance_oracle() -> str:
    return f"""
WITH e AS (
  SELECT user_id, ts::TIMESTAMP AS ts, event_id, event_type FROM events
),
praw AS (SELECT user_id, ts, event_id FROM e WHERE event_type = 'purchase'),
p AS (
  SELECT user_id, ts, max(event_id) AS p_id FROM praw GROUP BY user_id, ts
),
j AS (
  SELECT e.event_id, e.user_id, p.p_id,
         epoch_us(e.ts) - epoch_us(p.ts) AS gap_us
  FROM e ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.ts >= p.ts
)
SELECT event_id, user_id,
       CASE WHEN gap_us <= cast({_ASOF_TOL_S} as bigint) * 1000000 THEN p_id END
         AS purchase_id,
       CASE WHEN gap_us <= cast({_ASOF_TOL_S} as bigint) * 1000000 THEN gap_us END
         AS gap_us
FROM j
ORDER BY event_id
"""


def _asof_inputs(spark: SparkSession, sf_dir: str):
    from ora_ch_spark.operators.asof import dedup_right_per_ts

    ev = load_table(spark, sf_dir, "events")
    purchases = dedup_right_per_ts(
        ev.filter("event_type = 'purchase'").select("user_id", "ts", "event_id"),
        ["user_id"], "ts", "event_id",
    ).withColumnRenamed("event_id", "p_id")
    return ev, purchases


def asof_join_forward_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of: each event matched to the user's NEXT purchase
    at-or-after it — vs DuckDB's native ASOF with the <= condition."""
    from ora_ch_spark.operators.asof import asof_join

    ev, purchases = _asof_inputs(spark, sf_dir)
    joined = asof_join(
        ev.select("user_id", "ts", "event_id"), purchases,
        key_cols=["user_id"], right_value_cols=["p_id"], direction="forward",
    )
    return joined.select(
        "event_id", "user_id",
        F.col("asof_p_id").alias("purchase_id"),
        (F.unix_micros("asof_ts") - F.unix_micros("ts")).alias("gap_us"),
    )


ASOF_FORWARD_ORACLE = """
WITH e AS (
  SELECT user_id, ts::TIMESTAMP AS ts, event_id, event_type FROM events
),
praw AS (SELECT user_id, ts, event_id FROM e WHERE event_type = 'purchase'),
p AS (
  SELECT user_id, ts, max(event_id) AS p_id FROM praw GROUP BY user_id, ts
)
SELECT e.event_id, e.user_id, p.p_id AS purchase_id,
       epoch_us(p.ts) - epoch_us(e.ts) AS gap_us
FROM e ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.ts <= p.ts
"""


def asof_join_nearest_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of (ties backward, the pandas merge_asof rule) —
    the oracle composes DuckDB's two native ASOF directions."""
    from ora_ch_spark.operators.asof import asof_join

    ev, purchases = _asof_inputs(spark, sf_dir)
    joined = asof_join(
        ev.select("user_id", "ts", "event_id"), purchases,
        key_cols=["user_id"], right_value_cols=["p_id"], direction="nearest",
    )
    return joined.select(
        "event_id", "user_id",
        F.col("asof_p_id").alias("purchase_id"),
        F.abs(F.unix_micros("asof_ts") - F.unix_micros("ts")).alias("gap_us"),
    )


ASOF_NEAREST_ORACLE = """
WITH e AS (
  SELECT user_id, ts::TIMESTAMP AS ts, event_id, event_type FROM events
),
praw AS (SELECT user_id, ts, event_id FROM e WHERE event_type = 'purchase'),
p AS (
  SELECT user_id, ts, max(event_id) AS p_id FROM praw GROUP BY user_id, ts
),
b AS (
  SELECT e.event_id, e.user_id, e.ts, p.p_id AS b_id, p.ts AS b_ts
  FROM e ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.ts >= p.ts
),
f AS (
  SELECT e.event_id, p.p_id AS f_id, p.ts AS f_ts
  FROM e ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.ts <= p.ts
),
m AS (
  SELECT b.event_id, b.user_id, b.ts, b_id, b_ts, f_id, f_ts,
         (b_ts IS NULL OR (f_ts IS NOT NULL AND
            epoch_us(f_ts) - epoch_us(ts) < epoch_us(ts) - epoch_us(b_ts)
         )) AS use_fwd
  FROM b JOIN f USING (event_id)
)
SELECT event_id, user_id,
       CASE WHEN use_fwd THEN f_id ELSE b_id END AS purchase_id,
       CASE WHEN use_fwd THEN epoch_us(f_ts) - epoch_us(ts)
            ELSE epoch_us(ts) - epoch_us(b_ts) END AS gap_us
FROM m
"""


# ---------------------------------------------------------------------------
# Dialect battery #5 — ARRAY JOIN clause forms (r6 verdict item 1)
# ---------------------------------------------------------------------------

# CH text exercising all four ARRAY JOIN clause shapes the translator
# rewrites to position-exploded LATERAL VIEWs: (zip) aliased
# multi-array zip incl. an expression item, (shadow) unaliased
# bare-identifier replacement, (left) LEFT ARRAY JOIN keeping
# empty-array rows as NULL elements, (inner) plain form dropping them.
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
    """Clause pass-through, value-gated: WITH ROLLUP subtotal rows,
    INTERSECT set semantics, UNION DISTINCT dedup — all taken by
    Spark natively after translation (the translator must not touch
    them; CH WITH TOTALS, by contrast, is rewritten to GROUPING
    SETS)."""
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
select gh, toInt64(count(*)) as n
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
SELECT gh, cast(count(*) as bigint) AS n
FROM (
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
)
GROUP BY gh
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


def grouped_zscore_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ora_ch_spark.operators.text import grouped_zscore

    return grouped_zscore(load_table(spark, sf_dir, "events"))


def grouped_zscore_pandas_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ora_ch_spark.operators.text import grouped_zscore_pandas

    return grouped_zscore_pandas(load_table(spark, sf_dir, "events"))


# the pandas function computes mean/var from exact decimal sums with
# this exact double formula — the oracle replays it operation-for-
# operation, so the z-scores match bitwise
GROUPED_ZSCORE_ORACLE = """
WITH g AS (
  SELECT event_type,
         cast(sum(cast(value as decimal(18,2))) as double) AS s,
         cast(sum(cast(value as decimal(18,2)) * cast(value as decimal(18,2))) as double) AS sq,
         count(*) AS n
  FROM events GROUP BY event_type
)
SELECT e.event_id, e.event_type, e.value,
       CASE WHEN g.n > 1 AND (g.sq - (g.s * g.s) / g.n) / (g.n - 1) > 0
            THEN (e.value - g.s / g.n)
                 / sqrt((g.sq - (g.s * g.s) / g.n) / (g.n - 1))
            ELSE 0.0 END AS zscore
FROM events e JOIN g USING (event_type)
"""


def multimodal_frames_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing, projected to oracle-comparable
    features (chunk length + md5 of the chunk bytes)."""
    from ora_ch_spark.operators.multimodal import attach_media, sample_frames

    frames = sample_frames(attach_media(load_table(spark, sf_dir, "documents")), n_frames=4)
    return frames.select(
        "doc_id", "frame_idx", "n_bytes", F.md5("frame").alias("frame_md5")
    )


MULTIMODAL_FRAMES_ORACLE = """
WITH d AS (
  SELECT doc_id, text, greatest(1, length(text) // 4) AS step FROM documents
),
f AS (
  SELECT doc_id, i AS frame_idx,
         substr(text, i * step + 1, step) AS chunk
  FROM d, unnest(range(0, 4)) t(i)
)
SELECT doc_id, cast(frame_idx as int) AS frame_idx,
       length(chunk)::BIGINT AS n_bytes,
       md5(chunk) AS frame_md5
FROM f
"""


def streaming_window_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return streaming_hourly_rollup(
        spark,
        f"{sf_dir}/events.parquet",
        query_name=f"events_rollup_{uuid.uuid4().hex[:8]}",
    )


STREAMING_WINDOW_ORACLE = """
SELECT cast(date_trunc('hour', ts) as timestamp_ns) AS hour_start, event_type,
       count(*) AS n_events,
       cast(sum(cast(value as decimal(18,2))) as double) AS total_value
FROM events
WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR
      <= (SELECT max(ts) FROM events) - INTERVAL 10 MINUTE
GROUP BY 1, 2
"""


def sim_topk_ivf_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return S.ivf_topk(emb, query_ids=emb.filter("vec_id < 10"))


def streaming_hll_agg_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming register maintenance: the HLL bucket-max aggregate
    runs as a Structured Streaming complete-mode query over the events
    file source; the emitted register table must equal the batch
    sketch of the same data (the oracle replays the batch form)."""
    from ora_ch_spark.streaming.sketch import streaming_hll_registers

    return streaming_hll_registers(
        spark,
        f"{sf_dir}/events.parquet",
        key_expr=(
            "concat(cast(user_id as string), ':', "
            "cast(cast(ts as date) as string))"
        ),
        group_expr="event_type",
        query_name=f"hll_stream_{uuid.uuid4().hex[:8]}",
    )


def _streaming_hll_oracle() -> str:
    from ora_ch_spark.operators.sketches import HLL_M, W

    return f"""
WITH h AS (
  SELECT event_type AS grp,
         ('0x' || substr(md5({_HLL_KEY_SQL}), 1, 15))::BIGINT AS hv
  FROM events
)
SELECT grp, hv % {HLL_M} AS bucket,
       cast(max(CASE WHEN hv // {HLL_M} = 0 THEN {W + 1}
                ELSE {W + 1} - length(bin(hv // {HLL_M})) END) as int) AS M
FROM h GROUP BY 1, 2
"""


def contrastive_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive training-pair mining: LSH-verified near-dup
    positives + deterministic md5-draw negatives (existence-joined,
    positive-excluded)."""
    from ora_ch_spark.operators.mining import mine_contrastive_pairs

    return mine_contrastive_pairs(
        load_table(spark, sf_dir, "embeddings"),
        threshold=_NEARDUP_THRESHOLD,
        k_neg=3,
        n_planes=_NEARDUP_PLANES,
        n_tables=_NEARDUP_TABLES,
    ).orderBy("label", "id_a", "id_b")


def _contrastive_oracle() -> str:
    pos_sql = _embedding_neardup_oracle().strip()
    return f"""
WITH pos AS ({pos_sql}),
q2 AS (SELECT vec_id FROM embeddings),
draws AS (
  SELECT vec_id AS id_a,
         ('0x' || substr(md5('neg:' || cast(vec_id as varchar) || ':' ||
          cast(i as varchar)), 1, 15))::BIGINT
           % (SELECT max(vec_id) + 1 FROM q2) AS id_b
  FROM q2, (SELECT unnest(range(1, 4)) AS i)
),
neg AS (
  SELECT DISTINCT d.id_a, d.id_b
  FROM draws d
  JOIN q2 e ON e.vec_id = d.id_b
  WHERE d.id_a != d.id_b
    AND NOT EXISTS (
      SELECT 1 FROM pos p
      WHERE p.id_a = least(d.id_a, d.id_b)
        AND p.id_b = greatest(d.id_a, d.id_b)
    )
)
SELECT id_a, id_b, cast(1 as int) AS label FROM pos
UNION ALL
SELECT id_a, id_b, cast(0 as int) AS label FROM neg
ORDER BY label, id_a, id_b
"""


def store_snapshot_diff_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog between two store snapshots: write customer, snapshot,
    apply delete / change / insert mutations, snapshot, diff. The
    oracle replays the LOGICAL mutations — the file-delta mechanics
    (only touched files read) are pinned by the store unit tests."""
    import tempfile

    from ora_ch_spark.store import TableStore

    store = TableStore(spark, tempfile.mkdtemp(prefix="orachspark_diff_"))
    store.create_database("ch")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal"
    )
    store.write("ch", "cust", cust.repartition(4))
    v1 = store.snapshots("ch", "cust")[-1]["name"]
    store.delete_where("ch", "cust", "c_custkey % 10 = 0")
    # change: delete + re-append with shifted balance
    store.delete_where(
        "ch", "cust", "c_custkey % 7 = 1 AND c_custkey % 10 != 0"
    )
    changed = cust.filter("c_custkey % 7 = 1 AND c_custkey % 10 != 0").select(
        "c_custkey", (F.col("c_acctbal") + 5).alias("c_acctbal")
    )
    inserted = cust.filter("c_custkey % 100 = 3").select(
        (F.col("c_custkey") + 1000000).alias("c_custkey"), "c_acctbal"
    )
    store.append("ch", "cust", changed.unionByName(inserted))
    v2 = store.snapshots("ch", "cust")[-1]["name"]
    return store.snapshot_diff("ch", "cust", v1, v2, ["c_custkey"]).orderBy(
        "c_custkey"
    )


SNAPSHOT_DIFF_ORACLE = """
WITH v1 AS (SELECT c_custkey, c_acctbal FROM customer),
v2 AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 7 = 1 THEN c_acctbal + 5
              ELSE c_acctbal END AS c_acctbal
  FROM customer WHERE c_custkey % 10 != 0
  UNION ALL
  SELECT c_custkey + 1000000, c_acctbal
  FROM customer WHERE c_custkey % 100 = 3
)
SELECT c_custkey, change FROM (
  SELECT coalesce(a.c_custkey, b.c_custkey) AS c_custkey,
         CASE WHEN a.c_custkey IS NULL THEN 'added'
              WHEN b.c_custkey IS NULL THEN 'removed'
              WHEN a.c_acctbal IS DISTINCT FROM b.c_acctbal THEN 'changed'
         END AS change
  FROM v1 a FULL OUTER JOIN v2 b ON a.c_custkey = b.c_custkey
)
WHERE change IS NOT NULL
ORDER BY c_custkey
"""


def summap_rollup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH sumMap analogue: per ship-year, merge each row's
    (flag-keys[], counts[]) arrays by key — quantity totals per
    returnflag/linestatus key in one (group, key) shuffle."""
    from ora_ch_spark.operators.maps import map_merge_agg

    li = load_table(spark, sf_dir, "lineitem").select(
        F.year("l_shipdate").alias("y"),
        F.expr(
            "array(concat('R:', l_returnflag), concat('S:', l_linestatus))"
        ).alias("ks"),
        F.expr(
            "array(cast(l_quantity as bigint), 1L)"
        ).alias("vs"),
    )
    merged = map_merge_agg(li, "ks", "vs", ["y"])
    # arrays CSV-serialized: the gate's value hash needs scalar cells
    return merged.select(
        "y",
        F.array_join("keys", ",").alias("keys_csv"),
        F.expr("array_join(transform(vals, v -> cast(v as string)), ',')")
        .alias("vals_csv"),
    ).orderBy("y")


SUMMAP_ORACLE = """
WITH base AS (
  SELECT cast(year(l_shipdate) as int) AS y,
         unnest(['R:' || l_returnflag, 'S:' || l_linestatus]) AS k,
         unnest([cast(l_quantity as bigint), cast(1 as bigint)]) AS v
  FROM lineitem
),
per AS (SELECT y, k, cast(sum(v) as bigint) AS v FROM base GROUP BY 1, 2)
SELECT y,
       array_to_string(array_agg(k ORDER BY k), ',') AS keys_csv,
       array_to_string(array_agg(cast(v as varchar) ORDER BY k), ',') AS vals_csv
FROM per GROUP BY y ORDER BY y
"""


def streaming_upsert_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC apply: the events stream upserts into a store
    table keyed by user_id (latest ts wins, max-struct tie-break) —
    the final table is one row per user, replayed by the oracle as a
    per-user rank-1 pick."""
    import tempfile

    from ora_ch_spark.store import TableStore
    from ora_ch_spark.streaming.ingest import stream_upsert_files

    store = TableStore(spark, tempfile.mkdtemp(prefix="orachspark_ups_"))
    store.create_database("ch")
    return stream_upsert_files(
        spark,
        f"{sf_dir}/events.parquet",
        store,
        "ch",
        "user_latest",
        tempfile.mkdtemp(prefix="ups_ckpt_"),
        key_cols=["user_id"],
        seq_col="ts",
        query_name=f"ups_{uuid.uuid4().hex[:8]}",
    ).orderBy("user_id")


STREAMING_UPSERT_ORACLE = """
SELECT event_id, ts, user_id, event_type, value, props FROM (
  SELECT *, row_number() OVER (
    PARTITION BY user_id
    ORDER BY ts DESC, event_id DESC, event_type DESC, value DESC, props DESC
  ) AS rn
  FROM events
) WHERE rn = 1
ORDER BY user_id
"""


def dedup_editdistance_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typo-class near-dup pairs over 24-char document prefixes:
    deletion-neighborhood blocking (complete for d = 1), exact
    levenshtein verification."""
    from ora_ch_spark.operators.dedup import editdistance_pairs

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "title", F.expr("substring(text, 1, 24)")
    )
    return editdistance_pairs(docs, id_col="doc_id", text_col="title").orderBy(
        "id_a", "id_b"
    )


DEDUP_EDITDISTANCE_ORACLE = """
WITH s AS (
  SELECT doc_id AS id, substr(text, 1, 24) AS s
  FROM documents WHERE text IS NOT NULL
),
dels AS (
  SELECT id, s, unnest(range(1, len(s) + 1)) AS i FROM s WHERE len(s) > 0
),
keys AS (
  SELECT id, s, s AS k FROM s
  UNION
  SELECT id, s, substr(s, 1, i - 1) || substr(s, i + 1) AS k FROM dels
),
cand AS (
  SELECT DISTINCT a.id AS id_a, a.s AS s_a, b.id AS id_b, b.s AS s_b
  FROM keys a JOIN keys b USING (k) WHERE a.id < b.id
)
SELECT id_a, id_b, cast(levenshtein(s_a, s_b) as int) AS dist
FROM cand WHERE levenshtein(s_a, s_b) <= 1
ORDER BY id_a, id_b
"""


def streaming_cms_agg_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CMS maintenance: the counter-sum aggregate runs as a
    complete-mode streaming query over the events file source; the
    emitted (row, col, c) table must equal the batch sketch of the
    same data (the oracle replays cms_build)."""
    from ora_ch_spark.streaming.sketch import streaming_cms_counters

    return streaming_cms_counters(
        spark,
        f"{sf_dir}/events.parquet",
        key_expr="cast(user_id as string)",
        query_name=f"cms_stream_{uuid.uuid4().hex[:8]}",
    ).orderBy("row", "col")


def _streaming_cms_oracle() -> str:
    from ora_ch_spark.operators.sketches import CMS_D, CMS_W

    unions = "\nUNION ALL\n".join(
        f"SELECT {i} AS row, ('0x' || substr(md5('{i}' || ':' ||"
        f" cast(user_id as varchar)), 1, 15))::BIGINT % {CMS_W} AS col,"
        f" 1 AS w FROM events"
        for i in range(CMS_D)
    )
    return f"""
SELECT cast(row as int) AS row, cast(col as bigint) AS col,
       cast(sum(w) as bigint) AS c
FROM ({unions})
GROUP BY 1, 2
ORDER BY row, col
"""


_CORR_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def corr_matrix_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ora_ch_spark.operators.profile import corr_matrix

    return corr_matrix(
        load_table(spark, sf_dir, "lineitem"), list(_CORR_COLS)
    )


def _corr_oracle() -> str:
    cols = _CORR_COLS
    sels = ["cast(count(*) as double) AS n"]
    for c in cols:
        sels.append(f"cast(sum(cast({c} as decimal(18,4))) as double) AS s_{c}")
    for i, a in enumerate(cols):
        for b in cols[i:]:
            sels.append(
                f"cast(sum(cast({a} as decimal(18,4)) * cast({b} as decimal(19,4))) as double) AS p_{a}_{b}"
            )
    rows = []
    for i, a in enumerate(cols):
        for b in cols[i:]:
            rows.append(
                f"SELECT '{a}' AS col_a, '{b}' AS col_b, "
                f"(n * p_{a}_{b} - s_{a} * s_{b}) / "
                f"sqrt((n * p_{a}_{a} - s_{a} * s_{a}) * (n * p_{b}_{b} - s_{b} * s_{b})) AS corr "
                f"FROM w"
            )
    body = "\nUNION ALL\n".join(rows)
    return f"""
WITH w AS (SELECT {", ".join(sels)} FROM lineitem)
{body}
"""


def split_assign_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 split labels for every document plus the
    per-(lang, split) count rollup in one output (split is a pure
    function of doc_id — stable under corpus growth)."""
    from ora_ch_spark.operators.sampling import assign_splits

    docs = load_table(spark, sf_dir, "documents")
    out = assign_splits(docs)
    return out.groupBy("lang", "split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("min_id"),
    )


SPLIT_ASSIGN_ORACLE = """
WITH s AS (
  SELECT doc_id, lang,
         ('0x' || substr(md5('split:' || cast(doc_id as varchar)), 1, 15))::BIGINT
           % 1000000 AS b
  FROM documents
)
SELECT lang,
       CASE WHEN b < 900000 THEN 'train'
            WHEN b < 950000 THEN 'val'
            ELSE 'test' END AS split,
       cast(count(*) as bigint) AS n_docs,
       min(doc_id) AS min_id
FROM s GROUP BY 1, 2
"""


def chunk_overlap_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-granularity inter-document duplication (the C4/
    RefinedWeb-style overlap metric): chunk every doc, hash chunks,
    mark a chunk SHARED when its hash appears in more than one
    distinct doc, report per-doc (n_chunks, n_shared, shared_frac).
    Composes chunk_documents with the exact-dedup machinery — one
    explode pass + one hash groupBy + one broadcast-size join back."""
    from ora_ch_spark.operators.text import chunk_documents

    chunks = chunk_documents(
        load_table(spark, sf_dir, "documents"), CHUNK_CHARS, CHUNK_OVERLAP
    ).select(
        "doc_id", F.md5(F.col("chunk_text")).alias("h")
    )
    shared = (
        chunks.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") > 1)
        .select("h")
    )
    flagged = chunks.join(
        F.broadcast(shared.withColumn("__shared", F.lit(1))), "h", "left"
    )
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.coalesce(F.col("__shared"), F.lit(0))).cast("bigint").alias("n_shared"),
        )
        .select(
            "doc_id",
            "n_chunks",
            "n_shared",
            (
                F.col("n_shared").cast("double") / F.col("n_chunks").cast("double")
            ).alias("shared_frac"),
        )
    )


def _chunk_overlap_oracle() -> str:
    stride = CHUNK_CHARS - CHUNK_OVERLAP
    return f"""
WITH n AS (
  SELECT doc_id, coalesce(text, '') AS text,
         greatest(1, cast(ceil((length(coalesce(text, '')) - {CHUNK_OVERLAP}) / {stride}.0) as int)) AS n_chunks
  FROM documents
),
ch AS (
  SELECT doc_id,
         md5(substr(text, cast(cid * {stride} + 1 as int), {CHUNK_CHARS})) AS h
  FROM (SELECT doc_id, text, unnest(range(0, n_chunks)) AS cid FROM n)
),
sh AS (SELECT h FROM ch GROUP BY h HAVING count(DISTINCT doc_id) > 1)
SELECT doc_id, cast(count(*) as bigint) AS n_chunks,
       cast(sum(CASE WHEN sh.h IS NOT NULL THEN 1 ELSE 0 END) as bigint) AS n_shared,
       cast(sum(CASE WHEN sh.h IS NOT NULL THEN 1 ELSE 0 END) as double)
         / cast(count(*) as double) AS shared_frac
FROM ch LEFT JOIN sh ON ch.h = sh.h
GROUP BY doc_id
"""


def dedup_keep_best_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.exact_dedup_keep_best(docs, TX.quality_score(docs))


def _keep_best_oracle() -> str:
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
  SELECT d.doc_id, md5(d.text) AS text_hash,
         0.4 * (cast(n_stop as double) / cast(n_tokens as double))
       + 0.3 * least(cast(sum_tok_len as double) / cast(n_tokens as double) / 10.0, 1.0)
       + 0.3 * least(cast(n_tokens as double) / 100.0, 1.0) AS s
  FROM documents d JOIN agg USING (doc_id)
),
w AS (
  SELECT text_hash, max({{'s': s, 'negid': -doc_id}}) AS w,
         cast(count(*) as bigint) AS dup_count
  FROM q GROUP BY 1
)
SELECT text_hash, cast(-(w.negid) as bigint) AS keep_id,
       w.s AS best_score, dup_count FROM w
"""


def spearman_corr_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH rankCorr analogue: exact-fractional-rank Spearman between
    quantity and discount (corr_matrix determinism recipe on the
    rank domain)."""
    from ora_ch_spark.operators.profile import spearman_corr

    return spearman_corr(
        load_table(spark, sf_dir, "lineitem"), "l_quantity", "l_discount"
    )


SPEARMAN_ORACLE = """
WITH ra AS (
  SELECT v AS l_quantity, 2 * before + c + 1 AS ra2 FROM (
    SELECT l_quantity AS v, count(*) AS c,
           coalesce(sum(count(*)) OVER (ORDER BY l_quantity
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
    FROM lineitem GROUP BY 1)
),
rb AS (
  SELECT v AS l_discount, 2 * before + c + 1 AS rb2 FROM (
    SELECT l_discount AS v, count(*) AS c,
           coalesce(sum(count(*)) OVER (ORDER BY l_discount
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
    FROM lineitem GROUP BY 1)
),
j AS (
  SELECT ra2, rb2 FROM lineitem
  JOIN ra USING (l_quantity) JOIN rb USING (l_discount)
),
m AS (
  SELECT cast(count(*) as double) AS n,
         cast(sum(cast(ra2 as decimal(18,4))) as double) AS sa,
         cast(sum(cast(rb2 as decimal(18,4))) as double) AS sb,
         cast(sum(cast(ra2 as decimal(18,4)) * cast(rb2 as decimal(19,4)))
              as double) AS sab,
         cast(sum(cast(ra2 as decimal(18,4)) * cast(ra2 as decimal(19,4)))
              as double) AS saa,
         cast(sum(cast(rb2 as decimal(18,4)) * cast(rb2 as decimal(19,4)))
              as double) AS sbb
  FROM j
)
SELECT 'l_quantity' AS col_a, 'l_discount' AS col_b,
       cast(n as bigint) AS n,
       (n * sab - sa * sb)
         / sqrt((n * saa - sa * sa) * (n * sbb - sb * sb)) AS rho
FROM m
"""


def auc_exact_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC AUC of 'does price predict returnflag R' — a
    deterministic eval-metric replay (Mann-Whitney ranks, ½ tie
    credit)."""
    from ora_ch_spark.operators.profile import auc_exact

    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "is_r", F.col("l_returnflag") == "R"
    )
    return auc_exact(li, "l_extendedprice", "is_r")


AUC_ORACLE = """
WITH per AS (
  SELECT l_extendedprice AS v, count(*) AS c FROM lineitem GROUP BY 1
),
ranks AS (
  SELECT v, 2 * coalesce(sum(c) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         + c + 1 AS r2
  FROM per
),
j AS (
  SELECT r.r2, (l.l_returnflag = 'R') AS y
  FROM lineitem l JOIN ranks r ON l.l_extendedprice = r.v
)
SELECT cast(count(*) FILTER (y) as bigint) AS n_pos,
       cast(count(*) FILTER (NOT y) as bigint) AS n_neg,
       (cast(sum(r2) FILTER (y) as double)
         - cast(count(*) FILTER (y) as double)
           * (count(*) FILTER (y) + 1))
         / (2.0 * count(*) FILTER (y) * count(*) FILTER (NOT y)) AS auc
FROM j
"""


def key_skew_report_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew diagnosis over the events user key: the 20 heaviest
    user_ids with row share and skew ratio vs the mean key weight."""
    from ora_ch_spark.operators.profile import key_skew_report

    return key_skew_report(
        load_table(spark, sf_dir, "events"), "user_id", top=20
    )


KEY_SKEW_ORACLE = """
WITH per AS (
  SELECT user_id, cast(count(*) as bigint) AS cnt FROM events GROUP BY 1
),
st AS (SELECT sum(cnt) AS total, cast(count(*) as bigint) AS ndv FROM per)
SELECT user_id, cnt,
       cast(cnt as double) / total AS share,
       cast(cnt * ndv as double) / total AS skew_ratio
FROM per, st
ORDER BY cnt DESC, user_id
LIMIT 20
"""


def dedup_canonicalize_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE end-to-end near-dup workflow as one composite: MinHash-LSH
    pairs → connected components (duplicate clusters) → quality-aware
    canonical pick per cluster (argmax score, lowest-id tie). Returns
    one row per multi-member cluster: (component, keep_id,
    best_score, n_members). Every stage is individually gated
    (dedup_minhash_lsh / dedup_components / dedup_keep_best); this
    pins their composition."""
    docs = load_table(spark, sf_dir, "documents")
    # persist: connected_components_star consumes the pair frame
    # twice (edge persist + node set) — without this the whole
    # shingle->minhash->band pipeline re-runs per consumer
    pairs = D.minhash_lsh_dedup(docs).persist()
    comps = D.connected_components_star(pairs)
    q = TX.quality_score(docs).select("doc_id", "quality_score")
    j = comps.join(q, "doc_id")
    w = j.groupBy("component").agg(
        F.max(
            F.struct(
                F.col("quality_score").alias("s"),
                (-F.col("doc_id")).alias("negid"),
            )
        ).alias("__w"),
        F.count(F.lit(1)).alias("n_members"),
    )
    return w.select(
        "component",
        (-F.col("__w.negid")).cast("bigint").alias("keep_id"),
        F.col("__w.s").alias("best_score"),
        "n_members",
    ).orderBy("component")


def _canonicalize_oracle() -> str:
    stop_set = ", ".join(f"'{w}'" for w in TX.STOPWORDS_EN)
    comp = _components_oracle().strip()
    return f"""
WITH comp AS ({comp}),
tok AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok FROM documents
),
agg AS (
  SELECT doc_id, count(*) AS n_tokens,
         sum(CASE WHEN tok IN ({stop_set}) THEN 1 ELSE 0 END) AS n_stop,
         sum(length(tok)) AS sum_tok_len
  FROM tok GROUP BY doc_id
),
q AS (
  SELECT d.doc_id,
         0.4 * (cast(n_stop as double) / cast(n_tokens as double))
       + 0.3 * least(cast(sum_tok_len as double) / cast(n_tokens as double) / 10.0, 1.0)
       + 0.3 * least(cast(n_tokens as double) / 100.0, 1.0) AS s
  FROM documents d JOIN agg USING (doc_id)
),
w AS (
  SELECT c.component, max({{'s': q.s, 'negid': -q.doc_id}}) AS w,
         cast(count(*) as bigint) AS n_members
  FROM comp c JOIN q ON c.doc_id = q.doc_id
  GROUP BY 1
)
SELECT component, cast(-(w.negid) as bigint) AS keep_id,
       w.s AS best_score, n_members
FROM w ORDER BY component
"""


def events_anomaly_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ops-monitoring composite: hourly event counts per type,
    z-scored against the type's own hourly distribution (exact
    integer moments → one fixed double formula, the grouped_zscore
    determinism recipe), anomalies flagged at |z| ≥ 3."""
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(
            F.col("event_type").alias("grp"),
            F.date_trunc("hour", F.col("ts")).alias("hour"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    g = hourly.groupBy("grp").agg(
        F.sum("n_events").cast("double").alias("_s"),
        F.sum(F.col("n_events") * F.col("n_events")).cast("double").alias("_sq"),
        F.count(F.lit(1)).alias("_n"),
    )
    s, sq, n = F.col("_s"), F.col("_sq"), F.col("_n")
    var = (sq - s * s / n) / (n - 1)
    z = (
        F.when((n > 1) & (var > 0), (F.col("n_events") - s / n) / F.sqrt(var))
        .otherwise(F.lit(0.0))
    )
    return (
        hourly.join(F.broadcast(g), "grp")
        .select(
            "grp", "hour", "n_events",
            z.alias("zscore"),
            (F.abs(z) >= 3.0).alias("is_anomaly"),
        )
    )


EVENTS_ANOMALY_ORACLE = """
WITH hourly AS (
  SELECT event_type AS grp, date_trunc('hour', ts) AS hour,
         cast(count(*) as bigint) AS n_events
  FROM events GROUP BY 1, 2
),
g AS (
  SELECT grp, cast(sum(n_events) as double) AS s,
         cast(sum(n_events * n_events) as double) AS sq,
         cast(count(*) as bigint) AS n
  FROM hourly GROUP BY 1
)
SELECT grp, hour, n_events,
       CASE WHEN n > 1 AND (sq - s * s / n) / (n - 1) > 0
            THEN (n_events - s / n) / sqrt((sq - s * s / n) / (n - 1))
            ELSE 0.0 END AS zscore,
       abs(CASE WHEN n > 1 AND (sq - s * s / n) / (n - 1) > 0
            THEN (n_events - s / n) / sqrt((sq - s * s / n) / (n - 1))
            ELSE 0.0 END) >= 3.0 AS is_anomaly
FROM hourly JOIN g USING (grp)
"""


def text_flagged_terms_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ora_ch_spark.operators.text import flagged_term_score

    return flagged_term_score(load_table(spark, sf_dir, "documents"))


def _flagged_terms_oracle() -> str:
    from ora_ch_spark.operators.text import FLAGGED_TERMS

    lex = ", ".join(f"'{t}'" for t in FLAGGED_TERMS)
    return f"""
WITH tok AS (
  SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks FROM documents
),
sc AS (
  SELECT doc_id,
         cast(len(list_filter(toks, t -> list_contains([{lex}], t))) as bigint) AS n_flagged,
         cast(len(toks) as bigint) AS n_tokens
  FROM tok
)
SELECT doc_id, n_flagged, n_tokens,
       CASE WHEN n_tokens > 0
            THEN cast(n_flagged as double) / cast(n_tokens as double)
            ELSE 0.0 END AS flagged_share,
       (CASE WHEN n_tokens > 0
             THEN cast(n_flagged as double) / cast(n_tokens as double)
             ELSE 0.0 END) > 0.01 AS flagged
FROM sc
"""


def sim_topk_ivf_index_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persisted-index form of sim_topk_ivf: build the IVF index
    into a TableStore (centroids table + centroid-partitioned
    assignments), then answer the SAME query batch from the index —
    hash-gated against the SAME oracle, proving index round-tripping
    changes nothing."""
    from ora_ch_spark.catalog import _tmp_store

    store = _tmp_store(spark)
    store.create_database("ch")
    emb = load_table(spark, sf_dir, "embeddings")
    S.build_ivf_index(store, "ch", emb)
    return S.ivf_topk_from_index(
        store, "ch", emb.filter("vec_id < 10")
    )


SIM_IVF_ORACLE = f"""
WITH q AS (SELECT vec_id, {_QE} AS qe FROM embeddings),
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
  SELECT q_id, n_id,
         cast(d as double) / (sqrt(cast(nq.nn as double)) * sqrt(cast(nb.nn as double))) AS cosine
  FROM dot2 JOIN nrm nq ON q_id = nq.vec_id JOIN nrm nb ON n_id = nb.vec_id
),
ranked AS (
  SELECT q_id, n_id, cosine,
         cast(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) as int) AS rank
  FROM scored
)
SELECT q_id, n_id, rank, cosine FROM ranked WHERE rank <= 5
"""


def events_sessionize_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ora_ch_spark.streaming.sessions import sessionize

    return sessionize(load_table(spark, sf_dir, "events"))


# gap arithmetic on floor-epoch-seconds on BOTH sides (Spark's
# cast-to-long floors; DuckDB floor(epoch()) matches)
SESSIONIZE_ORACLE = """
WITH e AS (
  SELECT user_id, event_id, value, ts::TIMESTAMP AS ts FROM events
),
f AS (
  SELECT user_id, event_id, value, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR cast(floor(epoch(ts)) as bigint)
                   - cast(floor(epoch(lag(ts) OVER w)) as bigint) > 1800
              THEN 1 ELSE 0 END AS nf
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, value, ts,
         cast(sum(nf) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) as bigint) AS session_id
  FROM f
)
SELECT user_id, session_id,
       min(ts)::TIMESTAMP_NS AS session_start, max(ts)::TIMESTAMP_NS AS session_end,
       count(*) AS n_events,
       cast(sum(cast(value as decimal(18,2))) as double) AS total_value
FROM s GROUP BY user_id, session_id
"""


def session_window_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ``F.session_window`` (vs the manual lag/cumsum in
    events_sessionize): semantics verified — a new session starts
    strictly when the gap exceeds 30 min (exact µs); window end =
    last event + gap."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


SESSION_WINDOW_ORACLE = """
WITH e AS (
  SELECT user_id, value, ts::TIMESTAMP AS ts FROM events
),
f AS (
  SELECT user_id, value, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS nf
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
s AS (
  SELECT user_id, value, ts,
         cast(sum(nf) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) as bigint) AS sid
  FROM f
)
SELECT user_id,
       min(ts)::TIMESTAMP_NS AS session_start,
       (max(ts) + INTERVAL 30 MINUTE)::TIMESTAMP_NS AS session_end,
       count(*) AS n_events,
       cast(sum(cast(value as decimal(18,2))) as double) AS total_value
FROM s GROUP BY user_id, sid
"""


def streaming_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feed the events file TWICE (two files, same content) through
    the stateful dedup stream — output must collapse back to the
    distinct event set."""
    import os
    import tempfile

    from ora_ch_spark.streaming.sessions import streaming_stateful_dedup

    d = tempfile.mkdtemp(prefix="dupsrc_")
    os.symlink(f"{sf_dir}/events.parquet", os.path.join(d, "a.parquet"))
    os.symlink(f"{sf_dir}/events.parquet", os.path.join(d, "b.parquet"))
    return streaming_stateful_dedup(
        spark, d, query_name=f"dedup_out_{uuid.uuid4().hex[:8]}"
    )


STREAMING_DEDUP_ORACLE = """
SELECT user_id, event_id, event_type, value FROM events
"""


def pipeline_clean_corpus_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ora_ch_spark.operators.pipeline import clean_corpus_stats

    return clean_corpus_stats(load_table(spark, sf_dir, "documents"))


def _pipeline_oracle() -> str:
    """Compose the verified stage oracles into one WITH chain: lang-id
    → quality filter → exact dedup → minhash near-dedup → stats."""
    stop_set = ", ".join(f"'{w}'" for w in TX.STOPWORDS_EN)
    lex_values = ", ".join(
        f"('{lang}', '{w}')"
        for lang, words in sorted(TX.LANG_LEXICON.items())
        for w in words
    )
    # the minhash fragment runs over the post-filter corpus `kept2`
    minhash_pairs = _minhash_oracle(relation="kept2")
    # strip its WITH and reuse as chained CTEs
    minhash_body = minhash_pairs.strip()
    assert minhash_body.startswith("WITH ")
    minhash_ctes, minhash_select = minhash_body[5:].rsplit(")\nSELECT", 1)
    return f"""
WITH lex AS (SELECT * FROM (VALUES {lex_values}) t(cand_lang, tok)),
ltok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok FROM documents),
hits AS (
  SELECT doc_id, cand_lang, count(*) AS hits FROM ltok JOIN lex USING (tok) GROUP BY 1, 2
),
best AS (
  SELECT doc_id, cand_lang,
         row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, cand_lang) AS rn
  FROM hits
),
pred AS (
  SELECT d.doc_id, coalesce(b.cand_lang, 'und') AS predicted_lang
  FROM documents d LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON d.doc_id = b.doc_id
),
qagg AS (
  SELECT doc_id, count(*) AS n_tokens,
         sum(CASE WHEN tok IN ({stop_set}) THEN 1 ELSE 0 END) AS n_stop,
         sum(length(tok)) AS sum_tok_len
  FROM ltok GROUP BY doc_id
),
qual AS (
  SELECT doc_id,
         0.4 * (cast(n_stop as double) / cast(n_tokens as double))
       + 0.3 * least(cast(sum_tok_len as double) / cast(n_tokens as double) / 10.0, 1.0)
       + 0.3 * least(cast(n_tokens as double) / 100.0, 1.0) AS quality_score
  FROM qagg
),
kept AS (
  SELECT d.* FROM documents d
  JOIN pred USING (doc_id) JOIN qual USING (doc_id)
  WHERE pred.predicted_lang = 'en' AND qual.quality_score >= 0.3
),
surv AS (SELECT min(doc_id) AS doc_id FROM kept GROUP BY md5(text)),
kept2 AS (SELECT k.* FROM kept k JOIN surv USING (doc_id)),
{minhash_ctes})
, pairs AS (SELECT{minhash_select}
),
dropped AS (SELECT DISTINCT id_b AS doc_id FROM pairs),
final AS (
  SELECT k.* FROM kept2 k LEFT JOIN dropped dr ON k.doc_id = dr.doc_id
  WHERE dr.doc_id IS NULL
)
SELECT source, count(*) AS n_docs,
       cast(sum(len(string_split(lower(text), ' '))) as bigint) AS n_tokens,
       cast(sum(n_chars) as bigint) AS n_chars_total
FROM final GROUP BY source
"""


# ---------------------------------------------------------------------------
# Skew-salted join through the correctness gate
# ---------------------------------------------------------------------------

def skew_salted_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pathological hot keys by construction (600k lineitem rows over
    10 derived keys) joined against an unbroadcast small side through
    ``salted_join`` — the differential gate proves the salt/replicate/
    join/unsalt choreography changes NOTHING about the result."""
    from ora_ch_spark.operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "k", F.pmod(F.col("l_orderkey"), F.lit(10))
    )
    dim = spark.range(10).select(
        F.col("id").alias("k"), (F.col("id").cast("double") * 1.5).alias("w")
    )
    j = salted_join(li, dim, on=["k"], buckets=8)
    return j.groupBy("k", "w").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
    )


SKEW_SALTED_ORACLE = """
SELECT l_orderkey % 10 AS k,
       cast(l_orderkey % 10 as double) * 1.5 AS w,
       count(*) AS n_rows,
       cast(sum(cast(l_quantity as decimal(18,2))) as double) AS sum_qty
FROM lineitem GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Corpus selection + PII + incremental dedup (round 2 additions)
# ---------------------------------------------------------------------------

def text_pii_scrub_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The synthetic docs carry no natural PII, so deterministic PII
    (email/phone/IP derived from doc_id) is injected into every third
    doc — in the oracle too — and the scrub is exercised for real."""
    docs = load_table(spark, sf_dir, "documents")
    inj = F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(
            F.col("text"),
            F.lit(" contact u"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 555-"),
            F.lpad(F.pmod(F.col("doc_id"), F.lit(10000)).cast("string"), 4, "0"),
            F.lit(" at 10.0."),
            F.pmod(F.col("doc_id"), F.lit(256)).cast("string"),
            F.lit(".1"),
        ),
    ).otherwise(F.col("text"))
    return TX.pii_scrub(docs.withColumn("text", inj))


def _pii_scrub_oracle() -> str:
    em, ip, ph = (TX.PII_PATTERNS[i][1] for i in range(3))
    return f"""
WITH d AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN
           text || ' contact u' || doc_id || '@example.com or 555-' ||
           lpad(cast(doc_id % 10000 as varchar), 4, '0') ||
           ' at 10.0.' || cast(doc_id % 256 as varchar) || '.1'
         ELSE text END AS text
  FROM documents
),
s AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '{em}'))::BIGINT AS n_emails,
         len(regexp_extract_all(text, '{ip}'))::BIGINT AS n_ipv4,
         len(regexp_extract_all(text, '{ph}'))::BIGINT AS n_phones,
         regexp_replace(regexp_replace(regexp_replace(text,
           '{em}', '<EMAIL>', 'g'), '{ip}', '<IP>', 'g'), '{ph}', '<PHONE>', 'g') AS scrubbed
  FROM d
)
SELECT doc_id, n_emails, n_ipv4, n_phones,
       n_emails + n_ipv4 + n_phones AS n_pii,
       md5(scrubbed) AS scrubbed_md5,
       length(scrubbed)::BIGINT AS scrubbed_len
FROM s
"""


def text_repetition_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ora_ch_spark.operators.text import repetition_stats

    return repetition_stats(load_table(spark, sf_dir, "documents"))


# algorithm replay of repetition_stats: token + bigram frequency
# tables, argmax per doc with (count desc, term asc) tie-break, double
# fractions from exact integer counts
TEXT_REPETITION_ORACLE = """
WITH d AS (
  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
),
tcc AS (
  SELECT doc_id, term, count(*) AS c
  FROM (SELECT doc_id, unnest(t) AS term FROM d) GROUP BY 1, 2
),
tok AS (
  SELECT doc_id,
         cast(sum(c) as bigint) AS n_tokens,
         count(*) AS n_distinct_tokens,
         max(CASE WHEN rn = 1 THEN term END) AS top_token,
         max(CASE WHEN rn = 1 THEN c END) AS top_token_c
  FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                     ORDER BY c DESC, term ASC) AS rn FROM tcc)
  GROUP BY 1
),
bgc AS (
  SELECT doc_id, term, count(*) AS c
  FROM (SELECT doc_id,
               unnest([array_to_string(t[i:i+1], ' ') for i in range(1, len(t))]) AS term
        FROM d WHERE len(t) >= 2)
  GROUP BY 1, 2
),
bgt AS (
  SELECT doc_id,
         cast(sum(c) as bigint) AS n_bigrams,
         max(CASE WHEN rn = 1 THEN term END) AS top_bigram,
         max(CASE WHEN rn = 1 THEN c END) AS top_bigram_c
  FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                     ORDER BY c DESC, term ASC) AS rn FROM bgc)
  GROUP BY 1
)
SELECT tok.doc_id, n_tokens, n_distinct_tokens,
       cast(n_distinct_tokens as double) / cast(n_tokens as double) AS distinct_frac,
       top_token,
       cast(top_token_c as double) / cast(n_tokens as double) AS top_token_frac,
       top_bigram,
       CASE WHEN n_bigrams IS NOT NULL
            THEN cast(top_bigram_c as double) / cast(n_bigrams as double)
            ELSE 0.0 END AS top_bigram_frac,
       (CASE WHEN n_bigrams IS NOT NULL
             THEN cast(top_bigram_c as double) / cast(n_bigrams as double)
             ELSE 0.0 END > 0.10
        OR cast(n_distinct_tokens as double) / cast(n_tokens as double) < 0.30
       ) AS repetitive
FROM tok LEFT JOIN bgt ON tok.doc_id = bgt.doc_id
"""


def decontaminate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: every 10th doc plays the benchmark
    corpus; the rest are scanned for shared word 4-grams (the planted
    near-dup structure guarantees real hits)."""
    from ora_ch_spark.operators.dedup import decontaminate

    docs = load_table(spark, sf_dir, "documents")
    return decontaminate(
        docs.filter("doc_id % 10 != 0"), docs.filter("doc_id % 10 = 0"), n=4
    )


DECONTAMINATE_ORACLE = """
WITH d AS (
  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
),
b AS (
  SELECT DISTINCT unnest([array_to_string(t[i:i+3], ' ')
                          for i in range(1, len(t) - 4 + 2)]) AS shingle
  FROM d WHERE doc_id % 10 = 0 AND len(t) >= 4
),
s AS (
  SELECT doc_id, unnest(list_distinct([array_to_string(t[i:i+3], ' ')
                                       for i in range(1, len(t) - 4 + 2)])) AS shingle
  FROM d WHERE doc_id % 10 <> 0 AND len(t) >= 4
),
h AS (
  SELECT doc_id, count(*) AS n FROM s JOIN b USING (shingle) GROUP BY 1
)
SELECT d2.doc_id,
       cast(coalesce(h.n, 0) as bigint) AS n_contaminated_ngrams,
       coalesce(h.n, 0) >= 1 AS contaminated
FROM (SELECT doc_id FROM documents WHERE doc_id % 10 <> 0) d2
LEFT JOIN h ON d2.doc_id = h.doc_id
"""


def pack_sequences_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ora_ch_spark.operators.sampling import pack_sequences

    return pack_sequences(load_table(spark, sf_dir, "documents"), budget=256)


# algorithm replay of pack_sequences(budget=256, shards=8): md5 shard
# bucket, doc-id-ordered cumsum per shard, floor-division sequence
# spans (double division exact below 2^53)
PACK_SEQUENCES_ORACLE = """
WITH d AS (
  SELECT doc_id,
         ('0x' || substr(md5('pack:' || cast(doc_id as varchar)), 1, 8))::BIGINT % 8 AS shard,
         cast(len(string_split(lower(text), ' ')) as bigint) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, shard, n_tokens,
         sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM d
)
SELECT doc_id, shard, n_tokens,
       cast(cum - n_tokens as bigint) AS tok_offset,
       cast(floor((cum - n_tokens) / 256.0) as bigint) AS start_seq,
       cast(floor((cum - 1) / 256.0) as bigint) AS end_seq
FROM c
"""


_STRAT_RATES = {"en": 0.5, "es": 0.25, "fr": 0.1, "de": 0.75}  # zh → default 0


def sample_stratified_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ora_ch_spark.operators.sampling import stratified_sample

    docs = load_table(spark, sf_dir, "documents")
    return stratified_sample(docs, _STRAT_RATES).select(
        "doc_id", "lang", "source", "n_chars"
    )


def _sample_stratified_oracle() -> str:
    cases = " ".join(
        f"WHEN '{g}' THEN {int(round(r * 10000))}"
        for g, r in sorted(_STRAT_RATES.items())
    )
    return f"""
SELECT doc_id, lang, source, n_chars FROM documents
WHERE ('0x' || substr(md5('strat:' || cast(doc_id as varchar)), 1, 8))::BIGINT % 10000
      < CASE lang {cases} ELSE 0 END
"""


def sample_fixed_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ora_ch_spark.operators.sampling import sample_fixed_per_group

    docs = load_table(spark, sf_dir, "documents")
    return sample_fixed_per_group(docs, 20).select("doc_id", "lang", "source")


SAMPLE_FIXED_ORACLE = """
SELECT doc_id, lang, source FROM (
  SELECT doc_id, lang, source,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY md5('resv:' || cast(doc_id as varchar)) ASC, doc_id ASC
         ) AS rn
  FROM documents
) WHERE rn <= 20
"""


def incremental_agg_view_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized per-customer order rollup built in TWO refreshes
    (initial ⅔ load, then the appended remainder) — the gate hashes
    that the incremental path equals one full aggregation."""
    from ora_ch_spark.catalog import _tmp_store
    from ora_ch_spark.operators.incremental import refresh_agg_view

    store = _tmp_store(spark)
    store.create_database("ch")
    orders = load_table(spark, sf_dir, "orders")
    store.write("ch", "orders_src", orders.filter("o_orderkey % 3 != 0"))
    refresh_agg_view(
        store, ("ch", "orders_src"), ("ch", "orders_by_cust"),
        ["o_custkey"], "o_totalprice",
    )
    store.append("ch", "orders_src", orders.filter("o_orderkey % 3 = 0"))
    v = refresh_agg_view(
        store, ("ch", "orders_src"), ("ch", "orders_by_cust"),
        ["o_custkey"], "o_totalprice",
    )
    return v.select(
        "o_custkey", "n_rows", F.col("val_sum").cast("double").alias("total_price")
    )


INCREMENTAL_AGG_ORACLE = """
SELECT o_custkey, count(*) AS n_rows,
       cast(sum(cast(o_totalprice as decimal(18,2))) as double) AS total_price
FROM orders GROUP BY 1
"""


def streaming_stream_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream interval join (purchase ⋈ click
    within the prior hour, per user)."""
    import os as _os
    import uuid as _uuid

    from ora_ch_spark.streaming.watermark import streaming_stream_join

    return streaming_stream_join(
        spark,
        _os.path.join(sf_dir, "events.parquet"),
        query_name=f"ssj_{_uuid.uuid4().hex[:8]}",
    )


STREAMING_STREAM_JOIN_ORACLE = """
SELECT l.user_id, l.event_id AS l_id, r.event_id AS r_id,
       epoch_us(l.ts::TIMESTAMP) - epoch_us(r.ts::TIMESTAMP) AS gap_us
FROM events l JOIN events r
  ON l.user_id = r.user_id
 AND l.event_type = 'purchase' AND r.event_type = 'click'
 AND r.ts <= l.ts AND r.ts >= l.ts - INTERVAL 60 MINUTE
"""


_BUDGET_TOKENS = 20000


def token_budget_select_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy token-budget selection over documents, best (length)
    score first — bucket-prefix contract (width 50)."""
    from ora_ch_spark.operators.sampling import token_budget_select

    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        F.col("n_chars").cast("double").alias("score"),
        F.size(F.split(F.lower("text"), " ")).cast("bigint").alias("n_tokens"),
    )
    return token_budget_select(
        d, budget=_BUDGET_TOKENS, score_col="score", bucket_width=50.0
    )


TOKEN_BUDGET_ORACLE = f"""
WITH d AS (
  SELECT doc_id, cast(n_chars as double) AS score,
         cast(len(string_split(lower(text), ' ')) as bigint) AS n_tokens,
         cast(floor(n_chars / 50.0) as bigint) AS bkt
  FROM documents
),
pb AS (SELECT bkt, sum(n_tokens) AS btoks FROM d GROUP BY 1),
run AS (
  SELECT bkt, btoks,
         sum(btoks) OVER (ORDER BY bkt DESC ROWS UNBOUNDED PRECEDING) AS cum
  FROM pb
),
fullb AS (SELECT bkt FROM run WHERE cum <= {_BUDGET_TOKENS}),
thr AS (
  SELECT bkt, {_BUDGET_TOKENS} - (cum - btoks) AS remain
  FROM run WHERE cum > {_BUDGET_TOKENS} AND cum - btoks < {_BUDGET_TOKENS}
),
selthr AS (
  SELECT doc_id, score, n_tokens FROM (
    SELECT d.doc_id, d.score, d.n_tokens, thr.remain,
           sum(d.n_tokens) OVER (PARTITION BY d.bkt
             ORDER BY d.score DESC, d.doc_id
             ROWS UNBOUNDED PRECEDING) AS c
    FROM d JOIN thr USING (bkt)
  ) WHERE c <= remain
)
SELECT d.doc_id, d.score, d.n_tokens FROM d JOIN fullb USING (bkt)
UNION ALL
SELECT * FROM selthr
"""


def streaming_dedup_wm_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native bounded-state dedup over the event stream. The testdata
    ships one parquet file per table, so availableNow runs a single
    micro-batch and the emitted key set is exactly DISTINCT(keys) —
    the differential form of the operator (value columns of 'first
    row per key' are partition-order-dependent and excluded)."""
    import os as _os
    import uuid as _uuid

    from ora_ch_spark.streaming.watermark import streaming_dedup_within_watermark

    return streaming_dedup_within_watermark(
        spark,
        _os.path.join(sf_dir, "events.parquet"),
        query_name=f"dwm_{_uuid.uuid4().hex[:8]}",
    )


STREAMING_DEDUP_WM_ORACLE = """
SELECT DISTINCT user_id, event_type FROM events
"""


def pipeline_assemble_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assembly composite: exact dedup → 5:2:2:1 mixture → packing
    manifest → per-(lang, shard) rollup."""
    from ora_ch_spark.operators.pipeline import assemble_corpus

    docs = load_table(spark, sf_dir, "documents")
    return assemble_corpus(docs, _MIX_WEIGHTS, budget=256, shards=4).orderBy(
        "lang", "shard"
    )


def _assemble_oracle() -> str:
    total_w = sum(_MIX_WEIGHTS.values())
    wrows = " UNION ALL ".join(
        f"SELECT '{g}' AS lang, {w} AS w" for g, w in sorted(_MIX_WEIGHTS.items())
    )
    return f"""
WITH win AS (
  SELECT md5(text) AS h, min(doc_id) AS doc_id FROM documents GROUP BY 1
),
kept AS (
  SELECT d.doc_id, d.lang, d.text FROM documents d JOIN win USING (doc_id)
),
wt AS ({wrows}),
cnt AS (
  SELECT wt.lang, w, count(k.doc_id) AS n
  FROM wt LEFT JOIN kept k USING (lang) GROUP BY 1, 2
),
feas AS (SELECT min(n * {total_w} // w) AS T FROM cnt),
tgt AS (SELECT lang, (T * w) // {total_w} AS t FROM cnt CROSS JOIN feas),
rk AS (
  SELECT k.doc_id, k.lang, k.text, t,
         row_number() OVER (
           PARTITION BY k.lang
           ORDER BY md5('mix:' || cast(k.doc_id as varchar)) ASC, k.doc_id ASC
         ) AS rn
  FROM kept k JOIN tgt USING (lang)
),
mixed AS (SELECT doc_id, lang, text FROM rk WHERE rn <= t),
d AS (
  SELECT doc_id, lang,
         ('0x' || substr(md5('pack:' || cast(doc_id as varchar)), 1, 8))::BIGINT % 4 AS shard,
         cast(len(string_split(lower(text), ' ')) as bigint) AS n_tokens
  FROM mixed
),
c AS (
  SELECT doc_id, lang, shard, n_tokens,
         sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM d
)
SELECT lang, shard, count(*) AS n_docs,
       cast(sum(n_tokens) as bigint) AS n_tokens,
       cast(sum(cast(floor((cum - 1) / 256.0) as bigint)
           - cast(floor((cum - n_tokens) / 256.0) as bigint) + 1) as bigint) AS seq_slots
FROM c GROUP BY 1, 2
ORDER BY lang, shard
"""


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


_MIX_WEIGHTS = {"en": 5, "de": 2, "fr": 2, "zh": 1}


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


def _components_oracle() -> str:
    minhash = _minhash_oracle()
    return f"""
WITH RECURSIVE edges AS (
  SELECT id_a, id_b FROM ({minhash})
),
und AS (
  SELECT id_a AS a, id_b AS b FROM edges
  UNION
  SELECT id_b AS a, id_a AS b FROM edges
),
reach(a, b) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM und)
  UNION
  SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a
)
SELECT a AS doc_id, min(b) AS component FROM reach GROUP BY a
"""


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
_HLL_KEY_SQL = (
    "cast(user_id as varchar) || ':' || cast(cast(ts as date) as varchar)"
)


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


CHUNK_CHARS, CHUNK_OVERLAP = 300, 60


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


# Ordering note: the driver's correctness gate checks the first 50
# entries of catalog.all_queries(). Since round 5 the order is
# COMPUTED from the committed CORRECTNESS_r*.json history (see
# catalog._gate_history): never-proven entries sort first, then
# green entries stalest-proof-first — declaration order here only
# breaks ties, so new entries automatically enter the gate window on
# their first round. The full LOCAL parity suite
# (tests/test_parity.py) runs every entry, window or tail.
EXT_QUERIES: list[QueryDef] = [
    QueryDef("events_sessionize", events_sessionize_q, SESSIONIZE_ORACLE,
             "gap-based sessionization (lag → flag → cumsum → rollup)"),
    QueryDef("asof_join", asof_join_q, _asof_oracle(),
             "as-of join (composed) vs DuckDB native ASOF JOIN"),
    QueryDef("asof_join_tolerance", asof_join_tolerance_q, _asof_tolerance_oracle(),
             "as-of join with match tolerance (too-distant matches NULL out)"),
    QueryDef("asof_join_forward", asof_join_forward_q, ASOF_FORWARD_ORACLE,
             "forward as-of (next right at-or-after) vs DuckDB native ASOF <="),
    QueryDef("asof_join_nearest", asof_join_nearest_q, ASOF_NEAREST_ORACLE,
             "nearest as-of, ties backward (merge_asof rule) vs composed native ASOFs"),
    QueryDef("calc_dialect_battery5", calc_dialect5_q, DIALECT5_ORACLE,
             "ARRAY JOIN clause forms (zip/shadow/LEFT/inner) vs DuckDB unnest replay"),
    QueryDef("calc_dialect_battery6", calc_dialect6_q, DIALECT6_ORACLE,
             "batch-6 function surface (array rotate/compact, IP, tuple, dateName, JSONLength)"),
    QueryDef("calc_dialect_battery7", calc_dialect7_q, DIALECT7_ORACLE,
             "windowFunnel DP fold vs EXISTS-chain oracle, retention via ARRAY JOIN, URL family"),
    QueryDef("calc_dialect_battery8", calc_dialect8_q, DIALECT8_ORACLE,
             "QUALIFY hidden-column wrap + CH scalar WITH inlining vs DuckDB native QUALIFY"),
    QueryDef("calc_dialect_battery9", calc_dialect9_q, DIALECT9_ORACLE,
             "batch-8 surface: CH-arg-order position, toRelative*Num, dateTrunc, regex extract, ngrams, 2-arg CAST"),
    QueryDef("calc_dialect_battery10", calc_dialect10_q, DIALECT10_ORACLE,
             "sequenceMatch/Count funnel patterns + maxIntersections/intervalLengthSum/deltaSumTimestamp/entropy folds"),
    QueryDef("calc_dialect_battery11", calc_dialect11_q, DIALECT11_ORACLE,
             "bitmap algebra, sumMap tuple, formatReadable*, extractGroups, snowflake round-trip"),
    QueryDef("calc_dialect_battery12", calc_dialect12_q, DIALECT12_ORACLE,
             "arrayFold/Product/Jaccard, exact topKWeighted, pointInPolygon ray-cast, string Jaccard/Hamming, netloc, parseReadableSize"),
    QueryDef("calc_dialect_battery13", calc_dialect13_q, DIALECT13_ORACLE,
             "clause pass-through proof: WITH ROLLUP subtotals, INTERSECT, UNION DISTINCT survive translation untouched"),
    QueryDef("calc_funnel_strict", calc_funnel_strict_q, FUNNEL_STRICT_ORACLE,
             "windowFunnel strict_order/strict_dedup CH-exact fold vs DuckDB recursive-CTE replay"),
    QueryDef("calc_seq_time", calc_seq_time_q, SEQ_TIME_ORACLE,
             "sequenceMatch/Count (?t op v) time constraints: DP fold vs EXISTS + greedy recursive replay"),
    QueryDef("calc_with_fill_2", calc_with_fill2_q, WITH_FILL2_ORACLE,
             "multi-key WITH FILL + INTERPOLATE cascade + GLOBAL NOT IN through one translated statement"),
    QueryDef("calc_dialect_geo", calc_dialect_geo_q, DIALECT_GEO_ORACLE,
             "geohashEncode closed-form bit expansion (engine-identical doubles)"),
    QueryDef("calc_dict_lookup", calc_dict_lookup_q, DICT_LOOKUP_ORACLE,
             "dictGet/dictHas SQL forms via the dictionary registry (miss path gated)"),
    QueryDef("calc_asof_sql", calc_asof_sql_q, ASOF_SQL_ORACLE,
             "ASOF LEFT JOIN clause syntax vs DuckDB native ASOF JOIN"),
    QueryDef("streaming_window_agg", streaming_window_q, STREAMING_WINDOW_ORACLE,
             "watermarked tumbling-window rollup (Structured Streaming)"),
    QueryDef("pipeline_clean_corpus", pipeline_clean_corpus_q, _pipeline_oracle(),
             "composite corpus-cleaning pipeline: lang-id → quality → exact dedup → minhash near-dedup → stats"),
    QueryDef("line_dedup", line_dedup_q, LINE_DEDUP_ORACLE,
             "C4 corpus-wide exact line dedup, keep-first (md5-verified reassembly)"),
    QueryDef("boilerplate_strip", boilerplate_strip_q, BOILERPLATE_ORACLE,
             "boilerplate-line removal (lines shared by >=5 docs dropped everywhere)"),
    QueryDef("bm25_search", bm25_search_q, _bm25_oracle(),
             "BM25 top-10 keyword search (rational idf, broadcast query set)"),
    QueryDef("kmeans_embeddings", kmeans_embeddings_q, KMEANS_ORACLE,
             "k-means (2 Lloyd iterations) over quantized embeddings, broadcast centroids"),
    QueryDef("semdedup", semdedup_q, SEMDEDUP_ORACLE,
             "SemDeDup: kmeans-blocked within-cluster cosine dedup (lowest-id witness)"),
    QueryDef("scd2_merge", scd2_merge_q, SCD2_ORACLE,
             "SCD type-2 dimension merge: close-out + insert + null-safe no-op passthrough"),
    QueryDef("zorder_pruned_scan", zorder_pruned_scan_q, ZORDER_PRUNED_ORACLE,
             "Z-order clustering + zone-map pruned 2-D range scan (result-identical)"),
    QueryDef("incremental_agg_view", incremental_agg_view_q, INCREMENTAL_AGG_ORACLE,
             "manifest-delta incremental view maintenance ≡ full recompute"),
    QueryDef("resample_gapfill", resample_gapfill_q, RESAMPLE_GAPFILL_ORACLE,
             "hourly resample + gap materialization + forward fill (per-entity spine)"),
    QueryDef("temperature_mixture", temperature_mixture_q, TEMPERATURE_MIXTURE_ORACLE,
             "T=2 temperature-scaled language rebalancing (sqrt-proportional shares)"),
    QueryDef("mixture_sample", mixture_sample_q, _mixture_oracle(),
             "domain-mixture resampling to integer weights (exact feasible-max sizing)"),
    QueryDef("weighted_sample", weighted_sample_q, WEIGHTED_SAMPLE_ORACLE,
             "weighted sampling w/o replacement (max-of-w-replica-hash reservoir keys)"),
    QueryDef("quality_quantile_filter", quality_quantile_filter_q, _quality_quantile_oracle(),
             "per-lang discrete-median quality cut (threshold + kept counts)"),
    QueryDef("tfidf_top_terms", tfidf_top_terms_q, TFIDF_TERMS_ORACLE,
             "top-5 characteristic terms per source by rational tf-idf"),
    QueryDef("bigram_lm_score", bigram_lm_q, BIGRAM_LM_ORACLE,
             "corpus-trained bigram LM fluency score (log-free, decimal-mean)"),
    QueryDef("diversity_sample", diversity_sample_q, DIVERSITY_SAMPLE_ORACLE,
             "cluster-balanced diversity sampling (kmeans + md5-rank reservoir)"),
    QueryDef("interval_join_rollup", interval_join_q, INTERVAL_JOIN_ORACLE,
             "binned point-in-interval join + rollup vs DuckDB native range join"),
    QueryDef("profile_events", profile_events_q, _profile_oracle(),
             "single-pass ANALYZE-style column profiling (counts/distincts/min/max)"),
    QueryDef("pipeline_curate_corpus", pipeline_curate_q, _curate_oracle(),
             "round-4 curation composite: boilerplate strip -> clean-text quality median cut -> exact dedup funnel"),
    QueryDef("sim_topk_ivf_kmeans", sim_topk_ivf_kmeans_q, SIM_IVF_KMEANS_ORACLE,
             "IVF top-5 with kmeans-trained coarse quantizer (full training replay)"),
    QueryDef("dedup_substring", dedup_substring_q, DEDUP_SUBSTRING_ORACLE,
             "exact shared-substring detection (sliding-window fingerprints)"),
    QueryDef("text_repetition", text_repetition_q, TEXT_REPETITION_ORACLE,
             "Gopher-style repetition filters (top token/bigram share, distinct frac)"),
    QueryDef("decontaminate", decontaminate_q, DECONTAMINATE_ORACLE,
             "benchmark decontamination: shared word-4-gram flagging vs broadcast eval set"),
    QueryDef("pack_sequences", pack_sequences_q, PACK_SEQUENCES_ORACLE,
             "concat-and-chunk sequence-packing manifest (shard, offset, seq span)"),
    QueryDef("pipeline_assemble_corpus", pipeline_assemble_q, _assemble_oracle(),
             "assembly composite: exact dedup -> mixture -> packing manifest rollup"),
    QueryDef("hll_sliding_window", hll_sliding_window_q, _hll_sliding_oracle(),
             "trailing 3-day HLL distinct counts (per-day registers merged per window, no re-scan)"),
    QueryDef("hll_distinct_rollup", hll_distinct_rollup_q, _hll_rollup_oracle(),
             "mergeable md5-HLL distinct user-days per type + register-merged global"),
    QueryDef("hist_quantile_sketch", hist_quantile_sketch_q, _hist_quantile_oracle(),
             "mergeable fixed-width histogram p50/p90/p99 + count-sum-merged global"),
    QueryDef("cms_heavy_hitters", cms_heavy_hitters_q, _cms_oracle(),
             "count-min-sketch top-20 frequency estimates (4x256, counter-sum merge)"),
    QueryDef("funnel_conversion", funnel_conversion_q, _funnel_oracle(),
             "CH windowFunnel-style view->click->purchase depth (first-anchor, 72h)"),
    QueryDef("retention_cohort", retention_cohort_q, _retention_oracle(),
             "CH retention()-style weekly cohort flags (one-pass conditional aggs)"),
    QueryDef("chunk_documents", chunk_documents_q, _chunk_oracle(),
             "sliding-window document chunking with overlap (sequence->explode->substr)"),
    QueryDef("bloom_prune_join", bloom_prune_join_q, _bloom_oracle(),
             "Bloom semi-join pre-filter: k broadcast position probes before exact join"),
    QueryDef("streaming_dedup_within_wm", streaming_dedup_wm_q, STREAMING_DEDUP_WM_ORACLE,
             "native bounded-state streaming dedup (dropDuplicatesWithinWatermark)"),
    QueryDef("token_budget_select", token_budget_select_q, TOKEN_BUDGET_ORACLE,
             "greedy token-budget corpus sizing (bucketed two-phase, no global sort)"),
    QueryDef("streaming_stream_join", streaming_stream_join_q, STREAMING_STREAM_JOIN_ORACLE,
             "watermarked stream-stream interval join (stateful join, bounded state)"),
    QueryDef("sim_topk_pq", sim_topk_pq_q, _pq_oracle(),
             "product-quantization top-5 by ADC (4x16 codebooks, full training replay)"),
    QueryDef("graph_pagerank", graph_pagerank_q, _pagerank_oracle(),
             "integer-exact 3-iteration PageRank on the customer->supplier graph (top-100)"),
    QueryDef("pipeline_rag_topk", pipeline_rag_topk_q, _rag_oracle(),
             "RAG composite: chunk -> hash-embed -> IVF route -> exact top-k, full pipeline replay"),
    QueryDef("sim_maxsim_ivf", sim_maxsim_ivf_q, SIM_MAXSIM_IVF_ORACLE,
             "IVF-routed MaxSim group retrieval from the persisted index (probed lists only)"),
    QueryDef("sim_maxsim_auto", sim_maxsim_auto_q, SIM_MAXSIM_IVF_ORACLE,
             "size-adaptive MaxSim dispatch (manifest-driven) pinned to the routed branch"),
    QueryDef("sim_topk_ivfadc", sim_topk_ivfadc_q, _ivfadc_oracle(),
             "IVFADC: coarse-routed compressed search (PQ codes scored in probed lists only)"),
    QueryDef("sim_topk_sq8", sim_topk_sq8_q, SIM_SQ8_ORACLE,
             "SQ8 scalar-quantized top-5 (per-dim 8-bit codes, asymmetric integer L2)"),
    QueryDef("streaming_cms_agg", streaming_cms_agg_q, _streaming_cms_oracle(),
             "streaming CMS counter maintenance (complete-mode sum, state = 1024 cells)"),
    QueryDef("dedup_editdistance", dedup_editdistance_q, DEDUP_EDITDISTANCE_ORACLE,
             "edit-distance<=1 near-dup pairs (deletion-neighborhood blocking, complete for d=1)"),
    QueryDef("summap_rollup", summap_rollup_q, SUMMAP_ORACLE,
             "CH sumMap family: keyed merge of parallel arrays per group (one (group,key) shuffle)"),
    QueryDef("store_snapshot_diff", store_snapshot_diff_q, SNAPSHOT_DIFF_ORACLE,
             "snapshot changelog (Iceberg incremental-read analogue: file-delta only)"),
    QueryDef("contrastive_pairs", contrastive_pairs_q, _contrastive_oracle(),
             "contrastive pair mining: LSH positives + deterministic md5-draw negatives"),
    QueryDef("streaming_upsert", streaming_upsert_q, STREAMING_UPSERT_ORACLE,
             "streaming CDC upsert into the store (foreachBatch merge, epoch-guarded exactly-once)"),
    QueryDef("dedup_canonicalize", dedup_canonicalize_q, _canonicalize_oracle(),
             "end-to-end dedup workflow: LSH pairs -> clusters -> quality-aware canonical pick"),
    QueryDef("sim_topk_ivf_sq8", sim_topk_ivf_sq8_q, _ivf_sq8_oracle(),
             "IVF x SQ8: coarse-routed scalar-quantized search (probed lists only)"),
    QueryDef("key_skew_report", key_skew_report_q, KEY_SKEW_ORACLE,
             "shuffle-skew diagnosis: heaviest keys, share, skew ratio vs mean key weight"),
    QueryDef("spearman_corr", spearman_corr_q, SPEARMAN_ORACLE,
             "CH rankCorr: exact fractional-rank Spearman (decimal-moment determinism)"),
    QueryDef("auc_exact", auc_exact_q, AUC_ORACLE,
             "exact ROC AUC (Mann-Whitney ranks, half tie credit) as a deterministic eval metric"),
    QueryDef("retrieval_eval", retrieval_eval_q, _retrieval_eval_oracle(),
             "gated index-quality metrics: SQ8 vs exact-L2 recall/precision/MRR@5"),
    # --- tail: hash-proven in rounds 1-3, behavior unchanged since
    # (dedup_components' r4 localCheckpoint is value-preserving and
    # pinned by the chain-collapse unit test; pipeline_ingest_batch's
    # screened components dedup_incremental + text_quality are gated /
    # proven individually; dedup_minhash_lsh / dedup_ngram_jaccard's
    # r4 length filter is candidate-pruning-only — results pinned by
    # the naive-vs-production differential tests and the local parity
    # suite); outside the 50-row gate ---
    QueryDef("dedup_minhash_lsh", dedup_minhash_q, _minhash_oracle(),
             "MinHash(16)→LSH(4 bands)→exact-Jaccard near-dedup pairs"),
    QueryDef("dedup_ngram_jaccard", dedup_ngram_q, DEDUP_NGRAM_ORACLE,
             "char-4-gram Jaccard near-dedup with (lang,source) blocking"),
    QueryDef("dedup_incremental", dedup_incremental_q, _incremental_oracle(),
             "batch-vs-corpus incremental dedup (exact digest + banded MinHash probe)"),
    QueryDef("pipeline_ingest_batch", pipeline_ingest_batch_q, _ingest_batch_oracle(),
             "continuous-crawl composite: screen batch, dedup vs corpus, per-source stats"),
    QueryDef("dedup_components", dedup_components_q, _components_oracle(),
             "near-dup clusters: iterative min-label propagation vs recursive-CTE oracle"),
    QueryDef("grouped_zscore", grouped_zscore_q, GROUPED_ZSCORE_ORACLE,
             "pure-JVM grouped z-score: exact-decimal moments agg + broadcast join"),
    QueryDef("sim_topk_ivf_index", sim_topk_ivf_index_q, SIM_IVF_ORACLE,
             "IVF top-5 answered from a PERSISTED store index (partition-pruned lists)"),
    QueryDef("streaming_hll_agg", streaming_hll_agg_q, _streaming_hll_oracle(),
             "streaming HLL register maintenance == batch sketch (complete-mode max agg)"),
    QueryDef("text_flagged_terms", text_flagged_terms_q, _flagged_terms_oracle(),
             "lexicon safety screen: flagged-term share + threshold flag (no UDF/join)"),
    QueryDef("events_anomaly", events_anomaly_q, EVENTS_ANOMALY_ORACLE,
             "hourly-count anomaly flags: per-type z-score, exact integer moments"),
    QueryDef("split_assign", split_assign_q, SPLIT_ASSIGN_ORACLE,
             "deterministic train/val/test assignment (md5 bucket, growth-stable)"),
    QueryDef("sim_maxsim_groups", sim_maxsim_groups_q, SIM_MAXSIM_ORACLE,
             "ColBERT-style MaxSim group retrieval (partial-agg max before the rank window)"),
    QueryDef("chunk_overlap", chunk_overlap_q, _chunk_overlap_oracle(),
             "chunk-granularity inter-doc duplication fraction (chunk + hash + share)"),
    QueryDef("dedup_keep_best", dedup_keep_best_q, _keep_best_oracle(),
             "quality-aware exact dedup: keep the BEST duplicate (max-struct, no window)"),
    QueryDef("corr_matrix", corr_matrix_q, _corr_oracle(),
             "one-pass pairwise Pearson matrix (exact decimal(18,4) moments, k^2 accumulators)"),
    QueryDef("dedup_embedding_cosine", dedup_embedding_q, _embedding_neardup_oracle(),
             "LSH-blocked embedding near-dup pairs by quantized cosine"),
    QueryDef("sim_topk_lsh", sim_topk_lsh_q, _lsh_topk_oracle(),
             "LSH-bucketed approximate cosine top-5"),
    QueryDef("sim_topk_ivf", sim_topk_ivf_q, SIM_IVF_ORACLE,
             "IVF inverted-list approximate top-5 (2-probe)"),
    QueryDef("text_quality", text_quality_q, _quality_oracle(),
             "quality features + composite score + bucket"),
    QueryDef("text_pii_scrub", text_pii_scrub_q, _pii_scrub_oracle(),
             "email/IP/phone redaction + per-category counts (md5-verified scrub)"),
    QueryDef("text_fingerprint", text_fingerprint_q, FINGERPRINT_ORACLE,
             "sorted-token-set md5 fingerprint + share counts"),
    QueryDef("sample_fixed_per_group", sample_fixed_q, SAMPLE_FIXED_ORACLE,
             "exactly-20-per-lang deterministic reservoir (md5-rank)"),
    QueryDef("multimodal_frames", multimodal_frames_q, MULTIMODAL_FRAMES_ORACLE,
             "frame-sampling stage (1:N mapInPandas) with md5-verified chunks"),
    QueryDef("sim_lsh_bucket", sim_lsh_bucket_q, _lsh_bucket_oracle(),
             "sign-random-projection bucket assignment"),
    QueryDef("sim_topk_lsh_multiprobe", sim_topk_lsh_multiprobe_q, _lsh_multiprobe_oracle(),
             "multi-probe LSH top-5 (least-confident-bit flip, 2 probes)"),
    QueryDef("grouped_zscore_pandas", grouped_zscore_pandas_q, GROUPED_ZSCORE_ORACLE,
             "applyInPandas grouped-map exemplar of the same z-score (bitwise-equal)"),
    QueryDef("dedup_simhash", dedup_simhash_q, DEDUP_SIMHASH_ORACLE,
             "32-bit SimHash signatures over tokens"),
    QueryDef("sample_stratified", sample_stratified_q, _sample_stratified_oracle(),
             "deterministic hash-bucket stratified sampling per lang"),
    QueryDef("skew_salted_join", skew_salted_join_q, SKEW_SALTED_ORACLE,
             "hot-key salted join (salt/replicate/unsalt ≡ plain join)"),
    QueryDef("dedup_exact", dedup_exact_q, DEDUP_EXACT_ORACLE,
             "exact dedup groups by content digest"),
    QueryDef("sim_topk_bruteforce", sim_topk_bruteforce_q, SIM_TOPK_ORACLE,
             "exact cosine top-5 for 10 query vectors"),
    QueryDef("text_lang_id", text_lang_id_q, _lang_id_oracle(),
             "stopword-lexicon language identification"),
    QueryDef("text_token_stats", text_token_stats_q, TOKEN_STATS_ORACLE,
             "whitespace + BPE-ish subword token counting"),
    QueryDef("session_window_agg", session_window_q, SESSION_WINDOW_ORACLE,
             "native session_window aggregation (semantics-pinned oracle)"),
    QueryDef("streaming_stateful_dedup", streaming_dedup_q, STREAMING_DEDUP_ORACLE,
             "applyInPandasWithState cross-batch dedup (doubled input collapses)"),
    QueryDef("quality_topk_per_group", quality_topk_q, _quality_topk_oracle(),
             "top-10 docs per lang by quality score (window select)"),
    QueryDef("multimodal_features", multimodal_q, MULTIMODAL_ORACLE,
             "binary media column → mapInPandas feature extraction"),
]
