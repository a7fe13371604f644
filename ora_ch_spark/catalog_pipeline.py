"""LLM-data-pipeline catalog entries, part 1: dedup family,
similarity search (LSH/IVF/PQ), text analysis, multimodal
plumbing, as-of joins, streaming aggregates. Split out of
catalog_ext.py in round 8 (mechanical move; entry list and
declaration order unchanged in ``catalog_ext.EXT_QUERIES``)."""

from __future__ import annotations

import uuid
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
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
    # n_probes pinned to 2 (the single least-confident bit flip) —
    # this entry gates the perturbation-cost RANKING itself; the
    # elbow-default probe count is gated by lsh_multiprobe_wide
    emb = load_table(spark, sf_dir, "embeddings")
    return S.cosine_topk_lsh_multiprobe(
        emb,
        query_ids=emb.filter("vec_id < 10"),
        n_planes=_N_PLANES,
        dims=_DIMS,
        n_probes=2,
    )


def _lsh_multiprobe_oracle(n_probes: int = 2) -> str:
    """Mask-enumeration replay of the generalized multi-probe
    ranking: every flip mask over the _N_PLANES hyperplanes is
    costed (sum of |⟨w_p, qe⟩| over its flipped planes — exact
    bigint), ranked (cost asc, mask asc), and the ``n_probes``
    cheapest buckets are probed. Mask 0 costs 0 → own bucket first;
    n_probes=2 degenerates to the single least-confident bit flip."""
    signs = lsh_plane_signs(_N_PLANES, _DIMS)
    dots = ",\n       ".join(
        f"({_plane_dot_sql(p, signs)}) AS d{p}" for p in range(_N_PLANES)
    )
    cost = " + ".join(
        f"(CASE WHEN (mask & {1 << p}) > 0 THEN abs(d{p}) ELSE 0 END)"
        for p in range(_N_PLANES)
    )
    # enumerate exactly the masks the Spark side considers — for wide
    # hashes (>6 planes) _probe_masks caps at popcount ≤ 3, and a
    # full range() here would silently diverge from it (ADVICE r12)
    mask_list = ", ".join(str(m) for m in S._probe_masks(_N_PLANES))
    return f"""
WITH q AS (SELECT vec_id, {_QE} AS qe FROM embeddings),
d AS (
  SELECT vec_id, qe,
       {dots},
       ({_bucket_sql(signs)}) AS bucket
  FROM q
),
masks AS (SELECT unnest([{mask_list}]) AS mask),
qc AS (
  SELECT vec_id AS q_id, xor(bucket, mask) AS pbucket,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY ({cost}), mask) AS rn
  FROM d CROSS JOIN masks WHERE vec_id < 10
),
probes AS (SELECT q_id, pbucket FROM qc WHERE rn <= {n_probes}),
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
    # the recall ladder's bottom rung (single own-bucket probe),
    # expressed through the one surviving entry point (r13): the
    # dedicated single-bucket implementation is gone —
    # ``n_probes=1`` reproduces its candidate set bit-for-bit
    emb = load_table(spark, sf_dir, "embeddings")
    return S.cosine_topk_lsh_multiprobe(
        emb,
        query_ids=emb.filter("vec_id < 10"),
        n_planes=_N_PLANES,
        dims=_DIMS,
        n_probes=1,
    )


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



# chunking geometry shared by the chunk/overlap entries here and the
# corpus-side RAG entries (catalog_corpus.py imports these)
CHUNK_CHARS, CHUNK_OVERLAP = 300, 60

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


def sim_topk_ivfadc_index_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persisted-index form of sim_topk_ivfadc (r12): build the
    IVFADC index into a TableStore (coarse quantizer + PQ codebooks +
    list-partitioned code table), then answer the SAME query batch
    from the index — hash-gated against the SAME full
    training/encode/ADC replay oracle, proving the train-once index
    round-trip changes nothing."""
    from ora_ch_spark.catalog import _tmp_store
    from ora_ch_spark.operators.pq import (
        build_ivfadc_index,
        ivfadc_topk_from_index,
    )

    store = _tmp_store(spark)
    store.create_database("ch")
    emb = load_table(spark, sf_dir, "embeddings")
    build_ivfadc_index(store, "ch", emb)
    return ivfadc_topk_from_index(
        store, "ch", emb.filter("vec_id < 10")
    ).orderBy("q_id", "rank")


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


_MIX_WEIGHTS = {"en": 5, "de": 2, "fr": 2, "zh": 1}


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


_HLL_KEY_SQL = (
    "cast(user_id as varchar) || ':' || cast(cast(ts as date) as varchar)"
)



# ---------------------------------------------------------------------------
# ANN recall report (round 11, verdict item 7) — recall@5 of every
# ANN variant vs the exact brute-force top-5, emitted as CATALOG DATA
# so a recall regression hash-mismatches the gate exactly like a
# correctness bug. Both sides compute hits = |ANN top-5 ∩ exact
# top-5| over the 10 query rows: Spark runs the real operators, the
# oracle composes the existing DuckDB replays of the SAME algorithms
# (each one already independently hash-gated), so the recall numbers
# are derived twice from independent engines — not pinned constants.
# recall = hits/total is an exact small rational → identical doubles.
# ---------------------------------------------------------------------------

# Recall is ESTIMATED on a deterministic corpus prefix: the gate's
# exact baseline is O(|Q|·N) by construction (that quadratic is the
# whole reason ANN indexes exist), so a recall gate must bound N or
# its cost grows with the corpus while its statistical value does
# not — the 100-TB shape is always a sampled recall audit. 2000 ≥
# every sf the correctness gate runs at (sf0.01 has 500 vectors), so
# gate hashes are unchanged; at bench scale the entry is O(1) in sf.
_RECALL_CORPUS_CAP = 2000


def _cap_embeddings(sql: str) -> str:
    """Apply the recall-corpus prefix cap inside a composed DuckDB
    replay (every embeddings reference in the recall oracles)."""
    return sql.replace(
        "FROM embeddings",
        f"FROM (SELECT * FROM embeddings WHERE vec_id < "
        f"{_RECALL_CORPUS_CAP}) embeddings",
    )


# the drift entry gates the drift MATH, not index scale (the index
# lifecycle is gated by sim_topk_ivfadc_index); its own corpus cap
# equals the sf0.01 vector count so gate hashes are unchanged while
# the sf0.1 bench cost stays O(1) in sf
_DRIFT_CORPUS_CAP = 500


def sim_index_drift_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Codebook drift as GATED DATA (r13): build the persisted IVFADC
    index on a train split (vec_id % 5 != 4 of the capped corpus),
    then measure the frozen-codebook mean quantization error of an
    in-distribution held-out batch and of a 64x scale-shifted batch.
    x*64 is EXACT in float (exponent shift), so the oracle replays
    the shifted quantization bit-for-bit; the oracle re-runs the full
    two-step Lloyd on the train split plus all three encodes, making
    the drift baseline AND direction regression-gated values, not
    just pytest thresholds."""
    from ora_ch_spark.catalog import _tmp_store
    from ora_ch_spark.operators.pq import (
        build_ivfadc_index,
        index_drift_report,
    )

    store = _tmp_store(spark)
    store.create_database("ch")
    emb = load_table(spark, sf_dir, "embeddings").filter(
        f"vec_id < {_DRIFT_CORPUS_CAP}"
    )
    train = emb.filter("vec_id % 5 != 4")
    held = emb.filter("vec_id % 5 = 4")
    shifted = held.withColumn(
        "embedding", F.expr("transform(embedding, x -> cast(x * 64 as float))")
    )
    # n_lists=4: the PQ quantization error this entry gates is
    # independent of the coarse list count (the oracle doesn't model
    # the coarse quantizer at all); a 4-dir hive write keeps the
    # index-build overhead off the drift measurement — the full
    # 16-list lifecycle is gated by sim_topk_ivfadc_index
    build_ivfadc_index(store, "ch", train, n_lists=4)
    rows = []
    for split, batch in (("held_out", held), ("shifted", shifted)):
        r = index_drift_report(store, "ch", batch)
        rows.append(
            (split, float(r["train_mqe"]), float(r["batch_mqe"]),
             bool(r["retrain"]))
        )
    from ora_ch_spark.io import local_df

    return local_df(
        spark, rows,
        "split string, train_mqe double, batch_mqe double, retrain boolean",
    ).orderBy("split")


def _index_drift_oracle(m: int = 4, k: int = 16, sub: int = 16) -> str:
    """Full replay of sim_index_drift: per-subspace two-step Lloyd on
    the TRAIN split (same init/update as _pq_oracle), then min-dist
    encodes of train / held-out / 64x-shifted batches against the
    final codebooks; mqe = sum of per-(vector, subspace) min dists /
    n_vectors, drift flag at the documented 1.5x threshold."""
    cap = _DRIFT_CORPUS_CAP
    blocks = []
    mins = {"t": [], "h": [], "x": []}
    for s in range(m):
        lo = s * sub
        blocks.append(f"""
tsub{s} AS (SELECT vec_id, v, i - {lo} AS j FROM te WHERE i > {lo} AND i <= {lo + sub}),
c0_{s} AS (
  SELECT cast(row_number() OVER (ORDER BY vec_id) - 1 as int) AS code, vec_id
  FROM (SELECT vec_id FROM tq ORDER BY vec_id LIMIT {k})
),
ce0_{s} AS (SELECT c0_{s}.code, s.j, s.v FROM c0_{s} JOIN tsub{s} s USING (vec_id)),
d1_{s} AS (
  SELECT s.vec_id, ce.code, sum((s.v - ce.v) * (s.v - ce.v)) AS dist
  FROM tsub{s} s JOIN ce0_{s} ce ON s.j = ce.j GROUP BY 1, 2
),
a1_{s} AS (
  SELECT vec_id, code FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, code) AS rn
    FROM d1_{s}) WHERE rn = 1
),
ce1_{s} AS (
  SELECT a1.code, s.j,
         cast(floor(cast(sum(s.v) as double) / count(*)) as bigint) AS v
  FROM a1_{s} a1 JOIN tsub{s} s USING (vec_id) GROUP BY 1, 2
),
tmin{s} AS (
  SELECT s.vec_id, min(d) AS md FROM (
    SELECT s.vec_id, ce.code, sum((s.v - ce.v) * (s.v - ce.v)) AS d
    FROM tsub{s} s JOIN ce1_{s} ce ON s.j = ce.j GROUP BY 1, 2
  ) s GROUP BY 1
),
hsub{s} AS (SELECT vec_id, v, i - {lo} AS j FROM he WHERE i > {lo} AND i <= {lo + sub}),
hmin{s} AS (
  SELECT s.vec_id, min(d) AS md FROM (
    SELECT s.vec_id, ce.code, sum((s.v - ce.v) * (s.v - ce.v)) AS d
    FROM hsub{s} s JOIN ce1_{s} ce ON s.j = ce.j GROUP BY 1, 2
  ) s GROUP BY 1
),
xsub{s} AS (SELECT vec_id, v, i - {lo} AS j FROM xe WHERE i > {lo} AND i <= {lo + sub}),
xmin{s} AS (
  SELECT s.vec_id, min(d) AS md FROM (
    SELECT s.vec_id, ce.code, sum((s.v - ce.v) * (s.v - ce.v)) AS d
    FROM xsub{s} s JOIN ce1_{s} ce ON s.j = ce.j GROUP BY 1, 2
  ) s GROUP BY 1
)""")
        for b in ("t", "h", "x"):
            mins[b].append(f"SELECT vec_id, md FROM {b}min{s}")
    unions = {b: "\n    UNION ALL\n    ".join(v) for b, v in mins.items()}
    return f"""
WITH tq AS (SELECT vec_id, {_QE} AS qe FROM embeddings
            WHERE vec_id < {cap} AND vec_id % 5 != 4),
te AS (SELECT vec_id, unnest(qe) AS v, unnest(range(1, len(qe) + 1)) AS i FROM tq),
hq AS (SELECT vec_id, {_QE} AS qe FROM embeddings
       WHERE vec_id < {cap} AND vec_id % 5 = 4),
he AS (SELECT vec_id, unnest(qe) AS v, unnest(range(1, len(qe) + 1)) AS i FROM hq),
xq AS (SELECT vec_id,
              list_transform(embedding::DOUBLE[],
                             x -> cast(floor(x * 64 * 10000) as bigint)) AS qe
       FROM embeddings WHERE vec_id < {cap} AND vec_id % 5 = 4),
xe AS (SELECT vec_id, unnest(qe) AS v, unnest(range(1, len(qe) + 1)) AS i FROM xq),
{",".join(blocks)},
tmqe AS (SELECT cast(sum(md) as double) / count(DISTINCT vec_id) AS mqe
         FROM ({unions["t"]})),
hmqe AS (SELECT cast(sum(md) as double) / count(DISTINCT vec_id) AS mqe
         FROM ({unions["h"]})),
xmqe AS (SELECT cast(sum(md) as double) / count(DISTINCT vec_id) AS mqe
         FROM ({unions["x"]}))
SELECT * FROM (
  SELECT 'held_out' AS split, t.mqe AS train_mqe, h.mqe AS batch_mqe,
         (h.mqe / t.mqe) > 1.5 AS retrain
  FROM tmqe t, hmqe h
  UNION ALL
  SELECT 'shifted', t.mqe, x.mqe, (x.mqe / t.mqe) > 1.5
  FROM tmqe t, xmqe x
) ORDER BY split
"""


def sim_ivf_lifecycle_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Append-vs-rebuild LIFECYCLE of the persisted IVF index as
    gated data (r14): the drift metric alone is gated by
    sim_index_drift; this entry gates the DECISION the guard makes
    with it and the geometry change a drift-triggered rebuild
    produces. A drift metric needs a trained distribution (random
    vectors are directionally symmetric), so the corpus is built the
    way the pytest lifecycle test builds it: 8 bank directions
    (vec_id < 8) plus deterministic per-(id, dim) angular noise.

    Phase 1: an in-distribution batch → guard APPENDS, frozen
    baseline rides. Phase 2: a batch of raw (random-direction)
    corpus vectors → routing error blows past 1.5× → guard REBUILDS
    with TRAINED centroids (kmeans k=n_lists, iters=3) over the full
    union — the r13 no-op-rebuild bug is exactly what the phase-3
    row pins: the retrained baseline/batch errors must match the
    oracle's full Lloyd replay, which a bit-identical re-seed of the
    stale centroids cannot."""
    from ora_ch_spark.catalog import _tmp_store
    from ora_ch_spark.operators.similarity import (
        build_ivf_index,
        ivf_index_drift_report,
        ivf_ingest_with_drift_guard,
    )

    store = _tmp_store(spark)
    store.create_database("ch")
    emb = load_table(spark, sf_dir, "embeddings")
    idt = dict(emb.dtypes)["vec_id"]
    bank = emb.filter("vec_id < 8").select(
        F.col("vec_id").cast("int").alias("c"), F.col("embedding").alias("ce")
    )

    def clustered(lo, hi, seed):
        # bounded-width range: these synthetic frames are 50-200 rows
        # by construction (not sf-scaled); the default range width
        # (defaultParallelism = 32 locally) would push every
        # downstream quantize/assign/collect job through 32 near-empty
        # tasks — measured per-job overhead dominates this entry
        ids = spark.range(lo, hi, 1, 8).select(
            F.col("id").cast(idt).alias("vec_id"),
            (F.col("id") % 8).cast("int").alias("c"),
        )
        return ids.join(F.broadcast(bank), "c").select(
            "vec_id",
            F.expr(
                f"transform(ce, (x, i) -> cast(x + "
                f"cast((vec_id * 31 + i * 7 + {seed}) % 11 - 5 as double) "
                f"* cast(0.02 as double) as float))"
            ).alias("embedding"),
        )

    train = clustered(0, 200, 1)
    held = clustered(1000, 1050, 2)
    # directional drift: raw random-direction corpus rows the
    # clustered centroid fan never points at; ids remapped clear of
    # the union
    drifted = emb.filter("vec_id >= 100 and vec_id < 150").select(
        (F.col("vec_id") + 5000).cast(idt).alias("vec_id"), "embedding"
    )

    build_ivf_index(store, "ch", train, n_lists=8)
    r1 = ivf_ingest_with_drift_guard(
        store, "ch", train.unionByName(held), held, n_lists=8
    )
    union = train.unionByName(held).unionByName(drifted)
    r2 = ivf_ingest_with_drift_guard(store, "ch", union, drifted, n_lists=8)
    post = ivf_index_drift_report(store, "ch", drifted)
    rows = [
        ("1_in_distribution", r1["action"],
         r1["train_route_err"], r1["batch_route_err"], r1["retrain"]),
        ("2_drifted", r2["action"],
         r2["train_route_err"], r2["batch_route_err"], r2["retrain"]),
        ("3_post_rebuild", "report",
         post["train_route_err"], post["batch_route_err"], post["retrain"]),
    ]
    from ora_ch_spark.io import local_df

    return (
        local_df(
            spark,
            rows,
            "phase string, action string, train_route_err double, "
            "batch_route_err double, retrain boolean",
        )
        .select(
            "phase",
            "action",
            F.round("train_route_err", 6).alias("train_route_err"),
            F.round("batch_route_err", 6).alias("batch_route_err"),
            "retrain",
        )
        .orderBy("phase")
    )


def _ivf_lifecycle_oracle(k: int = 8) -> str:
    """Full replay of sim_ivf_lifecycle: clustered-corpus
    construction (bank + angular noise, float-cast then the 1e4
    quantize grid), frozen first-k routing errors for the build /
    held-out / drifted batches, the 1.5× decisions, then the
    drift-triggered rebuild — two-update Lloyd (iters=3) over the
    union with lowest-id init, floor-mean updates, (dist, cluster)
    tie-break — and the retrained baseline + batch errors."""

    def err(batch: str, cents: str, prefix: str) -> str:
        # mean routing error (1 - best cosine) of exploded batch
        # (vec_id, i, qv) against exploded centroids (c_id, i, cv)
        return f"""
{prefix}_bn AS (SELECT vec_id, sum(qv * qv) AS nn FROM {batch} GROUP BY 1),
{prefix}_cn AS (SELECT c_id, sum(cv * cv) AS nn FROM {cents} GROUP BY 1),
{prefix}_dot AS (
  SELECT b.vec_id, c.c_id, sum(b.qv * c.cv) AS d
  FROM {batch} b JOIN {cents} c ON b.i = c.i GROUP BY 1, 2
),
{prefix}_best AS (
  SELECT d.vec_id,
         max(cast(d.d as double) /
             (sqrt(cast(bn.nn as double)) * sqrt(cast(cn.nn as double)))) AS best
  FROM {prefix}_dot d
  JOIN {prefix}_bn bn USING (vec_id) JOIN {prefix}_cn cn USING (c_id)
  GROUP BY 1
),
{prefix}_err AS (SELECT avg(1.0 - best) AS err FROM {prefix}_best)"""

    return f"""
WITH bank AS (
  SELECT vec_id AS c, unnest(embedding) AS bv,
         unnest(range(1, len(embedding) + 1)) AS i
  FROM embeddings WHERE vec_id < 8
),
clspec AS (
  SELECT * FROM (VALUES ('train', 0, 200, 1), ('held', 1000, 1050, 2))
  s(tag, lo, hi, seed)
),
clids AS (SELECT tag, unnest(range(lo, hi)) AS vec_id, seed FROM clspec),
cle AS (
  SELECT tag, ids.vec_id, b.i,
         cast(floor(cast(cast(
             b.bv + cast((ids.vec_id * 31 + (b.i - 1) * 7 + ids.seed) % 11 - 5
                         as double) * cast(0.02 as double)
         as float) as double) * 10000) as bigint) AS qv
  FROM clids ids JOIN bank b ON b.c = ids.vec_id % 8
),
dre AS (
  SELECT vec_id + 5000 AS vec_id, i, qv FROM (
    SELECT vec_id, unnest(range(1, len(embedding) + 1)) AS i,
           unnest(list_transform(embedding::DOUBLE[],
                                 x -> cast(floor(x * 10000) as bigint))) AS qv
    FROM embeddings WHERE vec_id >= 100 AND vec_id < 150)
),
tre AS (SELECT vec_id, i, qv FROM cle WHERE tag = 'train'),
hee AS (SELECT vec_id, i, qv FROM cle WHERE tag = 'held'),
uq AS (
  SELECT vec_id, i, qv FROM cle
  UNION ALL SELECT vec_id, i, qv FROM dre
),
cent0 AS (SELECT vec_id AS c_id, i, qv AS cv FROM tre WHERE vec_id < {k}),
{err("tre", "cent0", "t0")[1:]},
{err("hee", "cent0", "h0")[1:]},
{err("dre", "cent0", "d0")[1:]},
c0 AS (
  SELECT cast(row_number() OVER (ORDER BY vec_id) - 1 as int) AS cluster, vec_id
  FROM (SELECT DISTINCT vec_id FROM uq ORDER BY vec_id LIMIT {k})
),
kce0 AS (SELECT c0.cluster, u.i, u.qv AS cv FROM c0 JOIN uq u USING (vec_id)),
kd1 AS (
  SELECT u.vec_id, ce.cluster, sum((u.qv - ce.cv) * (u.qv - ce.cv)) AS dist
  FROM uq u JOIN kce0 ce ON u.i = ce.i GROUP BY 1, 2
),
ka1 AS (
  SELECT vec_id, cluster FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY dist, cluster) AS rn FROM kd1
  ) WHERE rn = 1
),
kce1 AS (
  SELECT a.cluster, u.i,
         cast(floor(cast(sum(u.qv) as double) / count(*)) as bigint) AS cv
  FROM ka1 a JOIN uq u USING (vec_id) GROUP BY 1, 2
),
kd2 AS (
  SELECT u.vec_id, ce.cluster, sum((u.qv - ce.cv) * (u.qv - ce.cv)) AS dist
  FROM uq u JOIN kce1 ce ON u.i = ce.i GROUP BY 1, 2
),
ka2 AS (
  SELECT vec_id, cluster FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY dist, cluster) AS rn FROM kd2
  ) WHERE rn = 1
),
cent2 AS (
  SELECT a.cluster AS c_id, u.i,
         cast(floor(cast(sum(u.qv) as double) / count(*)) as bigint) AS cv
  FROM ka2 a JOIN uq u USING (vec_id) GROUP BY 1, 2
),
{err("uq", "cent2", "u2")[1:]},
{err("dre", "cent2", "d2")[1:]}
SELECT * FROM (
  SELECT '1_in_distribution' AS phase, 'appended' AS action,
         round(t.err, 6) AS train_route_err, round(h.err, 6) AS batch_route_err,
         (h.err / t.err) > 1.5 AS retrain
  FROM t0_err t, h0_err h
  UNION ALL
  SELECT '2_drifted', 'rebuilt', round(t.err, 6), round(d.err, 6),
         (d.err / t.err) > 1.5
  FROM t0_err t, d0_err d
  UNION ALL
  SELECT '3_post_rebuild', 'report', round(u.err, 6), round(d.err, 6),
         (d.err / u.err) > 1.5
  FROM u2_err u, d2_err d
) ORDER BY phase
"""


def sim_recall_report_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from functools import reduce

    from ora_ch_spark.operators.pq import (
        ivfadc_topk,
        pq_topk,
        pq_train,
        sq8_topk,
    )

    # one parquet scan feeds all 7 pipelines (each method's eager
    # training/stats collects would otherwise re-scan per method);
    # the prefix cap keeps the exact-baseline quadratic bounded
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .filter(f"vec_id < {_RECALL_CORPUS_CAP}")
        .persist()
    )
    queries = emb.filter("vec_id < 10")
    # fill the cache ONCE before fanning out (concurrent first-touch
    # would compute the scan per thread until one wins the cache slot)
    emb.count()
    # the exact baseline is |Q|·k rows (50) BY CONSTRUCTION — collect
    # it once into a LocalRelation so the six per-method semi-joins
    # broadcast it driver-side instead of each launching a broadcast
    # build over the persisted frame, and `total` is its length (r15,
    # guide §5: the per-method probe cost is all that remains)
    from concurrent.futures import ThreadPoolExecutor

    from ora_ch_spark.io import local_df

    idt = dict(emb.dtypes)["vec_id"]
    # the per-method construction phases each run eager driver
    # actions (training collects, per-dim stats, seed/plane builds) —
    # all INDEPENDENT given the cached corpus, so overlap them from a
    # small thread pool (guide §2.6: FAIR scheduler is on; actions
    # are only sequential because the driver calls them sequentially).
    # pq and ivfadc share the identical training trajectory — run it
    # once and fan both out after it resolves.
    with ThreadPoolExecutor(max_workers=4) as pool:
        exact_rows_f = pool.submit(
            lambda: S.cosine_topk_bruteforce(emb, query_ids=queries)
            .select("q_id", "n_id")
            .collect()
        )
        trained_f = pool.submit(lambda: pq_train(emb, query_ids=queries))
        futs = {
            "ivf": pool.submit(lambda: S.ivf_topk(emb, query_ids=queries)),
            "lsh": pool.submit(
                lambda: S.cosine_topk_lsh_multiprobe(
                    emb, query_ids=queries, n_planes=_N_PLANES,
                    dims=_DIMS, n_probes=1,
                )
            ),
            "lsh_multiprobe": pool.submit(
                lambda: S.cosine_topk_lsh_multiprobe(
                    emb, query_ids=queries, n_planes=_N_PLANES,
                    dims=_DIMS, n_probes=2,
                )
            ),
            "sq8": pool.submit(lambda: sq8_topk(emb, query_ids=queries)),
        }
        trained = trained_f.result()
        futs["ivfadc"] = pool.submit(
            lambda: ivfadc_topk(emb, query_ids=queries, trained=trained)
        )
        futs["pq"] = pool.submit(
            lambda: pq_topk(emb, query_ids=queries, trained=trained)
        )
        exact_rows = exact_rows_f.result()
        methods = {name: f.result() for name, f in futs.items()}
    exact = local_df(spark, exact_rows, f"q_id {idt}, n_id {idt}")
    per_method = [
        df.select("q_id", "n_id")
        .join(exact, ["q_id", "n_id"], "left_semi")
        .agg(F.count(F.lit(1)).alias("hits"))
        .select(F.lit(name).alias("method"), F.col("hits").cast("bigint"))
        for name, df in sorted(methods.items())
    ]
    union = reduce(lambda a, b: a.unionByName(b), per_method)
    return (
        union.withColumn(
            "total", F.lit(len(exact_rows)).cast("bigint")
        )
        .select(
            "method",
            "hits",
            "total",
            (F.col("hits") / F.col("total")).cast("double").alias("recall_at_5"),
        )
        .orderBy("method")
    )


# ---------------------------------------------------------------------------
# Re-ranked ANN recall gate (round 12, verdict item 1) — the exact
# refine stage wired onto every compressed path that was
# quality-weak in r11 (pq 0.28 / ivfadc 0.36 / multiprobe 0.24):
# pq rerank=100 → 0.84, ivfadc rerank=50 → 0.92, multiprobe
# n_probes=11 → 0.86 at sf0.01. Same double-derivation contract as
# sim_recall_report: Spark runs the real reranked operators, the
# oracle composes the DuckDB shortlist replays with an exact-cosine
# refine over ONLY the shortlist pairs. tests/test_similarity.py
# additionally pins the ≥0.8 floor so a silent recall regression
# fails even if both engines agree on the lower number.
# ---------------------------------------------------------------------------

_PQ_RERANK_R = 100
_IVFADC_RERANK_R = 50
_MP_WIDE_PROBES = 11


def sim_recall_rerank_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from functools import reduce

    from ora_ch_spark.operators.pq import (
        ivf_sq8_topk,
        ivfadc_topk,
        pq_topk,
        pq_train,
    )

    emb = (
        load_table(spark, sf_dir, "embeddings")
        .filter(f"vec_id < {_RECALL_CORPUS_CAP}")
        .persist()
    )
    queries = emb.filter("vec_id < 10")
    emb.count()  # single cache fill before the thread fan-out
    # exact baseline as a collected LocalRelation — same rationale as
    # sim_recall_report (|Q|·k = 50 rows by construction); the
    # independent eager build phases overlap from a thread pool
    # (guide §2.6), same structure as sim_recall_report
    from concurrent.futures import ThreadPoolExecutor

    from ora_ch_spark.io import local_df

    idt = dict(emb.dtypes)["vec_id"]
    with ThreadPoolExecutor(max_workers=4) as pool:
        exact_rows_f = pool.submit(
            lambda: S.cosine_topk_bruteforce(emb, query_ids=queries)
            .select("q_id", "n_id")
            .collect()
        )
        trained_f = pool.submit(  # shared: pq + ivfadc
            lambda: pq_train(emb, query_ids=queries)
        )
        futs = {
            # routing x SQ8 needs NO refine stage — near-exact per-dim
            # decode under the same 2-probe routing; its presence here
            # is the control showing WHERE the other paths' recall went
            "ivf_sq8": pool.submit(
                lambda: ivf_sq8_topk(emb, query_ids=queries)
            ),
            "lsh_multiprobe_wide": pool.submit(
                lambda: S.cosine_topk_lsh_multiprobe(
                    emb,
                    query_ids=queries,
                    n_planes=_N_PLANES,
                    dims=_DIMS,
                    n_probes=_MP_WIDE_PROBES,
                )
            ),
        }
        trained = trained_f.result()
        futs["ivfadc_rerank"] = pool.submit(
            lambda: ivfadc_topk(
                emb, query_ids=queries, rerank=_IVFADC_RERANK_R,
                trained=trained,
            )
        )
        futs["pq_rerank"] = pool.submit(
            lambda: pq_topk(
                emb, query_ids=queries, rerank=_PQ_RERANK_R,
                trained=trained,
            )
        )
        exact_rows = exact_rows_f.result()
        methods = {name: f.result() for name, f in futs.items()}
    exact = local_df(spark, exact_rows, f"q_id {idt}, n_id {idt}")
    per_method = [
        df.select("q_id", "n_id")
        .join(exact, ["q_id", "n_id"], "left_semi")
        .agg(F.count(F.lit(1)).alias("hits"))
        .select(F.lit(name).alias("method"), F.col("hits").cast("bigint"))
        for name, df in sorted(methods.items())
    ]
    union = reduce(lambda a, b: a.unionByName(b), per_method)
    return (
        union.withColumn(
            "total", F.lit(len(exact_rows)).cast("bigint")
        )
        .select(
            "method",
            "hits",
            "total",
            (F.col("hits") / F.col("total")).cast("double").alias("recall_at_5"),
        )
        .orderBy("method")
    )


def sim_topk_pq_rerank_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The refine stage's exact OUTPUT gate (the recall entry gates
    only hit counts): pq_topk(rerank=100) — ADC shortlist, exact
    cosine over only those rows — hash-matched against the composed
    DuckDB replay (full PQ training replay at topk=100 + the
    shortlist-refine ranking)."""
    from ora_ch_spark.operators.pq import pq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return pq_topk(
        emb, query_ids=emb.filter("vec_id < 10"), rerank=_PQ_RERANK_R
    ).orderBy("q_id", "rank")


def _pq_rerank_oracle() -> str:
    from ora_ch_spark.catalog_corpus import _pq_oracle

    return _rerank_oracle(_pq_oracle(topk=_PQ_RERANK_R))


def _rerank_oracle(short_sql: str, topk: int = 5) -> str:
    """Exact-cosine refine replay over a shortlist subquery's
    (q_id, n_id) pairs — the DuckDB side of
    ``similarity.rerank_exact`` (same integer grid, same
    cosine-desc/n_id-asc tie-break)."""
    return f"""
WITH short AS (SELECT q_id, n_id FROM ({short_sql}) sh),
qr AS (SELECT vec_id, {_QE} AS qe FROM embeddings),
er AS (SELECT vec_id, unnest(qe) AS v, unnest(range(1, len(qe) + 1)) AS i FROM qr),
nrmr AS (SELECT vec_id, sum(v * v) AS nn FROM er GROUP BY 1),
dotr AS (
  SELECT s.q_id, s.n_id, sum(ea.v * eb.v) AS d
  FROM short s
  JOIN er ea ON ea.vec_id = s.q_id
  JOIN er eb ON eb.vec_id = s.n_id AND eb.i = ea.i
  GROUP BY 1, 2
),
scoredr AS (
  SELECT q_id, n_id,
         cast(d as double) / (sqrt(cast(nq.nn as double)) * sqrt(cast(nb.nn as double))) AS cosine
  FROM dotr JOIN nrmr nq ON q_id = nq.vec_id JOIN nrmr nb ON n_id = nb.vec_id
)
SELECT q_id, n_id,
       cast(row_number() OVER (PARTITION BY q_id
                               ORDER BY cosine DESC, n_id) as int) AS rank,
       cosine
FROM scoredr QUALIFY rank <= {topk}
"""


def _recall_rerank_oracle() -> str:
    from ora_ch_spark.catalog_corpus import _ivfadc_oracle, _pq_oracle

    from ora_ch_spark.catalog_corpus import _ivf_sq8_oracle

    variants = [
        ("ivf_sq8", _ivf_sq8_oracle()),
        ("ivfadc_rerank", _rerank_oracle(_ivfadc_oracle(topk=_IVFADC_RERANK_R))),
        ("lsh_multiprobe_wide", _lsh_multiprobe_oracle(n_probes=_MP_WIDE_PROBES)),
        ("pq_rerank", _rerank_oracle(_pq_oracle(topk=_PQ_RERANK_R))),
    ]
    parts = "\nUNION ALL\n".join(
        f"""SELECT '{name}' AS method,
  (SELECT count(*) FROM (SELECT q_id, n_id FROM ({_cap_embeddings(sql)}) t_{i}) m
   JOIN exact USING (q_id, n_id))::BIGINT AS hits
""" for i, (name, sql) in enumerate(variants)
    )
    return f"""
WITH exact AS (SELECT q_id, n_id FROM ({_cap_embeddings(SIM_TOPK_ORACLE)}) ex),
per_method AS (
{parts}
)
SELECT method, hits,
  (SELECT count(*) FROM exact)::BIGINT AS total,
  hits::DOUBLE / (SELECT count(*) FROM exact) AS recall_at_5
FROM per_method
ORDER BY method
"""


def _recall_report_oracle() -> str:
    from ora_ch_spark.catalog_corpus import (
        SIM_SQ8_ORACLE,
        _ivfadc_oracle,
        _pq_oracle,
    )

    variants = [
        ("ivf", SIM_IVF_ORACLE),
        ("ivfadc", _ivfadc_oracle()),
        ("lsh", _lsh_multiprobe_oracle(n_probes=1)),
        ("lsh_multiprobe", _lsh_multiprobe_oracle(n_probes=2)),
        ("pq", _pq_oracle()),
        ("sq8", SIM_SQ8_ORACLE),
    ]
    parts = "\nUNION ALL\n".join(
        f"""SELECT '{name}' AS method,
  (SELECT count(*) FROM (SELECT q_id, n_id FROM ({_cap_embeddings(sql)}) t_{name}) m
   JOIN exact USING (q_id, n_id))::BIGINT AS hits
""" for name, sql in variants
    )
    return f"""
WITH exact AS (SELECT q_id, n_id FROM ({_cap_embeddings(SIM_TOPK_ORACLE)}) ex),
per_method AS (
{parts}
)
SELECT method, hits,
  (SELECT count(*) FROM exact)::BIGINT AS total,
  hits::DOUBLE / (SELECT count(*) FROM exact) AS recall_at_5
FROM per_method
ORDER BY method
"""
