"""Line-level corpus hygiene: exact line deduplication (keep first
occurrence corpus-wide, the C4/CCNet rule) and boilerplate-line
removal (drop lines shared by many documents — nav bars, footers,
cookie banners).

Scale design:
- ``to_lines``/``chunk_lines`` are linear explodes (no shuffle).
- ``line_dedup`` picks each line's first occurrence with a
  ``groupBy(line).agg(min(struct(doc, line_no)))`` — partial (map-side)
  aggregation, so a line repeated a million times combines locally
  instead of sorting a million rows through one window partition (the
  windowed formulation has no partial agg and dies on exactly the hot
  lines this operator exists to catch). The winner set (one row per
  distinct line) joins back on the line key; AQE's skew-join handles
  residual hot-key imbalance.
- ``strip_boilerplate`` counts distinct docs per line the same
  partial-agg way, then removes flagged lines with a left-anti join.
- Reassembly is one ``groupBy(doc)`` of the kept lines with an
  in-memory ``sort_array`` per doc — bounded by document size, not
  corpus size.

Everything is built-in functions (whole-stage codegen); outputs are
md5-verified reassembled text, so the differential oracle checks the
full reconstruction, not just counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _spread(df: DataFrame) -> DataFrame:
    # small corpora arrive as one parquet split — spread before explode
    par = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    return df.repartition(par)


def to_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    delim: str = "\n",
) -> DataFrame:
    """Explode documents into (id, line_no, line) on a LITERAL
    delimiter — the production path for real newline-structured text.
    (``split`` takes a Java regex, so the delimiter is \\Q…\\E-quoted;
    ``to_lines(df, delim="|")`` splits on the pipe character, not on
    the empty-string alternation the raw regex would mean.)"""
    return _spread(df).select(
        F.col(id_col),
        F.posexplode(
            F.split(F.col(text_col), "\\Q" + delim + "\\E")
        ).alias("line_no", "line"),
    )


def chunk_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_per_line: int = 12,
) -> DataFrame:
    """Synthesize lines by chunking the token stream into fixed-size
    windows — the stand-in for corpora without newline structure (the
    testdata's documents are single-line token streams). Same output
    shape as :func:`to_lines`."""
    n = tokens_per_line
    return _spread(df).select(
        F.col(id_col),
        F.posexplode(
            F.expr(
                f"transform(sequence(0, cast(ceil(size(split({text_col}, ' ')) / {n}.0) as int) - 1),"
                f" i -> array_join(slice(split({text_col}, ' '), i * {n} + 1, {n}), ' '))"
            )
        ).alias("line_no", "line"),
    )


def _reassemble(
    all_lines: DataFrame,
    kept: DataFrame,
    id_col: str,
    join_delim: str,
    include_text: bool = False,
) -> DataFrame:
    """Per-doc rollup: total line count from ``all_lines``, kept count
    + md5(reassembled text in original line order) from ``kept``. Docs
    that lose every line reassemble to ''. ``include_text`` adds the
    rebuilt text itself (``kept_text``) for downstream pipeline stages
    that re-score the cleaned document."""
    totals = all_lines.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_lines"))
    rebuilt = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("line_no", "line"))),
                lambda s: s["line"],
            ),
            join_delim,
        ).alias("__text"),
    )
    out = totals.join(rebuilt, id_col, "left").select(
        id_col,
        "n_lines",
        F.coalesce(F.col("n_kept"), F.lit(0).cast("bigint")).alias("n_kept"),
        F.md5(F.coalesce(F.col("__text"), F.lit(""))).alias("kept_md5"),
        F.length(F.coalesce(F.col("__text"), F.lit(""))).cast("bigint").alias("kept_len"),
        F.coalesce(F.col("__text"), F.lit("")).alias("kept_text"),
    )
    return out if include_text else out.drop("kept_text")


def line_dedup(
    lines: DataFrame, id_col: str = "doc_id", join_delim: str = " "
) -> DataFrame:
    """Corpus-wide exact line dedup, keep-first (C4 rule): a line's
    first occurrence — minimum (doc, line_no) — survives; every other
    copy anywhere in the corpus is dropped. Returns one row per doc:
    (id, n_lines, n_kept, kept_md5, kept_len).

    The kept set IS the winner set — ``min(struct(doc, line_no))`` per
    line carries the surviving coordinates, so no join-back is needed:
    one partial-agg shuffle on the line key, then the per-doc rollup."""
    kept = (
        lines.groupBy("line")
        .agg(F.min(F.struct(F.col(id_col), F.col("line_no"))).alias("__first"))
        .select(
            F.col(f"__first.{id_col}").alias(id_col),
            F.col("__first.line_no").alias("line_no"),
            "line",
        )
    )
    return _reassemble(lines, kept, id_col, join_delim)


def strip_boilerplate(
    lines: DataFrame,
    id_col: str = "doc_id",
    min_docs: int = 3,
    join_delim: str = " ",
    include_text: bool = False,
) -> DataFrame:
    """Boilerplate removal: any line appearing in ≥ ``min_docs``
    distinct documents is removed from ALL of them. Returns one row
    per doc: (id, n_lines, n_kept, kept_md5, kept_len[, kept_text]).

    Shape (r15, guide §2.4 — the lines frame is usually an
    UNPERSISTED explode, so every extra consumer re-runs it): one
    pass builds the (small, distinct) boiler set, then ONE rollup
    pass over lines MARKS boiler membership with a left join and
    folds totals + kept counts + reassembly into a single aggregate —
    the previous anti-join + separate totals pass + totals⋈rebuilt
    join re-ran the explode three times. Identical output by
    construction: the left join against the distinct boiler keys
    multiplies nothing, ``collect_list``/``count`` skip the NULL
    branch of the kept marker exactly as the anti-join dropped those
    rows, and an all-boiler doc reassembles to '' either way."""
    boiler = (
        lines.groupBy("line")
        .agg(F.countDistinct(F.col(id_col)).alias("__nd"))
        .filter(F.col("__nd") >= min_docs)
        .select("line", F.lit(1).alias("__b"))
    )
    marked = lines.join(boiler, "line", "left")
    keep = F.col("__b").isNull()
    text = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(F.when(keep, F.struct("line_no", "line")))
            ),
            lambda s: s["line"],
        ),
        join_delim,
    )
    out = (
        marked.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.count(F.when(keep, 1)).alias("n_kept"),
            text.alias("__text"),
        )
        .select(
            id_col,
            "n_lines",
            "n_kept",
            F.md5(F.col("__text")).alias("kept_md5"),
            F.length(F.col("__text")).cast("bigint").alias("kept_len"),
            F.col("__text").alias("kept_text"),
        )
    )
    return out if include_text else out.drop("kept_text")


def c4_line_filter(
    lines: DataFrame,
    id_col: str = "doc_id",
    join_delim: str = " ",
    min_words_per_line: int = 5,
    min_kept_lines_per_page: int = 3,
) -> DataFrame:
    """C4-style line + page filtering (Raffel et al. 2020 §2.2):

    line rules — keep a line only if it ends in terminal punctuation
    (``. ! ? "`` or a closing curly quote), has at least
    ``min_words_per_line`` whitespace words, and does not mention
    'javascript' (case-insensitive);
    page rules — drop the WHOLE page when any line contains
    'lorem ipsum' (case-insensitive) or a ``{``, or when fewer than
    ``min_kept_lines_per_page`` lines survive the line rules.

    Takes an exploded (id, line_no, line) frame (``to_lines`` /
    ``chunk_lines``); returns one row per doc: the ``_reassemble``
    rollup (n_lines, n_kept, kept_md5, kept_len) plus the page flags
    (has_lorem, has_brace, page_kept). Dropped pages reassemble to
    n_kept = 0 / md5('').

    Scale (r15, guide §2.4): ONE partial-agg shuffle on the doc key —
    page flags, candidate counts and the reassembly fold into a
    single aggregate over the exploded frame (the previous
    flags/counts/rebuilt/totals plan re-ran the unpersisted explode
    four times and paid two joins). Identical output by construction:
    the line rules are the same map-side predicates (as a conditional
    aggregate branch instead of a filter), ``page_kept`` is the same
    expression over the per-doc aggregates, and a dropped page's
    reassembly nulls to '' exactly as the semi-join excluded it. The
    candidate lines of dropped pages are collected then discarded —
    bounded by document size, the same bound the kept-page collect
    already has."""
    line_ok = (
        F.col("line").rlike('[.!?"”]\\s*$')
        & (F.size(F.split(F.col("line"), " ")) >= min_words_per_line)
        & ~F.lower(F.col("line")).contains("javascript")
    )
    text = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(F.when(line_ok, F.struct("line_no", "line")))
            ),
            lambda s: s["line"],
        ),
        join_delim,
    )
    agg = lines.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.max(
            F.lower(F.col("line")).contains("lorem ipsum").cast("int")
        ).cast("boolean").alias("has_lorem"),
        F.max(
            F.col("line").contains("{").cast("int")
        ).cast("boolean").alias("has_brace"),
        F.count(F.when(line_ok, 1)).alias("__n_ok"),
        text.alias("__text"),
    )
    page_kept = (
        ~F.col("has_lorem")
        & ~F.col("has_brace")
        & (F.col("__n_ok") >= min_kept_lines_per_page)
    )
    kept_text = F.when(page_kept, F.col("__text")).otherwise(F.lit(""))
    return agg.select(
        id_col,
        "n_lines",
        F.when(page_kept, F.col("__n_ok"))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("n_kept"),
        F.md5(kept_text).alias("kept_md5"),
        F.length(kept_text).cast("bigint").alias("kept_len"),
        "has_lorem",
        "has_brace",
        page_kept.alias("page_kept"),
    )
