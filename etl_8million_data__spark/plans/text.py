"""Text-analysis extension queries over the documents table
(SURVEY.md §7.2(4)): quality scoring, language-ID heuristic, token
counting, rolling-hash fingerprinting — each with an exact DuckDB
oracle. All Spark-side logic is built-in expressions over token arrays
(no Python UDFs in the hot path)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_8million_data__spark.catalog import load_table
from etl_8million_data__spark.operators.text import hex_prefix_int, md5_utf8, tokens
from etl_8million_data__spark.plans.registry import register

_NORM = r"lower(trim(regexp_replace(text, '\s+', ' ', 'g')))"
_TOKS = f"string_split({_NORM}, ' ')"

_LANG_MARKERS = {
    "en": ("the", "a", "and", "of", "to", "in"),
    "de": ("der", "die", "das", "und", "nicht", "mit"),
    "es": ("el", "la", "los", "las", "y", "que"),
    "fr": ("le", "les", "des", "et", "une", "dans"),
}


def _count_in(toks: Column, words: tuple[str, ...]) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def _sql_count_in(words: tuple[str, ...]) -> str:
    lst = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter(toks, t -> t IN ({lst})))"


@register(
    "text_quality_scores",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_NORM} AS norm, {_TOKS} AS toks FROM documents)
    SELECT doc_id,
           len(toks) AS n_tokens,
           list_reduce(list_prepend(0, list_transform(toks, x -> length(x))),
                       (a, b) -> a + b) / len(toks) AS avg_token_len,
           {_sql_count_in(_LANG_MARKERS["en"])} / len(toks) AS stopword_ratio,
           length(regexp_replace(norm, '[^a-z]', '', 'g')) / length(norm) AS alpha_ratio,
           (len(toks) BETWEEN 5 AND 100000)
             AND {_sql_count_in(_LANG_MARKERS["en"])} / len(toks) <= 0.6 AS quality_ok
    FROM t
    """,
    tags=("text", "quality", "extension"),
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc quality metrics (length/stopword/alpha ratios) — the
    standard pre-training corpus filters, all as one narrow projection."""
    d = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    norm = F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
    n = F.size(toks)
    sum_len = F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t))
    stop_ratio = _count_in(toks, _LANG_MARKERS["en"]) / n
    return d.select(
        "doc_id",
        n.alias("n_tokens"),
        (sum_len / n).alias("avg_token_len"),
        stop_ratio.alias("stopword_ratio"),
        (F.length(F.regexp_replace(norm, "[^a-z]", "")) / F.length(norm)).alias("alpha_ratio"),
        (n.between(5, 100000) & (stop_ratio <= 0.6)).alias("quality_ok"),
    )


@register(
    "text_lang_id",
    oracle=f"""
    WITH t AS (SELECT doc_id, lang, {_TOKS} AS toks FROM documents),
    s AS (SELECT doc_id, lang,
                 {_sql_count_in(_LANG_MARKERS["en"])} AS s_en,
                 {_sql_count_in(_LANG_MARKERS["de"])} AS s_de,
                 {_sql_count_in(_LANG_MARKERS["es"])} AS s_es,
                 {_sql_count_in(_LANG_MARKERS["fr"])} AS s_fr
          FROM t)
    SELECT doc_id, lang, s_en, s_de, s_es, s_fr,
           CASE WHEN greatest(s_en, s_de, s_es, s_fr) = 0 THEN 'und'
                WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
                WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
                WHEN s_es >= s_fr THEN 'es'
                ELSE 'fr' END AS predicted_lang
    FROM s
    """,
    tags=("text", "langid", "extension"),
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language-ID heuristic with a deterministic
    priority-cascade argmax (en > de > es > fr on ties)."""
    d = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    s = d.select(
        "doc_id",
        "lang",
        *[_count_in(toks, _LANG_MARKERS[code]).alias(f"s_{code}") for code in _LANG_MARKERS],
    )
    se, sd, ss, sf_ = (F.col(c) for c in ("s_en", "s_de", "s_es", "s_fr"))
    predicted = (
        F.when(F.greatest(se, sd, ss, sf_) == 0, "und")
        .when((se >= sd) & (se >= ss) & (se >= sf_), "en")
        .when((sd >= ss) & (sd >= sf_), "de")
        .when(ss >= sf_, "es")
        .otherwise("fr")
    )
    return s.withColumn("predicted_lang", predicted)


@register(
    "text_token_counts",
    oracle=f"""
    SELECT doc_id,
           len({_TOKS}) AS n_ws_tokens,
           len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_word_tokens,
           len(regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9\\s]')) AS n_bpe_ish,
           length(text) / len(regexp_extract_all(lower(text), '[a-z0-9]+'))
             AS chars_per_word
    FROM documents
    """,
    tags=("text", "tokens", "extension"),
)
def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting three ways: whitespace, word-regex, and a BPE-ish
    segmentation (letter runs / single digits / punctuation)."""
    d = load_table(spark, sf_dir, "documents")
    low = F.lower(F.col("text"))
    n_words = F.size(F.regexp_extract_all(low, F.lit("([a-z0-9]+)"), 1))
    return d.select(
        "doc_id",
        F.size(tokens(F.col("text"))).alias("n_ws_tokens"),
        n_words.alias("n_word_tokens"),
        F.size(F.regexp_extract_all(low, F.lit(r"([a-z]+|[0-9]|[^a-z0-9\s])"), 1)).alias(
            "n_bpe_ish"
        ),
        (F.length("text") / n_words).alias("chars_per_word"),
    )


@register(
    "text_doc_fingerprint",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents)
    SELECT doc_id,
           list_reduce(list_prepend(CAST(0 AS BIGINT),
             list_transform(toks, tok ->
               list_reduce(list_prepend(CAST(0 AS BIGINT),
                 list_transform(range(6),
                   i -> CAST(strpos('0123456789abcdef', md5(tok)[i+1:i+1]) - 1 AS BIGINT))),
                 (a, x) -> a * 16 + x))),
             (acc, h) -> (acc * 31 + h) % 1000000007) AS fingerprint
    FROM t
    """,
    tags=("text", "fingerprint", "extension"),
)
def text_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive polynomial rolling hash over the token stream
    (mod 1e9+7) — a compact positional fingerprint; equal fingerprints
    imply (w.h.p.) identical token sequences."""
    d = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    fp = F.aggregate(
        toks,
        F.lit(0).cast("bigint"),
        lambda acc, t: (acc * 31 + hex_prefix_int(md5_utf8(t), 6)) % 1000000007,
    )
    return d.select("doc_id", fp.alias("fingerprint"))


@register(
    "text_quality_threshold_sweep",
    oracle=f"""
    WITH m AS (
      SELECT doc_id, len(toks) AS n_tokens,
             (1000000 * {_sql_count_in(_LANG_MARKERS["en"])}) // len(toks)
               AS stop_micro,
             (1000000 * length(regexp_replace(norm, '[^a-z]', '', 'g')))
               // length(norm) AS alpha_micro
      FROM (SELECT doc_id, {_NORM} AS norm, {_TOKS} AS toks FROM documents)
      WHERE len(toks) BETWEEN 5 AND 100000),
    g AS (SELECT unnest(range(13)) AS t)
    SELECT CAST(g.t AS INT) AS thr_no,
           g.t * 50000 / 1000000.0 AS stop_thr,
           CAST(count(*) AS BIGINT) AS kept_docs,
           CAST(sum(n_tokens) AS BIGINT) AS kept_tokens,
           CAST(sum(alpha_micro) AS BIGINT) AS sum_alpha_micro,
           CAST(sum(alpha_micro) AS DOUBLE) / (1000000.0 * count(*)) AS avg_alpha
    FROM m JOIN g ON m.stop_micro <= g.t * 50000
    GROUP BY g.t
    """,
    tags=("text", "quality", "calibration", "extension"),
)
def text_quality_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-calibration curve: for a grid of stopword-ratio cutoffs
    (0.00 .. 0.60 in 0.05 steps, length gate fixed), how many documents
    and tokens survive and how clean (alpha ratio) the survivors are —
    the table a corpus curator reads to pick the threshold that meets a
    token budget. Per-doc ratios are floored to integer micro units
    BEFORE the cross-row sums, so aggregation is order-insensitive and
    bit-identical to the oracle. Shape: one narrow metric projection,
    a broadcast 13-row grid join (inner — thresholds keeping nothing
    simply don't appear), one map-side-combined aggregate."""
    d = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    norm = F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
    n = F.size(toks)
    stop_micro = F.floor(
        (1000000 * _count_in(toks, _LANG_MARKERS["en"])) / n
    ).cast("bigint")
    alpha_micro = F.floor(
        (1000000 * F.length(F.regexp_replace(norm, "[^a-z]", ""))) / F.length(norm)
    ).cast("bigint")
    m = d.select(
        "doc_id",
        n.alias("n_tokens"),
        stop_micro.alias("stop_micro"),
        alpha_micro.alias("alpha_micro"),
    ).filter(F.col("n_tokens").between(5, 100000))
    grid = spark.range(13).select(F.col("id").cast("int").alias("t"))
    return (
        m.join(F.broadcast(grid), F.col("stop_micro") <= F.col("t") * 50000)
        .groupBy("t")
        .agg(
            F.count(F.lit(1)).alias("kept_docs"),
            F.sum("n_tokens").cast("bigint").alias("kept_tokens"),
            F.sum("alpha_micro").cast("bigint").alias("sum_alpha_micro"),
            (
                F.sum("alpha_micro").cast("double")
                / (1000000.0 * F.count(F.lit(1)))
            ).alias("avg_alpha"),
        )
        .select(
            F.col("t").alias("thr_no"),
            (F.col("t") * 50000 / 1000000.0).alias("stop_thr"),
            F.col("kept_docs").cast("bigint").alias("kept_docs"),
            "kept_tokens",
            "sum_alpha_micro",
            "avg_alpha",
        )
    )


def quality_profile_metrics(docs: DataFrame) -> DataFrame:
    """Narrow per-doc metric projection shared by the batch query
    corpus_quality_profile_by_source and its streaming twin
    (streaming/jobs.doc_quality_profile_stream): token count plus
    stopword/alpha ratios floored to integer micro units so the
    downstream aggregation is order-insensitive (batch == stream ==
    oracle, bit-for-bit)."""
    toks = tokens(F.col("text"))
    norm = F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
    n = F.size(toks)
    return docs.filter(n >= 1).select(
        "source",
        n.alias("n_tokens"),
        F.floor((1000000 * _count_in(toks, _LANG_MARKERS["en"])) / n)
        .cast("bigint")
        .alias("stop_micro"),
        F.floor(
            (1000000 * F.length(F.regexp_replace(norm, "[^a-z]", "")))
            / F.length(norm)
        )
        .cast("bigint")
        .alias("alpha_micro"),
    )


def quality_profile_agg(metrics: DataFrame) -> DataFrame:
    """Per-source aggregate over quality_profile_metrics — runs
    identically on a batch frame and (in complete mode) on a stream."""
    return metrics.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        (F.sum("stop_micro").cast("double") / (1000000.0 * F.count(F.lit(1)))).alias(
            "avg_stopword_ratio"
        ),
        (F.sum("alpha_micro").cast("double") / (1000000.0 * F.count(F.lit(1)))).alias(
            "avg_alpha_ratio"
        ),
    )


@register(
    "corpus_quality_profile_by_source",
    oracle=f"""
    WITH m AS (
      SELECT source, len(toks) AS n_tokens,
             (1000000 * {_sql_count_in(_LANG_MARKERS["en"])}) // len(toks)
               AS stop_micro,
             (1000000 * length(regexp_replace(norm, '[^a-z]', '', 'g')))
               // length(norm) AS alpha_micro
      FROM (SELECT source, {_NORM} AS norm, {_TOKS} AS toks FROM documents)
      WHERE len(toks) >= 1)
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(sum(stop_micro) AS DOUBLE) / (1000000.0 * count(*))
             AS avg_stopword_ratio,
           CAST(sum(alpha_micro) AS DOUBLE) / (1000000.0 * count(*))
             AS avg_alpha_ratio
    FROM m GROUP BY source
    """,
    tags=("text", "quality", "monitoring", "extension"),
)
def corpus_quality_profile_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality dashboard — the table an ingest operator
    watches for quality drift per crawl source: doc counts, token mass,
    mean stopword/alpha ratios. One narrow metric projection + one
    map-side-combined aggregate keyed by source; micro-int ratios make
    the means order-insensitive, so the STREAMING twin
    (streaming/jobs.doc_quality_profile_stream) produces bit-identical
    rows from the same documents replayed as a stream."""
    d = load_table(spark, sf_dir, "documents")
    return quality_profile_agg(quality_profile_metrics(d))


@register(
    "corpus_length_quality_correlation",
    oracle=f"""
    WITH m AS (
      SELECT lang, CAST(n_chars AS BIGINT) AS x,
             (1000000 * length(regexp_replace({_NORM}, '[^a-z]', '', 'g')))
               // greatest(length({_NORM}), 1) AS y
      FROM documents),
    s AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy
      FROM m GROUP BY lang)
    SELECT lang, n,
           n * sxy - sx * sy AS cov_num,
           n * sxx - sx * sx AS var_x_num,
           n * syy - sy * sy AS var_y_num,
           CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
                THEN (n * sxy - sx * sy)
                     / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                        * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
           END AS pearson_r
    FROM s
    """,
    tags=("text", "correlation", "quality", "extension"),
)
def corpus_length_quality_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CORRELATION audit — does a quality filter secretly select on
    length? Pearson r between document length (chars) and the alpha
    cleanliness ratio (integer micro), per language. The moments
    n/Σx/Σy/Σxy/Σx²/Σy² are EXACT integer sums (order-free), the
    covariance and variance numerators stay integers, and only the
    final r divides through doubles (identical sqrt/divide on both
    engines) — so the statistic hash-matches bit-for-bit, unlike any
    float-accumulated covariance. Strong |r| warns that tuning the
    alpha threshold silently reshapes the length distribution (and
    vice versa) — checked per language because the confound differs by
    script. Overflow bound: the integer numerators need
    n·max(x)² < 2^63 — fine to ~10^9 docs of 2k chars; beyond that,
    shard the moment sums and combine (they are associative), or
    demean with integer offsets first."""
    d = load_table(spark, sf_dir, "documents")
    y = F.expr(
        "(1000000 * length(regexp_replace(lower(trim(regexp_replace(text, "
        r"'\\s+', ' '))), '[^a-z]', ''))) div greatest(length(lower(trim("
        r"regexp_replace(text, '\\s+', ' ')))), 1)"
    )
    m = d.select(
        "lang", F.col("n_chars").cast("bigint").alias("x"), y.alias("y")
    )
    s = m.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return s.select(
        "lang",
        "n",
        cov.alias("cov_num"),
        vx.alias("var_x_num"),
        vy.alias("var_y_num"),
        F.when(
            (vx > 0) & (vy > 0),
            cov / (F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double"))),
        ).alias("pearson_r"),
    )


@register(
    "text_langid_confusion",
    oracle=f"""
    WITH t AS (SELECT doc_id, lang, {_TOKS} AS toks FROM documents),
    s AS (SELECT doc_id, lang,
                 {_sql_count_in(_LANG_MARKERS["en"])} AS s_en,
                 {_sql_count_in(_LANG_MARKERS["de"])} AS s_de,
                 {_sql_count_in(_LANG_MARKERS["es"])} AS s_es,
                 {_sql_count_in(_LANG_MARKERS["fr"])} AS s_fr
          FROM t),
    pred AS (
      SELECT lang,
             CASE WHEN greatest(s_en, s_de, s_es, s_fr) = 0 THEN 'und'
                  WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
                  WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
                  WHEN s_es >= s_fr THEN 'es'
                  ELSE 'fr' END AS predicted_lang
      FROM s),
    cm AS (SELECT lang, predicted_lang, CAST(count(*) AS BIGINT) AS n
           FROM pred GROUP BY 1, 2),
    tot AS (SELECT lang, CAST(sum(n) AS BIGINT) AS n_true FROM cm GROUP BY 1)
    SELECT cm.lang, cm.predicted_lang, cm.n,
           CAST((1000000 * cm.n) // tot.n_true AS BIGINT)
             AS share_of_true_micro,
           (cm.lang = cm.predicted_lang) AS is_correct
    FROM cm JOIN tot USING (lang)
    """,
    tags=("text", "langid", "evaluation", "extension"),
)
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LANGUAGE-ID CONFUSION MATRIX — the evaluation layer on the
    marker-word heuristic (text_lang_id), using the fixture's labeled
    ``lang`` column as ground truth: per (true lang, predicted lang)
    cell the document count and its integer-micro share of the true
    class (the row-normalized confusion matrix — diagonal = per-class
    recall), plus the correctness flag reviewers filter on. The cell a
    curation pipeline watches is 'true non-en predicted en' — the
    failure mode that silently floods an English-filtered corpus with
    mislabeled text. Two hash aggregates over the per-doc predictions;
    the matrix is |langs|² rows at any corpus size."""
    pred = text_lang_id(spark, sf_dir).select("lang", "predicted_lang")
    cm = pred.groupBy("lang", "predicted_lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    tot = cm.groupBy("lang").agg(F.sum("n").cast("bigint").alias("n_true"))
    return (
        cm.join(F.broadcast(tot), "lang")
        .select(
            "lang",
            "predicted_lang",
            "n",
            F.expr("(1000000 * n) div n_true")
            .cast("bigint")
            .alias("share_of_true_micro"),
            (F.col("lang") == F.col("predicted_lang")).alias("is_correct"),
        )
    )
