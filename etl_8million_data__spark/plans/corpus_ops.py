"""Corpus-preparation operators a training-data pipeline needs beyond
per-doc scoring (SURVEY.md §7.2(4) extensions): global term statistics,
repetition-based quality, PII redaction, deterministic dataset splits,
and near-dup *clustering* (LSH pairs → connected components).

Everything stays JVM-side (explode / higher-order array functions /
joins); the connected-components loop is the only iterative piece and
is verified against a DuckDB recursive-CTE transitive closure.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_8million_data__spark.catalog import load_table
from etl_8million_data__spark.operators.dedup import (
    minhash_lsh_candidate_pairs,
    spread,
)
from etl_8million_data__spark.operators.graph import connected_components
from etl_8million_data__spark.operators.text import tokens, word_shingles
from etl_8million_data__spark.plans.dedup import (
    _BANDS,
    _PAIRS,
    _SHINGLED,
    _SIG,
    _WINNOW_SEL,
)
from etl_8million_data__spark.plans.registry import register

_NORM = r"lower(trim(regexp_replace(text, '\s+', ' ', 'g')))"
_TOKS = f"string_split({_NORM}, ' ')"

# Deterministic split hash: a Knuth-style multiplicative mix kept in
# exact bigint range so Spark and DuckDB agree bit-for-bit. NOT Spark's
# hash() / DuckDB's hash(), which differ by engine. doc_id is reduced
# mod 2^31 BEFORE the multiply: (2^31-1)*2654435761 < 2^63, so the
# intermediate never wraps int64 in Spark (silent wrap) nor overflows
# in DuckDB (hard error) — bit-reproducible out to billions of docs.
_SPLIT_BUCKET = "(((doc_id % 2147483648) * 2654435761 + 104729) % 4294967296) % 1000"

_EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
_PHONE_RE = r"\+?[0-9][0-9 -]{5,}[0-9]"


@register(
    "corpus_term_frequencies",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOKS}) AS token FROM documents)
    SELECT token, count(*) AS n_occurrences,
           count(DISTINCT doc_id) AS n_docs
    FROM tok GROUP BY token
    ORDER BY n_occurrences DESC, token LIMIT 100
    """,
    tags=("text", "corpus", "extension"),
)
def corpus_term_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-100 term + document frequencies: explode the token
    array, one hash aggregate keyed by token (map-side partials), then
    a true top-k (TakeOrderedAndProject) — the vocabulary/IDF building
    block. Tie-break on token keeps the limit deterministic."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.count_distinct(F.col("doc_id")).alias("n_docs"),
        )
        .orderBy(F.desc("n_occurrences"), F.asc("token"))
        .limit(100)
    )


@register(
    "text_repetition_ratio",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents
               WHERE len({_TOKS}) >= 2),
    g AS (SELECT doc_id, toks,
                 list_transform(range(len(toks) - 1),
                                i -> toks[i+1] || ' ' || toks[i+2]) AS bigrams
          FROM t)
    SELECT doc_id, len(toks) AS n_tokens,
           1.0 - len(list_distinct(toks)) * 1.0 / len(toks) AS token_rep_ratio,
           1.0 - len(list_distinct(bigrams)) * 1.0 / len(bigrams)
             AS bigram_rep_ratio
    FROM g
    """,
    tags=("text", "quality", "extension"),
)
def text_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality signals: fraction of duplicated tokens
    and duplicated 2-grams per document (boilerplate / spam detector).
    Bigrams come from zip_with over two shifted slices — all array ops,
    no shuffle, exact integer ratios."""
    d = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    d = d.select("doc_id", toks.alias("toks")).filter(F.size("toks") >= 2)
    n = F.size("toks")
    bigrams = F.zip_with(
        F.slice(F.col("toks"), 1, n - 1),
        F.slice(F.col("toks"), 2, n - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return d.select(
        "doc_id",
        n.alias("n_tokens"),
        (F.lit(1.0) - F.size(F.array_distinct(F.col("toks"))) * 1.0 / n).alias(
            "token_rep_ratio"
        ),
        (
            F.lit(1.0)
            - F.size(F.array_distinct(bigrams)) * 1.0 / F.size(bigrams)
        ).alias("bigram_rep_ratio"),
    )


@register(
    "pii_redaction_contacts",
    oracle=f"""
    WITH blobs AS (
      SELECT c_custkey,
             'contact ' || lower(replace(c_name, '#', '')) ||
             ' at ' || lower(replace(c_name, '#', '.')) || '@example.com' ||
             ' or +1 555-00' || CAST(c_custkey % 100 AS VARCHAR) ||
             ' ext ' || CAST(c_custkey AS VARCHAR) AS blob
      FROM customer)
    SELECT c_custkey,
           len(regexp_extract_all(blob, '{_EMAIL_RE}')) AS n_emails,
           len(regexp_extract_all(blob, '{_PHONE_RE}')) AS n_phones,
           md5(regexp_replace(regexp_replace(blob, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                              '{_PHONE_RE}', '<PHONE>', 'g')) AS redacted_md5
    FROM blobs
    """,
    tags=("text", "pii", "extension"),
)
def pii_redaction_contacts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: find-and-redact emails / phone numbers with pure
    regexp expressions (the fixture corpus contains no PII, so the
    contact blob is derived deterministically from the customer dim;
    the operator — count, then redact in place — is what a real corpus
    pipeline runs per shard, embarrassingly parallel)."""
    c = load_table(spark, sf_dir, "customer")
    clean = F.lower(F.regexp_replace(F.col("c_name"), "#", ""))
    dotted = F.lower(F.regexp_replace(F.col("c_name"), "#", "."))
    blob = F.concat(
        F.lit("contact "), clean, F.lit(" at "), dotted, F.lit("@example.com"),
        F.lit(" or +1 555-00"), (F.col("c_custkey") % 100).cast("string"),
        F.lit(" ext "), F.col("c_custkey").cast("string"),
    )
    b = c.select("c_custkey", blob.alias("blob"))
    redacted = F.regexp_replace(
        F.regexp_replace(F.col("blob"), _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
    )
    return b.select(
        "c_custkey",
        F.size(F.regexp_extract_all(F.col("blob"), F.lit(f"({_EMAIL_RE})"), 1)).alias(
            "n_emails"
        ),
        F.size(F.regexp_extract_all(F.col("blob"), F.lit(f"({_PHONE_RE})"), 1)).alias(
            "n_phones"
        ),
        F.md5(redacted).alias("redacted_md5"),
    )


@register(
    "corpus_train_split",
    oracle=f"""
    SELECT lang, source,
           CASE WHEN {_SPLIT_BUCKET} < 900 THEN 'train'
                WHEN {_SPLIT_BUCKET} < 950 THEN 'val'
                ELSE 'test' END AS split,
           count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY lang, source, split
    """,
    tags=("corpus", "split", "extension"),
)
def corpus_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~90/5/5 train/val/test assignment from a
    multiplicative hash of doc_id (reproducible across engines and
    runs — unlike rand() — and stable under re-partitioning), then
    per-(lang, source, split) corpus accounting."""
    d = load_table(spark, sf_dir, "documents")
    bucket = (((F.col("doc_id") % 2147483648) * 2654435761 + 104729) % 4294967296) % 1000
    split = (
        F.when(bucket < 900, "train").when(bucket < 950, "val").otherwise("test")
    )
    return (
        d.withColumn("split", split)
        .groupBy("lang", "source", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


@register(
    "corpus_salient_terms_tfidf",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOKS}) AS token FROM documents),
    tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token),
    dfq AS (SELECT token, count(DISTINCT doc_id) AS df FROM tok GROUP BY token),
    n AS (SELECT count(*) AS n_docs FROM documents)
    SELECT doc_id, token, tf, df, tf * n_docs * 1.0 / df AS salience
    FROM tf JOIN dfq USING (token) CROSS JOIN n
    QUALIFY row_number() OVER (
      PARTITION BY doc_id
      ORDER BY tf * n_docs * 1.0 / df DESC, token) <= 5
    """,
    tags=("text", "tfidf", "extension"),
)
def corpus_salient_terms_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 salient terms per document, TF-IDF-style. The idf factor
    is the *rational* N/df rather than log(N/df): same ranking, but the
    score is a single division of exact integers, so it hashes
    identically across engines (libm log() does not). Term frequencies
    and document frequencies come from one exploded scan; the tiny df
    side broadcasts."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dfq = tok.groupBy("token").agg(F.count_distinct("doc_id").alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    from pyspark.sql import Window

    scored = (
        tf.join(F.broadcast(dfq), "token")
        .crossJoin(F.broadcast(n))
        .withColumn("salience", F.col("tf") * F.col("n_docs") * 1.0 / F.col("df"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("salience"), F.asc("token"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 5)
        .select("doc_id", "token", "tf", "df", "salience")
    )


@register(
    "dedup_cluster_components",
    oracle=f"""
    WITH RECURSIVE shingled AS ({_SHINGLED}), sig AS ({_SIG}),
    bands AS ({_BANDS}), pairs AS ({_PAIRS}),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM pairs),
    walk(src, dst) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT w.src, e.dst FROM walk w JOIN edges e ON w.dst = e.src),
    comp AS (
      SELECT src AS node, least(src, min(dst)) AS component
      FROM walk GROUP BY src)
    SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component
    FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
    """,
    tags=("dedup", "graph", "extension"),
)
def dedup_cluster_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup *clusters*: LSH candidate pairs form a similarity graph;
    iterative min-label propagation (operators/graph.py) assigns every
    doc the min doc_id of its component — the canonical-doc choice that
    makes 'keep one per cluster' a single filter. Oracle is a DuckDB
    recursive-CTE transitive closure over the identical pair set."""
    d = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_candidate_pairs(d)
    comp = connected_components(
        d.select("doc_id"), pairs, node_col="doc_id", src_col="doc_a", dst_col="doc_b"
    )
    return d.select("doc_id").join(
        comp, d.doc_id == comp.node, "left"
    ).select(
        "doc_id", F.coalesce(F.col("component"), F.col("doc_id")).alias("component")
    )


@register(
    "corpus_token_first_positions",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents)
    SELECT doc_id, toks[i+1] AS token, min(i) AS first_pos,
           count(*) AS occurrences
    FROM t, unnest(range(len(toks))) AS u(i)
    GROUP BY doc_id, token
    """,
    tags=("text", "posexplode", "lateral", "extension"),
)
def corpus_token_first_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode (LATERAL-VIEW-with-ordinality shape): token positions
    survive the explode, so first-occurrence offset and occurrence
    count come from one grouped pass — the positional-index building
    block (snippet extraction, proximity features)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.posexplode(tokens(F.col("text"))).alias("first_pos", "token"))
        .groupBy("doc_id", "token")
        .agg(
            F.min("first_pos").alias("first_pos"),
            F.count(F.lit(1)).alias("occurrences"),
        )
        .select("doc_id", "token", "first_pos", "occurrences")
    )


@register(
    "corpus_benchmark_contamination",
    oracle=f"""
    WITH toks AS (SELECT doc_id, source, {_TOKS} AS t FROM documents),
    idx AS (
      SELECT doc_id, source, t,
             unnest(generate_series(1, greatest(len(t) - 2, 0))) AS i
      FROM toks),
    grams AS (
      SELECT DISTINCT doc_id, source, array_to_string(t[i : i + 2], ' ') AS gram
      FROM idx),
    probe AS (SELECT DISTINCT gram FROM grams WHERE source = 'src0'),
    corpus AS (SELECT * FROM grams WHERE source <> 'src0')
    SELECT c.doc_id, c.source, count(*) AS n_grams,
           count(p.gram) AS n_contaminated,
           CAST(count(p.gram) AS DOUBLE) / count(*) AS contamination
    FROM corpus c LEFT JOIN probe p ON c.gram = p.gram
    GROUP BY c.doc_id, c.source
    """,
    tags=("text", "corpus", "contamination", "extension"),
)
def corpus_benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test contamination check — the LLM-pipeline op of scanning
    a training corpus for n-gram overlap with a held-out benchmark
    (here: source `src0` plays the benchmark, everything else is the
    corpus; 3-grams so the fixture vocabulary actually collides — real
    corpora use 8-13). Per corpus doc: distinct word n-grams, how many
    appear anywhere in the benchmark, and the contaminated fraction.
    Scale shape: the benchmark gram set is small by construction →
    broadcast left join against it; the corpus side is a narrow
    explode + distinct keyed by (doc_id, gram), so the one shuffle
    carries grams, not documents. No Python in the path."""
    d = load_table(spark, sf_dir, "documents")
    grams = (
        d.select("doc_id", "source", tokens(F.col("text")).alias("_toks"))
        .select(
            "doc_id", "source", F.explode(word_shingles(F.col("_toks"), 3)).alias("gram")
        )
        .distinct()
    )
    probe = (
        grams.filter(F.col("source") == "src0")
        .select(F.col("gram").alias("pgram"))
        .distinct()
    )
    corpus = grams.filter(F.col("source") != "src0")
    return (
        corpus.join(F.broadcast(probe), corpus.gram == probe.pgram, "left")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("pgram").alias("n_contaminated"),
        )
        .withColumn(
            "contamination",
            F.col("n_contaminated").cast("double") / F.col("n_grams"),
        )
    )


@register(
    "corpus_pack_token_budget",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source, len({_TOKS}) AS n_tokens FROM documents),
    cum AS (
      SELECT doc_id, source, n_tokens,
             COALESCE(sum(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tokens_before
      FROM toks)
    SELECT doc_id, source, n_tokens,
           CAST(floor(tokens_before / 256) AS BIGINT) AS bin_id
    FROM cum
    """,
    tags=("text", "corpus", "packing", "window", "extension"),
)
def corpus_pack_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for training-batch assembly: stream each
    source's documents in doc_id order into ~256-token bins (bin_id =
    exclusive running token count // budget — contiguous chunking, the
    streaming-friendly cousin of greedy bin packing: a doc may straddle
    a boundary rather than open a new bin). One window per source
    partition — sources are independent, so at 100 TB this is
    embarrassingly parallel across the partition key with no global
    sort; token counts are exact ints so both engines agree."""
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        d.select("doc_id", "source", F.size(tokens(F.col("text"))).alias("n_tokens"))
        .withColumn("tokens_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
        .select(
            "doc_id",
            "source",
            "n_tokens",
            F.floor(F.col("tokens_before") / 256).cast("bigint").alias("bin_id"),
        )
    )


@register(
    "corpus_stratified_sample",
    oracle="""
    WITH cnt AS (SELECT lang, count(*) AS n_lang FROM documents GROUP BY lang),
    mn AS (SELECT min(n_lang) AS min_n FROM cnt)
    SELECT d.doc_id, d.lang
    FROM documents d JOIN cnt USING (lang) CROSS JOIN mn
    WHERE (((d.doc_id % 2147483648) * 2654435761 + 104729) % 4294967296) % 1000
          < (1000 * min_n) // n_lang
    """,
    tags=("corpus", "sampling", "extension"),
)
def corpus_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balancing stratified downsample: every language is kept at
    ~the rarest language's row count. The per-stratum keep rate is
    derived on the fly (tiny groupBy, broadcast back onto the fact —
    at 100 TB the rate table is KBs while the scan stays one pass), and
    membership comes from the deterministic multiplicative doc_id hash,
    so the sample is reproducible across engines, runs, and partitioning
    — none of which holds for rand()-based sampleBy. Thresholds use
    integer div only, exact in both engines."""
    d = load_table(spark, sf_dir, "documents")
    cnt = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_lang"))
    mn = cnt.agg(F.min("n_lang").alias("min_n"))
    bucket = (((F.col("doc_id") % 2147483648) * 2654435761 + 104729) % 4294967296) % 1000
    return (
        d.join(F.broadcast(cnt), "lang")
        .crossJoin(F.broadcast(mn))
        .filter(bucket < F.expr("(1000 * min_n) div n_lang"))
        .select("doc_id", "lang")
    )


def _surv_ctes() -> str:
    """The WITH-clause body computing curated survivors (shared by the
    curation summary and the training-order capstone)."""
    from etl_8million_data__spark.plans.text import _LANG_MARKERS, _sql_count_in

    en = _sql_count_in(_LANG_MARKERS["en"])
    de = _sql_count_in(_LANG_MARKERS["de"])
    es = _sql_count_in(_LANG_MARKERS["es"])
    fr = _sql_count_in(_LANG_MARKERS["fr"])
    return f"""base AS (
      SELECT doc_id, source, n_chars, {_TOKS} AS toks, md5({_NORM}) AS fp
      FROM documents),
    scored AS (
      SELECT doc_id, source, n_chars, fp, len(toks) AS n,
             {en} AS s_en, {de} AS s_de, {es} AS s_es, {fr} AS s_fr
      FROM base),
    gated AS (
      SELECT * FROM scored
      WHERE n BETWEEN 5 AND 100000 AND s_en * 5 <= n * 3
        AND s_en > 0 AND s_en >= s_de AND s_en >= s_es AND s_en >= s_fr),
    exact AS (
      SELECT * FROM gated QUALIFY doc_id = min(doc_id) OVER (PARTITION BY fp)),
    shingled AS ({_SHINGLED}), sig AS ({_SIG}), bands AS ({_BANDS}),
    pairs AS ({_PAIRS}),
    near AS (
      SELECT DISTINCT p.doc_b AS doc_id
      FROM pairs p
      JOIN shingled sa ON sa.doc_id = p.doc_a
      JOIN shingled sb ON sb.doc_id = p.doc_b
      WHERE len(list_intersect(sa.shingles, sb.shingles))
            / (len(sa.shingles) + len(sb.shingles)
               - len(list_intersect(sa.shingles, sb.shingles))) >= 0.5),
    gr AS (
      SELECT DISTINCT doc_id, source, array_to_string(toks[i : i + 2], ' ') AS gram
      FROM (SELECT doc_id, source, toks,
                   unnest(generate_series(1, greatest(len(toks) - 2, 0))) AS i
            FROM base)),
    probe AS (SELECT DISTINCT gram FROM gr WHERE source = 'src0'),
    cont AS (
      SELECT c.doc_id, count(*) AS n_grams, count(p.gram) AS n_cont
      FROM gr c LEFT JOIN probe p ON c.gram = p.gram
      WHERE c.source <> 'src0' GROUP BY c.doc_id),
    bad AS (SELECT doc_id FROM cont WHERE n_cont * 20 > n_grams),
    surv AS (
      SELECT e.doc_id, e.source, e.n_chars FROM exact e
      WHERE e.source <> 'src0'
        AND e.doc_id NOT IN (SELECT doc_id FROM near)
        AND e.doc_id NOT IN (SELECT doc_id FROM bad))"""


def _e2e_oracle() -> str:
    return f"""
    WITH {_surv_ctes()}
    SELECT CASE WHEN {_SPLIT_BUCKET} < 900 THEN 'train'
                WHEN {_SPLIT_BUCKET} < 950 THEN 'val'
                ELSE 'test' END AS split,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           count(DISTINCT source) AS n_sources,
           min(doc_id) AS min_doc_id,
           max(doc_id) AS max_doc_id
    FROM surv GROUP BY 1
    """


@register(
    "corpus_e2e_curation",
    oracle=_e2e_oracle(),
    tags=("corpus", "curation", "dedup", "contamination", "split", "flagship", "extension"),
)
def corpus_e2e_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END corpus curation — the full pre-training data pipeline
    as ONE declarative plan (every stage is an existing verified
    operator; this query is their composition):

      1. language gate: English marker count >= every other language's
         and > 0 (text_lang_id heuristic);
      2. quality gate: 5 <= n_tokens <= 100k, stopword ratio <= 0.6 —
         integer arithmetic (s_en*5 <= n*3), no FP in filters;
      3. exact dedup: keep the lowest doc_id per md5(normalized text)
         fingerprint (window min — one shuffle on the 32-byte key);
      4. near-dup removal: MinHash-LSH candidates verified by exact
         shingle Jaccard >= 0.5; a doc is dropped when it is the
         HIGHER id of any verified pair (non-iterative keep rule —
         no transitive closure needed, unlike clustering);
      5. decontamination: drop corpus docs sharing > 5% of their
         distinct 3-grams with the benchmark source `src0` (integer
         form n_cont*20 > n_grams), and drop the benchmark itself;
      6. deterministic ~90/5/5 train/val/test split via the
         multiplicative doc_id hash, then per-split accounting.

    Scale shape: stages 1-3 are one scan + one window; stage 4 shuffles
    only (doc_id, band_key) tuples and joins shingle sets for candidate
    pairs alone; stage 5 broadcasts the benchmark gram set; the final
    agg is 3 rows. No Python anywhere; every filter/judgment is exact
    integer or md5-string arithmetic so DuckDB reproduces it
    bit-for-bit."""
    surv = _survivors(spark, sf_dir)
    bucket = (((F.col("doc_id") % 2147483648) * 2654435761 + 104729) % 4294967296) % 1000
    split = F.when(bucket < 900, "train").when(bucket < 950, "val").otherwise("test")
    return (
        surv.withColumn("split", split)
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.count_distinct(F.col("source")).alias("n_sources"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )


def _survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curated survivor documents ``(doc_id, source, n_chars)`` —
    stages 1-5 of corpus_e2e_curation (language gate, quality gate,
    exact dedup, verified near-dup drop, decontamination).  Mirrors
    the ``surv`` CTE of :func:`_surv_ctes` exactly."""
    from pyspark.sql import Window

    from etl_8million_data__spark.operators.dedup import (
        exact_fingerprint,
        jaccard_verified_pairs,
        spread,
    )
    from etl_8million_data__spark.plans.text import _LANG_MARKERS

    d = load_table(spark, sf_dir, "documents")
    # ONE tokenization for the whole pipeline: the token array (plus the
    # exact-dedup fingerprint) is computed in a single spread map stage
    # and checkpointed; the language marks, the near-dup shingle sets,
    # and the contamination grams all derive from it. Previously each of
    # the three stages re-tokenized the corpus from parquet — at 100 TB
    # that is two full redundant scans plus re-splitting every document.
    tokf = (
        spread(d, "doc_id")
        .select(
            "doc_id",
            "source",
            "n_chars",
            exact_fingerprint(F.col("text")).alias("fp"),
            tokens(F.col("text")).alias("_toks"),
        )
        .localCheckpoint(eager=True)
    )
    # Marker counts RELATIONALLY (explode -> codegen conditional sums),
    # not via list_filter: higher-order array functions are
    # CodegenFallback and evaluate interpreted per row (~2.5 s vs
    # ~0.5 s on this stage; same trap simhash escaped). Equivalent to
    # the oracle's len(list_filter(...)): split('') yields [''] so every
    # doc emits >= 1 token row.
    tok = tokf.select("doc_id", F.explode("_toks").alias("_t"))

    def _marks(words: tuple[str, ...]) -> Column:
        return F.sum(F.when(F.col("_t").isin(*words), 1).otherwise(0))

    marks = tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"),
        _marks(_LANG_MARKERS["en"]).alias("s_en"),
        _marks(_LANG_MARKERS["de"]).alias("s_de"),
        _marks(_LANG_MARKERS["es"]).alias("s_es"),
        _marks(_LANG_MARKERS["fr"]).alias("s_fr"),
    )
    gated = (
        tokf.select("doc_id", "source", "n_chars", "fp")
        .join(marks, "doc_id")
        .filter(
            F.col("n").between(5, 100000)
            & (F.col("s_en") * 5 <= F.col("n") * 3)
            & (F.col("s_en") > 0)
            & (F.col("s_en") >= F.col("s_de"))
            & (F.col("s_en") >= F.col("s_es"))
            & (F.col("s_en") >= F.col("s_fr"))
        )
    )
    exact = gated.withColumn(
        "_min_id", F.min("doc_id").over(Window.partitionBy("fp"))
    ).filter(F.col("doc_id") == F.col("_min_id"))
    # shared shingle sets (doc_shingle_frame semantics, derived from the
    # checkpointed token frame instead of a fresh tokenization);
    # materialized because jaccard_verified_pairs reads it three times
    # (LSH pipeline + both pair sides) and the word_shingles transform
    # is interpreted per evaluation
    sh = (
        tokf.filter(F.size("_toks") >= 3)
        .select(
            "doc_id",
            "source",
            F.array_distinct(word_shingles(F.col("_toks"), 3)).alias("shingles"),
        )
        .localCheckpoint(eager=True)
    )
    near_drops = (
        jaccard_verified_pairs(d, threshold=0.5, shingles=sh.select("doc_id", "shingles"))
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    # Contamination grams read the SAME checkpointed shingle frame (r15,
    # guide §2.3/§2.4): the old shape re-ran the interpreted
    # word_shingles transform over tokf a second time AND paid a full
    # (doc_id, source, gram)-row .distinct() exchange. doc_id is unique,
    # so that distinct is per-doc dedup — already done IN-ROW by sh's
    # array_distinct; docs with < 3 tokens contribute zero grams either
    # way (word_shingles yields an empty array). Same row set, one
    # data-sized exchange and one shingle derivation removed.
    grams = sh.select("doc_id", "source", F.explode("shingles").alias("gram"))
    probe = (
        grams.filter(F.col("source") == "src0").select(F.col("gram").alias("pgram")).distinct()
    )
    contaminated = (
        grams.filter(F.col("source") != "src0")
        .join(F.broadcast(probe), F.col("gram") == F.col("pgram"), "left")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_grams"), F.count("pgram").alias("n_cont"))
        .filter(F.col("n_cont") * 20 > F.col("n_grams"))
        .select("doc_id")
    )
    return (
        exact.filter(F.col("source") != "src0")
        .join(near_drops, "doc_id", "left_anti")
        .join(contaminated, "doc_id", "left_anti")
        .select("doc_id", "source", "n_chars")
    )


@register(
    "corpus_domain_quota_sample",
    oracle=f"""
    SELECT doc_id, source
    FROM documents
    QUALIFY row_number() OVER (
      PARTITION BY source ORDER BY {_SPLIT_BUCKET}, doc_id) <= 50
    """,
    tags=("corpus", "sampling", "quota", "window", "extension"),
)
def corpus_domain_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain quota capping — keep at most 50 docs per source so no
    single domain dominates the training mix (the composition-control
    cousin of stratified sampling: a hard cap instead of a rate).
    Selection order is the deterministic multiplicative doc_id hash
    (pseudorandom but reproducible across engines/partitioning, unlike
    rand(); doc_id tie-break makes the window total-ordered). One
    window over the source key — at 100 TB each domain's rank state is
    bounded per partition, and a pre-aggregated top-51 per (source,
    executor-partition) would AQE-shrink the shuffle further if domain
    skew demanded it."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    bucket = (((F.col("doc_id") % 2147483648) * 2654435761 + 104729) % 4294967296) % 1000
    w = Window.partitionBy("source").orderBy(bucket.asc(), F.col("doc_id").asc())
    return (
        d.select("doc_id", "source", F.row_number().over(w).alias("_rn"))
        .filter(F.col("_rn") <= 50)
        .select("doc_id", "source")
    )


@register(
    "corpus_packed_sequences",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source, text, len({_TOKS}) AS n FROM documents),
    cum AS (
      SELECT doc_id, source, text, n,
             COALESCE(sum(n) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
      FROM t)
    SELECT source, CAST(before // 256 AS BIGINT) AS bin_id,
           count(*) AS n_docs,
           CAST(sum(n) AS BIGINT) AS total_tokens,
           md5(string_agg(text, chr(10) || chr(10) ORDER BY doc_id)) AS packed_md5
    FROM cum GROUP BY source, bin_id
    """,
    tags=("corpus", "packing", "window", "extension"),
)
def corpus_packed_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-sequence ASSEMBLY on top of the bin assignment
    (corpus_pack_token_budget): each ~256-token bin's documents are
    concatenated in doc_id order with a blank-line separator — the
    actual packed sample a trainer would tokenize. Output carries the
    bin's doc count, token total, and the md5 of the packed text (the
    full text stays distributed; only 16-byte digests reach the
    result). The running-count window and the groupBy share the
    source-keyed shuffle; per-bin state is bounded by the token
    budget."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    n = F.size(tokens(F.col("text")))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = d.select(
        "doc_id",
        "source",
        "text",
        n.alias("n"),
        F.coalesce(F.sum(n).over(w), F.lit(0)).alias("before"),
    )
    packed = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("doc_id", "text"))),
            lambda s: s["text"],
        ),
        "\n\n",
    )
    return (
        cum.withColumn("bin_id", F.expr("before div 256"))
        .groupBy("source", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n").cast("bigint").alias("total_tokens"),
            F.md5(packed).alias("packed_md5"),
        )
    )


@register(
    "corpus_shard_assignment",
    oracle="""
    WITH h AS (
      SELECT doc_id, n_chars,
             (((doc_id % 2147483648) * 2654435761 + 104729) % 4294967296) AS mix
      FROM documents)
    SELECT doc_id,
           CAST(mix % 16 AS BIGINT) AS shard,
           CAST(row_number() OVER (PARTITION BY mix % 16 ORDER BY mix, doc_id)
                AS BIGINT) AS pos,
           CAST(sum(n_chars) OVER (PARTITION BY mix % 16 ORDER BY mix, doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum_chars
    FROM h
    """,
    tags=("corpus", "shard", "training", "extension", "scale-path"),
)
def corpus_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle + dataloader shard assignment — the
    last step of a training-data pipeline: every document gets a shard
    (hash mod 16), a position within its shard, and a cumulative byte
    offset, so shard files are reproducible and offset-addressable
    without any central coordinator.

    The shuffle order is the engine-portable multiplicative doc_id hash
    (never ``rand()`` — stable under re-partitioning, retries, and
    engine choice, like corpus_train_split). One exchange keyed by
    shard; the ordering window is bounded by shard size (corpus/N), so
    at 100 TB you raise N_SHARDS, not partition memory."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    mix = ((F.col("doc_id") % F.lit(2147483648)) * F.lit(2654435761) + F.lit(104729)) % F.lit(4294967296)
    h = d.select("doc_id", "n_chars", mix.alias("mix"))
    w = Window.partitionBy(F.col("mix") % 16).orderBy("mix", "doc_id")
    return h.select(
        "doc_id",
        (F.col("mix") % 16).cast("bigint").alias("shard"),
        F.row_number().over(w).cast("bigint").alias("pos"),
        F.sum("n_chars")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("bigint")
        .alias("cum_chars"),
    )


@register(
    "dedup_cluster_components_star",
    oracle=f"""
    WITH RECURSIVE shingled AS ({_SHINGLED}), sig AS ({_SIG}),
    bands AS ({_BANDS}), pairs AS ({_PAIRS}),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM pairs),
    walk(src, dst) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT w.src, e.dst FROM walk w JOIN edges e ON w.dst = e.src),
    comp AS (
      SELECT src AS node, least(src, min(dst)) AS component
      FROM walk GROUP BY src)
    SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component
    FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
    """,
    tags=("dedup", "graph", "large-star", "extension", "scale-path"),
)
def dedup_cluster_components_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters via alternating large-star/small-star
    (operators/graph.connected_components_star) — the O(log n)-round
    form that survives chain-shaped similarity graphs (templated
    corpora), where min-label propagation needs diameter-many rounds.
    Same component contract (min reachable doc_id) and same
    recursive-CTE oracle as dedup_cluster_components, so the driver
    checks both algorithms against identical ground truth."""
    from etl_8million_data__spark.operators.graph import connected_components_star

    d = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_candidate_pairs(d)
    comp = connected_components_star(
        d.select("doc_id"), pairs, node_col="doc_id", src_col="doc_a", dst_col="doc_b"
    )
    return d.select("doc_id").join(
        comp, d.doc_id == comp.node, "left"
    ).select(
        "doc_id", F.coalesce(F.col("component"), F.col("doc_id")).alias("component")
    )


@register(
    "corpus_mixture_epochs",
    oracle="""
    WITH w AS (
      SELECT doc_id, source,
             -- source weight in quarter-units: 2,5,8,11 -> 0.5..2.75 epochs
             2 + (strpos('0123456789abcdef', substr(md5(source), 1, 1)) - 1) % 4 * 3
               AS w_qu,
             (((doc_id % 2147483648) * 2654435761 + 104729) % 4294967296) % 1000 AS bucket
      FROM documents),
    e AS (
      SELECT doc_id, source,
             CAST(w_qu // 4 + CASE WHEN bucket < (w_qu % 4) * 250 THEN 1 ELSE 0 END
                  AS BIGINT) AS epochs
      FROM w)
    SELECT doc_id, source, CAST(u.epoch AS BIGINT) AS epoch
    FROM e, unnest(range(1, epochs + 1)) AS u(epoch)
    """,
    tags=("corpus", "mixture", "training", "extension", "scale-path"),
)
def corpus_mixture_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture resampling with fractional epochs — the source
    weighting step of every pretraining data recipe: a source with
    weight 2.75 repeats each document 2 times and a deterministic 75%
    of them a 3rd time.  Weights derive from md5(source) (quarter-unit
    grid 0.5..2.75) so the query is self-contained; the fractional
    accept is the portable multiplicative doc_id hash against an exact
    integer threshold — no float compare, no rand(), stable under
    retries and engine choice.  Narrow map + explode, no shuffle at
    all; output order is (doc_id, epoch)-keyed for reproducible
    training-order assembly downstream (corpus_shard_assignment)."""
    from etl_8million_data__spark.operators.text import hex_char_val

    d = load_table(spark, sf_dir, "documents")
    w_qu = 2 + (hex_char_val(F.substring(F.md5(F.encode("source", "UTF-8")), 1, 1)) % 4) * 3
    bucket = (((F.col("doc_id") % F.lit(2147483648)) * F.lit(2654435761) + F.lit(104729)) % F.lit(4294967296)) % 1000
    e = d.select(
        "doc_id",
        "source",
        (
            (w_qu / 4).cast("bigint")
            + F.when(bucket < (w_qu % 4) * 250, 1).otherwise(0)
        ).alias("epochs"),
    )
    return (
        e.filter(F.col("epochs") >= 1)
        .select(
            "doc_id",
            "source",
            F.explode(F.sequence(F.lit(1), F.col("epochs"))).alias("epoch"),
        )
        .select("doc_id", "source", F.col("epoch").cast("bigint").alias("epoch"))
    )


def _training_order_oracle() -> str:
    return f"""
    WITH {_surv_ctes()},
    train AS (
      SELECT doc_id, source FROM surv WHERE {_SPLIT_BUCKET} < 900),
    wq AS (
      SELECT doc_id, source,
             2 + (strpos('0123456789abcdef', substr(md5(source), 1, 1)) - 1) % 4 * 3
               AS w_qu,
             (((doc_id % 2147483648) * 2654435761 + 104729) % 4294967296) % 1000 AS bucket
      FROM train),
    ep AS (
      SELECT doc_id, source,
             CAST(w_qu // 4 + CASE WHEN bucket < (w_qu % 4) * 250 THEN 1 ELSE 0 END
                  AS BIGINT) AS epochs
      FROM wq),
    copies AS (
      SELECT doc_id, source, CAST(u.epoch AS BIGINT) AS epoch,
             ((((doc_id % 2147483648) * 131 + u.epoch) % 2147483648) * 2654435761 + 104729) % 4294967296 AS mix
      FROM ep, unnest(range(1, epochs + 1)) AS u(epoch))
    SELECT doc_id, source, epoch,
           CAST(mix % 8 AS BIGINT) AS shard,
           CAST(row_number() OVER (PARTITION BY mix % 8
                                   ORDER BY mix, doc_id, epoch) AS BIGINT) AS pos
    FROM copies
    """


@register(
    "corpus_e2e_training_order",
    oracle=_training_order_oracle(),
    tags=("corpus", "training", "mixture", "shard", "flagship", "extension"),
)
def corpus_e2e_training_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CAPSTONE: curated corpus -> reproducible training order, as one
    declarative plan composing three verified stages:

      1. curation survivors (stages 1-5 of corpus_e2e_curation via the
         shared _survivors builder), restricted to the train split;
      2. mixture weighting with fractional epochs (the
         corpus_mixture_epochs scheme — weight 2.75 = 2 copies + a
         deterministic 75% third copy);
      3. shard assignment over the resulting copies: every (doc, epoch)
         copy hashes to a shard with an in-shard position, so N
         dataloader workers each read one shard sequentially and the
         global training order is fully reproducible with NO central
         shuffler.

    Scale shape: curation as audited in corpus_e2e_curation; mixture is
    a zero-shuffle map + explode; sharding is one exchange keyed by
    shard with windows bounded by shard size. Everything is integer /
    md5 arithmetic — the whole corpus -> training-order path is
    bit-reproducible in DuckDB."""
    surv = _survivors(spark, sf_dir)
    bucket = (((F.col("doc_id") % F.lit(2147483648)) * F.lit(2654435761) + F.lit(104729)) % F.lit(4294967296)) % 1000
    train = surv.filter(bucket < 900).select("doc_id", "source")
    from etl_8million_data__spark.operators.text import hex_char_val

    w_qu = 2 + (hex_char_val(F.substring(F.md5(F.encode("source", "UTF-8")), 1, 1)) % 4) * 3
    ep = train.select(
        "doc_id",
        "source",
        (
            (w_qu / 4).cast("bigint")
            + F.when(bucket < (w_qu % 4) * 250, 1).otherwise(0)
        ).alias("epochs"),
    )
    copies = (
        ep.filter(F.col("epochs") >= 1)
        .select(
            "doc_id",
            "source",
            F.explode(F.sequence(F.lit(1), F.col("epochs"))).alias("epoch"),
        )
        .select(
            "doc_id",
            "source",
            F.col("epoch").cast("bigint").alias("epoch"),
            (
                (
                    (((F.col("doc_id") % 2147483648) * 131 + F.col("epoch")) % 2147483648) * F.lit(2654435761)
                    + F.lit(104729)
                )
                % F.lit(4294967296)
            ).alias("mix"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy(F.col("mix") % 8).orderBy("mix", "doc_id", "epoch")
    return copies.select(
        "doc_id",
        "source",
        "epoch",
        (F.col("mix") % 8).cast("bigint").alias("shard"),
        F.row_number().over(w).cast("bigint").alias("pos"),
    )


@register(
    "corpus_ngram_novelty",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    g AS (
      SELECT DISTINCT doc_id,
             md5(array_to_string(toks[u.i : u.i + 2], ' ')) AS gk
      FROM t, unnest(generate_series(1, greatest(len(toks) - 2, 0))) AS u(i)),
    f AS (SELECT gk, min(doc_id) AS first_doc FROM g GROUP BY gk)
    SELECT g.doc_id,
           count(*) AS n_grams,
           CAST(sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END) AS BIGINT)
             AS n_novel,
           CAST(sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*) AS novel_frac
    FROM g JOIN f USING (gk)
    GROUP BY g.doc_id
    """,
    tags=("corpus", "novelty", "dedup", "extension", "scale-path"),
)
def corpus_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document novelty: the fraction of a document's distinct
    3-grams whose FIRST corpus occurrence (minimum doc_id) is this
    document — the freshness signal dedup-aware samplers weight by
    (late boilerplate scores near 0, original content near 1).  Docs
    with fewer than 3 tokens have no grams and are omitted.

    Scale: grams are md5-hashed before any exchange; first-occurrence
    is a groupBy-min (map-side partials absorb hot grams) and the
    attribution join is co-partitioned on the same key."""
    d = load_table(spark, sf_dir, "documents")
    g = (
        spread(d, "doc_id")
        .select("doc_id", tokens(F.col("text")).alias("_toks"))
        .select(
            "doc_id",
            F.explode(word_shingles(F.col("_toks"), 3)).alias("gram"),
        )
        .select("doc_id", F.md5(F.encode("gram", "UTF-8")).alias("gk"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    f = g.groupBy("gk").agg(F.min("doc_id").alias("first_doc"))
    return (
        g.join(f, "gk")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_novel"),
            (
                F.sum(
                    F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
                ).cast("double")
                / F.count(F.lit(1))
            ).alias("novel_frac"),
        )
    )


@register(
    "corpus_lm_fluency_scores",
    oracle=f"""
    WITH tr AS (
      SELECT doc_id, {_TOKS} AS toks FROM documents
      WHERE (((doc_id % 2147483648) * 2654435761 + 104729) % 4294967296) % 1000 < 100),
    v AS (
      SELECT count(DISTINCT w) AS V
      FROM (SELECT unnest(toks) AS w FROM tr)),
    trbg AS (
      SELECT toks[u.i] AS w1, toks[u.i + 1] AS w2
      FROM tr, unnest(generate_series(1, len(toks) - 1)) AS u(i)
      WHERE len(toks) >= 2),
    c12 AS (SELECT w1, w2, count(*) AS c12 FROM trbg GROUP BY w1, w2),
    c1 AS (SELECT w1, count(*) AS c1 FROM trbg GROUP BY w1),
    d AS (
      SELECT doc_id, {_TOKS} AS toks FROM documents
      WHERE len({_TOKS}) >= 2),
    dbg AS (
      SELECT doc_id, toks[u.i] AS w1, toks[u.i + 1] AS w2
      FROM d, unnest(generate_series(1, len(toks) - 1)) AS u(i)),
    scored AS (
      SELECT dbg.doc_id,
             (1000000 * (coalesce(c12.c12, 0) + 1))
               // (coalesce(c1.c1, 0) + v.V) AS p_micro,
             CASE WHEN c12.c12 IS NULL THEN 1 ELSE 0 END AS novel
      FROM dbg
      LEFT JOIN c12 ON c12.w1 = dbg.w1 AND c12.w2 = dbg.w2
      LEFT JOIN c1 ON c1.w1 = dbg.w1
      CROSS JOIN v)
    SELECT doc_id,
           count(*) AS n_bigrams,
           CAST(sum(p_micro) AS BIGINT) AS sum_p_micro,
           CAST(sum(p_micro) AS DOUBLE) / (1000000.0 * count(*)) AS mean_prob,
           CAST(sum(novel) AS BIGINT) AS novel_bigrams
    FROM scored GROUP BY doc_id
    """,
    tags=("corpus", "quality", "lm", "extension", "scale-path"),
)
def corpus_lm_fluency_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LM-based fluency scoring (the CCNet/Gopher perplexity-filter
    shape): train a token-bigram language model on a deterministic 10%
    key-hash sample of the corpus, then score EVERY document by its
    add-1-smoothed bigram probabilities under that model — low scores
    flag disfluent/boilerplate/mis-tokenized text, high novel_bigrams
    flags out-of-domain content.

    Exactness: probabilities are exact count ratios, kept in integer
    micro fixed-point (floor(1e6*(c12+1)/(c1+V))) and averaged
    arithmetically — deliberately NO log/perplexity in the oracle-gated
    form, because log's last-ulp differs across engines; a deployment
    takes log of the same ratios downstream.  Every intermediate is
    integer, so the result is bit-identical in DuckDB.

    Scale shape: the model is two hash aggregates over the SAMPLE's
    bigram stream (bounded by sample_permille); scoring is two
    equi-joins of the corpus bigram stream against the model keyed on
    token(s) — shuffle joins that AQE converts to broadcast when the
    model fits, with skew-join splitting for stopword-headed keys — and
    one final doc_id aggregate.  No all-pairs stage, no collect."""
    from etl_8million_data__spark.operators.partitioning import (
        portable_hash_permille,
    )

    d0 = load_table(spark, sf_dir, "documents")
    docs = d0.select("doc_id", tokens(F.col("text")).alias("toks"))

    def bigrams(df: DataFrame) -> DataFrame:
        n = F.size("toks")
        return df.filter(n >= 2).select(
            "doc_id",
            F.explode(
                F.zip_with(
                    F.slice(F.col("toks"), 1, n - 1),
                    F.slice(F.col("toks"), 2, n - 1),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                )
            ).alias("b"),
        ).select("doc_id", "b.w1", "b.w2")

    train = docs.filter(portable_hash_permille(F.col("doc_id")) < 100)
    vdf = train.select(F.explode("toks").alias("w")).agg(
        F.count_distinct("w").alias("V")
    )
    trbg = bigrams(train).localCheckpoint(eager=True)
    c12 = trbg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = trbg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))

    scored = (
        bigrams(docs)
        .join(c12, ["w1", "w2"], "left")
        .join(c1, ["w1"], "left")
        .crossJoin(F.broadcast(vdf))
        .select(
            "doc_id",
            F.expr(
                "(1000000 * (coalesce(c12, 0) + 1)) div (coalesce(c1, 0) + V)"
            ).alias("p_micro"),
            F.when(F.col("c12").isNull(), 1).otherwise(0).alias("novel"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("p_micro").cast("bigint").alias("sum_p_micro"),
        (F.sum("p_micro").cast("double") / (1000000.0 * F.count(F.lit(1)))).alias(
            "mean_prob"
        ),
        F.sum("novel").cast("bigint").alias("novel_bigrams"),
    )


@register(
    "corpus_split_drift",
    oracle=f"""
    WITH m AS (
      SELECT CASE WHEN {_SPLIT_BUCKET} < 900 THEN 'train' ELSE 'heldout' END
               AS split,
             least(CAST((10 * length(regexp_replace({_NORM}, '[^a-z]', '', 'g')))
                        // length({_NORM}) AS INT), 9) AS decile
      FROM documents
      WHERE length({_NORM}) > 0),
    h AS (
      SELECT split, decile, count(*) AS n
      FROM m GROUP BY split, decile),
    tot AS (SELECT split, sum(n) AS nt FROM h GROUP BY split),
    g AS (SELECT CAST(unnest(range(10)) AS INT) AS decile),
    p AS (
      SELECT g.decile,
             coalesce(max(CASE WHEN h.split = 'train' THEN h.n END), 0) AS n_train,
             coalesce(max(CASE WHEN h.split = 'heldout' THEN h.n END), 0) AS n_heldout
      FROM g LEFT JOIN h ON h.decile = g.decile
      GROUP BY g.decile),
    t AS (SELECT max(CASE WHEN split = 'train' THEN nt END) AS t_train,
                 max(CASE WHEN split = 'heldout' THEN nt END) AS t_heldout
          FROM tot)
    SELECT p.decile,
           CAST(p.n_train AS BIGINT) AS n_train,
           CAST(p.n_heldout AS BIGINT) AS n_heldout,
           CAST(p.n_train AS DOUBLE) / t.t_train AS frac_train,
           CAST(p.n_heldout AS DOUBLE) / t.t_heldout AS frac_heldout,
           abs(CAST(p.n_train AS DOUBLE) / t.t_train
               - CAST(p.n_heldout AS DOUBLE) / t.t_heldout) AS abs_drift
    FROM p CROSS JOIN t
    """,
    tags=("corpus", "drift", "split", "monitoring", "extension"),
)
def corpus_split_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-drift monitor: compare the alpha-ratio DECILE distribution
    of the train split against the heldout split (val+test) — the
    sanity check that the deterministic hash split didn't correlate
    with a quality axis (and, run over two ingest snapshots, the drift
    alarm for a changing crawl mix). Deciles are exact integer
    arithmetic (10*clean_chars // chars, capped at 9); proportions are
    single divisions of exact counts, so the per-decile abs-drift is
    bit-identical in DuckDB. Two hash aggregates + a broadcast 10-row
    grid — one corpus scan."""
    d = load_table(spark, sf_dir, "documents")
    norm = F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
    bucket = (
        ((F.col("doc_id") % 2147483648) * 2654435761 + 104729) % 4294967296
    ) % 1000
    decile = F.least(
        F.floor(
            (10 * F.length(F.regexp_replace(norm, "[^a-z]", ""))) / F.length(norm)
        ).cast("int"),
        F.lit(9),
    )
    m = d.filter(F.length(norm) > 0).select(
        # emptiness guard: a whitespace-only doc would divide by
        # length(norm)=0 — a crash under ANSI mode here, a silent NULL
        # decile in DuckDB. Excluded identically on both sides.
        F.when(bucket < 900, "train").otherwise("heldout").alias("split"),
        decile.alias("decile"),
    )
    h = m.groupBy("split", "decile").agg(F.count(F.lit(1)).alias("n"))
    tot = h.groupBy("split").agg(F.sum("n").alias("nt"))
    grid = spark.range(10).select(F.col("id").cast("int").alias("decile"))
    p = (
        grid.join(h, "decile", "left")
        .groupBy("decile")
        .agg(
            F.coalesce(
                F.max(F.when(F.col("split") == "train", F.col("n"))), F.lit(0)
            ).alias("n_train"),
            F.coalesce(
                F.max(F.when(F.col("split") == "heldout", F.col("n"))), F.lit(0)
            ).alias("n_heldout"),
        )
    )
    t = tot.agg(
        F.max(F.when(F.col("split") == "train", F.col("nt"))).alias("t_train"),
        F.max(F.when(F.col("split") == "heldout", F.col("nt"))).alias("t_heldout"),
    )
    ft = F.col("n_train").cast("double") / F.col("t_train")
    fh = F.col("n_heldout").cast("double") / F.col("t_heldout")
    return p.crossJoin(F.broadcast(t)).select(
        "decile",
        F.col("n_train").cast("bigint").alias("n_train"),
        F.col("n_heldout").cast("bigint").alias("n_heldout"),
        ft.alias("frac_train"),
        fh.alias("frac_heldout"),
        F.abs(ft - fh).alias("abs_drift"),
    )


# Shared SQL: per-doc cluster membership from the LSH similarity graph
# (transitive closure of the band-collision pair set; singletons map to
# themselves). Reused by the quality-keeper and soft-dedup queries.
_MEMBERSHIP = f"""
    WITH RECURSIVE shingled AS ({_SHINGLED}), sig AS ({_SIG}),
    bands AS ({_BANDS}), pairs AS ({_PAIRS}),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM pairs),
    walk(src, dst) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT w.src, e.dst FROM walk w JOIN edges e ON w.dst = e.src),
    comp AS (
      SELECT src AS node, least(src, min(dst)) AS component
      FROM walk GROUP BY src),
    membership AS (
      SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component,
             len({_TOKS}) AS n_tokens
      FROM documents d LEFT JOIN comp c ON c.node = d.doc_id)
"""


def _cluster_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, component, n_tokens) for every document: LSH candidate
    pairs -> connected components (min-label propagation), singletons =
    their own component. One tokenization feeds both the shingle/LSH
    path (inside minhash_lsh_candidate_pairs) and the n_tokens quality
    signal."""
    d = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_candidate_pairs(d)
    comp = connected_components(
        d.select("doc_id"), pairs, node_col="doc_id", src_col="doc_a", dst_col="doc_b"
    )
    toks = spread(d, "doc_id").select(
        "doc_id", F.size(tokens(F.col("text"))).alias("n_tokens")
    )
    return (
        toks.join(comp, toks.doc_id == comp.node, "left")
        .select(
            "doc_id",
            F.coalesce(F.col("component"), F.col("doc_id")).alias("component"),
            "n_tokens",
        )
    )


@register(
    "dedup_cluster_quality_keepers",
    oracle=f"""
    {_MEMBERSHIP}
    SELECT component, doc_id AS keeper_doc_id, n_tokens AS keeper_n_tokens,
           cluster_size
    FROM (
      SELECT doc_id, component, n_tokens,
             count(*) OVER (PARTITION BY component) AS cluster_size,
             row_number() OVER (PARTITION BY component
                                ORDER BY n_tokens DESC, doc_id) AS rn
      FROM membership)
    WHERE rn = 1
    """,
    tags=("dedup", "graph", "quality", "extension"),
)
def dedup_cluster_quality_keepers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware keeper selection: near-dup clusters (LSH pairs ->
    connected components) keep their HIGHEST-QUALITY member, not the
    min-id one — the production dedup policy (drop boilerplate copies,
    keep the longest/cleanest variant). Quality = exact token count;
    tie-break on doc_id keeps the pick total-ordered. Per-cluster argmax
    is one row_number window partitioned by component — cluster sizes
    are tiny cliques, so no skewed window at 100 TB."""
    m = _cluster_membership(spark, sf_dir)
    from pyspark.sql import Window

    w = Window.partitionBy("component").orderBy(F.desc("n_tokens"), F.asc("doc_id"))
    cs = Window.partitionBy("component")
    return (
        m.withColumn("cluster_size", F.count(F.lit(1)).over(cs))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "component",
            F.col("doc_id").alias("keeper_doc_id"),
            F.col("n_tokens").alias("keeper_n_tokens"),
            "cluster_size",
        )
    )


@register(
    "corpus_soft_dedup_weights",
    oracle=f"""
    {_MEMBERSHIP}
    SELECT doc_id, component,
           count(*) OVER (PARTITION BY component) AS cluster_size,
           1.0 / count(*) OVER (PARTITION BY component) AS sample_weight
    FROM membership
    """,
    tags=("dedup", "sampling", "extension"),
)
def corpus_soft_dedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft dedup: instead of dropping near-duplicates, every document
    gets sampling weight 1/cluster_size so each duplicate *cluster*
    contributes one document's worth of probability mass to training
    (the soft-dedup/RHO-style alternative to hard removal — keeps rare
    in-cluster variation available while removing the frequency bias).
    The weight is a single division of an exact integer — IEEE-identical
    in both engines."""
    m = _cluster_membership(spark, sf_dir)
    from pyspark.sql import Window

    cs = F.count(F.lit(1)).over(Window.partitionBy("component"))
    return m.select(
        "doc_id",
        "component",
        cs.alias("cluster_size"),
        (F.lit(1.0) / cs).alias("sample_weight"),
    )


@register(
    "corpus_split_leakage",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_SPLIT_BUCKET} AS bucket, {_TOKS} AS toks
               FROM documents),
    g AS (
      SELECT doc_id,
             CASE WHEN bucket < 900 THEN 'train' ELSE 'heldout' END AS split,
             unnest(list_distinct(list_transform(range(len(toks) - 2),
                    i -> array_to_string(toks[i+1:i+3], ' ')))) AS gram
      FROM t WHERE len(toks) >= 3),
    tr AS (SELECT DISTINCT gram FROM g WHERE split = 'train'),
    he AS (SELECT doc_id, gram FROM g WHERE split = 'heldout')
    SELECT he.doc_id,
           count(*) AS n_grams,
           CAST(count(tr.gram) AS BIGINT) AS n_leaked,
           count(tr.gram) * 1.0 / count(*) AS leak_ratio
    FROM he LEFT JOIN tr ON he.gram = tr.gram
    GROUP BY he.doc_id
    """,
    tags=("corpus", "split", "contamination", "extension"),
)
def corpus_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train->eval leakage audit AFTER the deterministic split: for each
    heldout document, the fraction of its distinct word-3-grams that
    also appear in any train document. Complements
    corpus_benchmark_contamination (external benchmark) with the
    internal split-boundary check — near-dup pairs that straddle the
    hash split are exactly what this surfaces. The gram-gram join is
    co-partitioned by gram (the standard decontamination shuffle); no
    broadcast of anything corpus-sized."""
    d = load_table(spark, sf_dir, "documents")
    bucket = ((F.col("doc_id") % 2147483648) * 2654435761 + 104729) % 4294967296 % 1000
    t = (
        spread(d, "doc_id")
        .select(
            "doc_id",
            F.when(bucket < 900, "train").otherwise("heldout").alias("split"),
            tokens(F.col("text")).alias("toks"),
        )
        .filter(F.size("toks") >= 3)
    )
    g = t.select(
        "doc_id",
        "split",
        F.explode(F.array_distinct(word_shingles(F.col("toks"), 3))).alias("gram"),
    )
    tr = g.filter(F.col("split") == "train").select("gram").distinct()
    he = g.filter(F.col("split") == "heldout").select("doc_id", "gram")
    hit = F.sum(F.when(F.col("_hit").isNotNull(), 1).otherwise(0))
    return (
        he.join(tr.withColumn("_hit", F.lit(1)), "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            hit.cast("bigint").alias("n_leaked"),
            (hit * 1.0 / F.count(F.lit(1))).alias("leak_ratio"),
        )
    )


def hashed_doc_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, feats array<bigint>) — the 16-dim signed feature-hash
    vector per document (see :func:`text_feature_hashing`). Exposed so
    downstream similarity queries can search documents by content with
    no model: the array plugs straight into the kNN / LSH / IVF
    operators."""
    from etl_8million_data__spark.operators.text import hex_char_val, md5_utf8

    d = load_table(spark, sf_dir, "documents")
    tok = spread(d, "doc_id").select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("token")
    )
    h = md5_utf8(F.col("token"))
    bucket = hex_char_val(F.substring(h, 1, 1)).cast("int")
    sgn = F.when(hex_char_val(F.substring(h, 2, 1)) % 2 == 0, F.lit(1)).otherwise(
        F.lit(-1)
    )
    agg = (
        tok.select("doc_id", bucket.alias("bucket"), sgn.alias("sgn"))
        .groupBy("doc_id", "bucket")
        .agg(F.sum("sgn").alias("v"))
    )
    dense = agg.groupBy("doc_id").agg(
        F.map_from_entries(F.collect_list(F.struct("bucket", "v"))).alias("m")
    )
    feats = F.transform(
        F.sequence(F.lit(0), F.lit(15)),
        lambda b: F.coalesce(F.element_at(F.col("m"), b), F.lit(0).cast("bigint")),
    )
    return dense.select("doc_id", feats.alias("feats"))


@register(
    "text_feature_hashing",
    oracle=f"""
    WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS token FROM documents),
    h AS (
      SELECT doc_id,
             strpos('0123456789abcdef', md5(token)[1:1]) - 1 AS bucket,
             CASE WHEN (strpos('0123456789abcdef', md5(token)[2:2]) - 1) % 2 = 0
                  THEN 1 ELSE -1 END AS sgn
      FROM tok),
    agg AS (SELECT doc_id, bucket, CAST(sum(sgn) AS BIGINT) AS v
            FROM h GROUP BY doc_id, bucket),
    grid AS (SELECT unnest(range(16)) AS bucket),
    dense AS (
      SELECT d.doc_id, g.bucket, coalesce(a.v, 0) AS v
      FROM (SELECT DISTINCT doc_id FROM documents) d
      CROSS JOIN grid g
      LEFT JOIN agg a ON a.doc_id = d.doc_id AND a.bucket = g.bucket)
    SELECT doc_id,
           array_to_string(list(v ORDER BY bucket), ',') AS fh_csv,
           CAST(sum(v * v) AS BIGINT) AS norm2_int
    FROM dense GROUP BY doc_id
    """,
    tags=("text", "embedding", "hashing", "extension"),
)
def text_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-free document embeddings via signed feature hashing
    (hashing trick): each token hashes to one of 16 buckets
    (md5 hex char 1) with a ±1 sign (md5 hex char 2 parity); a doc's
    vector is the per-bucket signed occurrence sum. Gives every
    document a fixed-dim integer vector with no vocabulary, no model,
    and no driver state — the cheap embedding that feeds the existing
    kNN / LSH / centroid machinery when no learned encoder is
    available. Shape at scale: explode -> one hash aggregate keyed
    (doc_id, bucket) -> per-doc map assembly; integers end to end, so
    the vector (CSV form) and its squared norm hash identically in both
    engines."""
    vecs = hashed_doc_vectors(spark, sf_dir)
    return vecs.select(
        "doc_id",
        F.array_join(
            F.transform(F.col("feats"), lambda v: v.cast("string")), ","
        ).alias("fh_csv"),
        F.aggregate(
            F.col("feats"), F.lit(0).cast("bigint"), lambda acc, v: acc + v * v
        ).alias("norm2_int"),
    )


@register(
    "corpus_bigram_collocations",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents
               WHERE len({_TOKS}) >= 2),
    bg AS (
      SELECT unnest(list_transform(range(len(toks) - 1),
                    i -> toks[i+1] || ' ' || toks[i+2])) AS bigram
      FROM t),
    uni AS (
      SELECT unnest({_TOKS}) AS token FROM documents),
    nb AS (SELECT bigram, count(*) AS n_ab FROM bg GROUP BY bigram),
    nu AS (SELECT token, count(*) AS n_tok FROM uni GROUP BY token),
    tot AS (SELECT count(*) AS n_total FROM uni)
    SELECT bigram, n_ab, a.n_tok AS n_first, b.n_tok AS n_second,
           n_ab * n_total * 1.0 / (a.n_tok * b.n_tok) AS pmi_ratio
    FROM nb
    JOIN nu a ON a.token = string_split(bigram, ' ')[1]
    JOIN nu b ON b.token = string_split(bigram, ' ')[2]
    CROSS JOIN tot
    WHERE n_ab >= 5
    ORDER BY pmi_ratio DESC, bigram LIMIT 100
    """,
    tags=("text", "corpus", "collocation", "extension"),
)
def corpus_bigram_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation extraction: top-100 adjacent-token bigrams by a
    PMI-style lift ratio n_ab * N / (n_a * n_b) — the phrase-detection
    signal a tokenizer/vocab build runs over the corpus. The ratio is a
    SINGLE division of exact integers (log-free, like the tfidf
    salience), so the ranking hashes identically in both engines; a
    min-support gate (n_ab >= 5) keeps the output statistical, and the
    final top-k is a TakeOrderedAndProject with a total-order
    tie-break. Shape at scale: two token-keyed hash aggregates + an
    unhinted join of bigram counts against unigram counts (vocabulary-
    sized, not corpus-sized)."""
    d = load_table(spark, sf_dir, "documents")
    tokf = spread(d, "doc_id").select("doc_id", tokens(F.col("text")).alias("toks"))
    n = F.size("toks")
    bigrams = F.zip_with(
        F.slice(F.col("toks"), 1, n - 1),
        F.slice(F.col("toks"), 2, n - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    bg = tokf.filter(n >= 2).select(F.explode(bigrams).alias("bigram"))
    uni = tokf.select(F.explode("toks").alias("token"))
    nb = bg.groupBy("bigram").agg(F.count(F.lit(1)).alias("n_ab"))
    nu = uni.groupBy("token").agg(F.count(F.lit(1)).alias("n_tok"))
    tot = uni.agg(F.count(F.lit(1)).alias("n_total"))
    first = F.split(F.col("bigram"), " ").getItem(0)
    second = F.split(F.col("bigram"), " ").getItem(1)
    a = nu.select(F.col("token").alias("_ta"), F.col("n_tok").alias("n_first"))
    b = nu.select(F.col("token").alias("_tb"), F.col("n_tok").alias("n_second"))
    return (
        nb.filter(F.col("n_ab") >= 5)
        .join(a, first == F.col("_ta"))
        .join(b, second == F.col("_tb"))
        .crossJoin(F.broadcast(tot))
        .select(
            "bigram",
            "n_ab",
            "n_first",
            "n_second",
            (
                F.col("n_ab") * F.col("n_total") * 1.0
                / (F.col("n_first") * F.col("n_second"))
            ).alias("pmi_ratio"),
        )
        .orderBy(F.desc("pmi_ratio"), F.asc("bigram"))
        .limit(100)
    )


@register(
    "similarity_doc_knn_hashed",
    oracle=f"""
    WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS token FROM documents),
    h AS (
      SELECT doc_id,
             strpos('0123456789abcdef', md5(token)[1:1]) - 1 AS bucket,
             CASE WHEN (strpos('0123456789abcdef', md5(token)[2:2]) - 1) % 2 = 0
                  THEN 1 ELSE -1 END AS sgn
      FROM tok),
    agg AS (SELECT doc_id, bucket, CAST(sum(sgn) AS BIGINT) AS v
            FROM h GROUP BY doc_id, bucket),
    grid AS (SELECT unnest(range(16)) AS bucket),
    dense AS (
      SELECT d.doc_id, g.bucket, coalesce(a.v, 0) AS v
      FROM (SELECT DISTINCT doc_id FROM documents) d
      CROSS JOIN grid g
      LEFT JOIN agg a ON a.doc_id = d.doc_id AND a.bucket = g.bucket),
    vecs AS (
      SELECT doc_id, list(v ORDER BY bucket) AS fv, sum(v * v) AS n2
      FROM dense GROUP BY doc_id),
    e AS (SELECT doc_id, fv, n2 FROM vecs WHERE n2 > 0),
    q AS (SELECT doc_id AS query_id, fv AS qv, n2 AS qn2
          FROM e WHERE doc_id % 25 = 0),
    scored AS (
      SELECT q.query_id, e.doc_id,
             list_reduce(list_prepend(0.0, list_transform(range(16),
               i -> q.qv[i+1]::DOUBLE * e.fv[i+1]::DOUBLE)), (acc, x) -> acc + x)
               / (sqrt(q.qn2) * sqrt(e.n2)) AS cosine
      FROM q JOIN e ON e.doc_id <> q.query_id)
    SELECT query_id, doc_id, cosine, rn
    FROM (SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, doc_id) AS rn
          FROM scored)
    WHERE rn <= 3
    """,
    tags=("similarity", "text", "knn", "extension", "correctness-baseline"),
)
def similarity_doc_knn_hashed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document search with NO model: exact cosine top-3 neighbors per
    query document over the 16-dim hashed-BoW vectors — the composed
    text -> vector -> kNN path entirely inside the engine (feature
    hashing feeds the same kNN operator the embeddings table uses).
    Size-guarded correctness baseline: the scoring join is
    |Q|x|N| = n^2/25; beyond the guard, route the same vectors through
    knn_ivf / the persisted ANN index (pytest asserts recall@3 of the
    IVF twin on these vectors). Zero vectors (sign-cancelled docs) are
    excluded on both sides — cosine is undefined there."""
    from etl_8million_data__spark.operators.similarity import (
        assert_baseline_scale,
        knn_bruteforce,
    )

    vecs = hashed_doc_vectors(spark, sf_dir)
    assert_baseline_scale(
        vecs, 200_000, "similarity_doc_knn_hashed", "knn_ivf over hashed_doc_vectors"
    )
    nz = vecs.filter(
        F.aggregate(F.col("feats"), F.lit(0).cast("bigint"), lambda a, v: a + v * v)
        > 0
    )
    q = nz.filter(F.col("doc_id") % 25 == 0).select(
        F.col("doc_id").alias("query_id"), F.col("feats").alias("query_vec")
    )
    return knn_bruteforce(
        nz, q, k=3, id_col="doc_id", vec_col="feats"
    ).select(
        F.col("query_id"),
        F.col("vec_id").alias("doc_id"),
        "cosine",
        "rn",
    )


@register(
    "corpus_soft_dedup_draw",
    oracle=f"""
    {_MEMBERSHIP}
    SELECT doc_id, component, cluster_size
    FROM (
      SELECT doc_id, component,
             count(*) OVER (PARTITION BY component) AS cluster_size
      FROM membership)
    WHERE (((doc_id % 2147483648) * 2654435761 + 104729) % 4294967296)
          % cluster_size = 0
    """,
    tags=("dedup", "sampling", "extension"),
)
def corpus_soft_dedup_draw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One deterministic DRAW from the soft-dedup distribution: doc d
    survives iff mix_hash(doc_id) % cluster_size == 0 — acceptance
    probability exactly 1/cluster_size with NO floats, no rand(), and
    no per-cluster coordination (each row decides locally from its own
    id and its cluster's size), so each duplicate cluster contributes
    ~one document per epoch while singletons always survive. Re-keying
    the hash (salt the multiplier) yields independent epoch draws. The
    integer acceptance predicate is bit-identical in both engines."""
    m = _cluster_membership(spark, sf_dir)
    from pyspark.sql import Window

    cs = F.count(F.lit(1)).over(Window.partitionBy("component"))
    mix = ((F.col("doc_id") % 2147483648) * 2654435761 + 104729) % 4294967296
    return (
        m.select("doc_id", "component", cs.alias("cluster_size"))
        .filter(mix % F.col("cluster_size") == 0)
        .select("doc_id", "component", "cluster_size")
    )


@register(
    "corpus_sliding_chunks",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    s AS (SELECT doc_id, toks, len(toks) AS n FROM t),
    c AS (
      SELECT doc_id, n, CAST(u.i AS BIGINT) AS chunk_no, u.i * 64 AS start_tok,
             toks[u.i * 64 + 1 : u.i * 64 + 128] AS chunk
      FROM s, unnest(range((n - 1) // 64 + 1)) AS u(i))
    SELECT doc_id, chunk_no, start_tok,
           len(chunk) AS n_tok_chunk,
           md5(array_to_string(chunk, ' ')) AS chunk_md5
    FROM c
    """,
    tags=("corpus", "chunking", "extension"),
)
def corpus_sliding_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping sliding-window chunking — the retrieval/pretraining
    chunker: 128-token windows every 64 tokens (50% overlap), each
    chunk carrying its document offset and content fingerprint so
    downstream dedup/packing/retrieval can address spans stably. The
    complement of corpus_content_defined_chunks (hash-boundary CDC):
    fixed geometry, insertion-UNstable but offset-addressable. Pure
    narrow work per document (sequence -> explode -> slice) — the only
    shuffle is the initial spread."""
    d = load_table(spark, sf_dir, "documents")
    t = spread(d, "doc_id").select("doc_id", tokens(F.col("text")).alias("toks"))
    n = F.size("toks")
    c = t.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.floor((n - F.lit(1)) / F.lit(64)).cast("int"))
        ).alias("chunk_no"),
        F.col("toks"),
    ).select(
        "doc_id",
        F.col("chunk_no").cast("bigint").alias("chunk_no"),
        (F.col("chunk_no") * 64).cast("bigint").alias("start_tok"),
        F.slice(F.col("toks"), F.col("chunk_no") * 64 + 1, 128).alias("chunk"),
    )
    return c.select(
        "doc_id",
        "chunk_no",
        "start_tok",
        F.size("chunk").alias("n_tok_chunk"),
        F.md5(F.encode(F.array_join(F.col("chunk"), " "), "UTF-8")).alias("chunk_md5"),
    )


# Hybrid retrieval: the two channels ranked with the identical
# (score DESC, id) total order the kNN baselines use, fused with pure
# integers.  Lexical = exact cosine over the 16-dim hashed-BoW vectors
# (text channel, no model); semantic = exact cosine over the embedding
# column; both restricted to the ids present in BOTH modalities.
_HYBRID_DOT = (
    "list_reduce(list_prepend(0.0, list_transform(range(len({a})), "
    "i -> {a}[i+1]::DOUBLE * {b}[i+1]::DOUBLE)), (acc, x) -> acc + x)"
)


def _hybrid_channels(spark: SparkSession, sf_dir: str, guard_name: str):
    """The two size-guarded brute-force retrieval channels shared by the
    rank-fusion queries: lexical top-10 by exact cosine over the 16-dim
    hashed-BoW vectors, semantic top-10 over the embedding column —
    returned as (lex(query_id, doc_id, rn_lex), sem(..., rn_sem))."""
    from etl_8million_data__spark.operators.similarity import (
        assert_baseline_scale,
        knn_bruteforce,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    cids = emb.select(F.col("vec_id").alias("doc_id")).distinct().join(
        docs.select("doc_id").distinct(), "doc_id"
    )

    lvecs = hashed_doc_vectors(spark, sf_dir).join(cids, "doc_id")
    n2i = F.lit(0).cast("bigint")
    for _i in range(16):  # unrolled 16-dim int fold (codegen; HOFs interpret)
        n2i = n2i + F.col("feats")[_i] * F.col("feats")[_i]
    # one (id, 16-int vector) row per doc — materialize each channel's
    # corpus frame once; unchecked, the hashing/intersection pipeline
    # re-derives for the corpus side, the query side, and the size
    # guard (24 parquet scans in the unchecked plan, 0 after).
    le = lvecs.filter(n2i > 0).localCheckpoint(eager=True)
    assert_baseline_scale(
        le,
        200_000,
        guard_name,
        "persisted ANN index / knn_ivf on each channel, fusion unchanged",
    )
    lq = le.filter(F.col("doc_id") % 25 == 0).select(
        F.col("doc_id").alias("query_id"), F.col("feats").alias("query_vec")
    )
    lex = knn_bruteforce(le, lq, k=10, id_col="doc_id", vec_col="feats").select(
        "query_id", F.col("vec_id").alias("doc_id"), F.col("rn").alias("rn_lex")
    )

    se = emb.join(
        cids.select(F.col("doc_id").alias("vec_id")), "vec_id"
    ).localCheckpoint(eager=True)
    sq = se.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    sem = knn_bruteforce(se, sq, k=10).select(
        "query_id", F.col("vec_id").alias("doc_id"), F.col("rn").alias("rn_sem")
    )
    return lex, sem


_HYBRID_CHANNELS_SQL = f"""cids AS (
      SELECT d.doc_id
      FROM (SELECT DISTINCT doc_id FROM documents) d
      JOIN (SELECT DISTINCT vec_id FROM embeddings) v ON v.vec_id = d.doc_id),
    tok AS (SELECT doc_id, unnest({_TOKS}) AS token
            FROM documents WHERE doc_id IN (SELECT doc_id FROM cids)),
    h AS (
      SELECT doc_id,
             strpos('0123456789abcdef', md5(token)[1:1]) - 1 AS bucket,
             CASE WHEN (strpos('0123456789abcdef', md5(token)[2:2]) - 1) % 2 = 0
                  THEN 1 ELSE -1 END AS sgn
      FROM tok),
    agg AS (SELECT doc_id, bucket, CAST(sum(sgn) AS BIGINT) AS v
            FROM h GROUP BY doc_id, bucket),
    grid AS (SELECT unnest(range(16)) AS bucket),
    dense AS (
      SELECT c.doc_id, g.bucket, coalesce(a.v, 0) AS v
      FROM cids c CROSS JOIN grid g
      LEFT JOIN agg a ON a.doc_id = c.doc_id AND a.bucket = g.bucket),
    lvecs AS (
      SELECT doc_id, list(v ORDER BY bucket) AS fv, sum(v * v) AS n2
      FROM dense GROUP BY doc_id),
    le AS (SELECT doc_id, fv, n2 FROM lvecs WHERE n2 > 0),
    lq AS (SELECT doc_id AS query_id, fv AS qv, n2 AS qn2
           FROM le WHERE doc_id % 25 = 0),
    lex_scored AS (
      SELECT q.query_id, e.doc_id,
             {_HYBRID_DOT.format(a='q.qv', b='e.fv')}
               / (sqrt(q.qn2) * sqrt(e.n2)) AS cosine
      FROM lq q JOIN le e ON e.doc_id <> q.query_id),
    lex AS (
      SELECT query_id, doc_id, rn AS rn_lex
      FROM (SELECT *, row_number() OVER (
              PARTITION BY query_id ORDER BY cosine DESC, doc_id) AS rn
            FROM lex_scored)
      WHERE rn <= 10),
    se AS (
      SELECT vec_id, embedding,
             {_HYBRID_DOT.format(a='embedding', b='embedding')} AS n2
      FROM embeddings WHERE vec_id IN (SELECT doc_id FROM cids)),
    sq AS (SELECT vec_id AS query_id, embedding AS qvec, n2 AS qn2
           FROM se WHERE vec_id % 25 = 0),
    sem_scored AS (
      SELECT q.query_id, e.vec_id AS doc_id,
             {_HYBRID_DOT.format(a='q.qvec', b='e.embedding')}
               / (sqrt(q.qn2) * sqrt(e.n2)) AS cosine
      FROM sq q JOIN se e ON e.vec_id <> q.query_id),
    sem AS (
      SELECT query_id, doc_id, rn AS rn_sem
      FROM (SELECT *, row_number() OVER (
              PARTITION BY query_id ORDER BY cosine DESC, doc_id) AS rn
            FROM sem_scored)
      WHERE rn <= 10)"""


@register(
    "search_hybrid_rank_fusion",
    oracle=f"""
    WITH {_HYBRID_CHANNELS_SQL},
    fused AS (
      SELECT coalesce(l.query_id, s.query_id) AS query_id,
             coalesce(l.doc_id, s.doc_id) AS doc_id,
             CAST(coalesce(11 - l.rn_lex, 0)
                  + coalesce(11 - s.rn_sem, 0) AS BIGINT) AS borda,
             l.rn_lex, s.rn_sem
      FROM lex l FULL OUTER JOIN sem s
        ON s.query_id = l.query_id AND s.doc_id = l.doc_id)
    SELECT query_id, doc_id, borda, rn_lex, rn_sem, rn
    FROM (SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY borda DESC, doc_id) AS rn
          FROM fused)
    WHERE rn <= 5
    """,
    tags=("similarity", "search", "fusion", "extension", "correctness-baseline"),
)
def search_hybrid_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid search with rank fusion: every 25th document (that has an
    embedding) queries BOTH retrieval channels — lexical top-10 by
    exact cosine over the 16-dim hashed-BoW vectors and semantic top-10
    by exact cosine over the embedding column — and the lists are fused
    with integer Borda scores (list-membership contributes 11 - rank).
    RRF's 1/(k+rank) decay is registered as the twin
    search_hybrid_rrf_fusion — in integer micros with truncating
    division, so it fuses exactly too.  Final answer: top-5 fused ids per
    query with a (borda DESC, doc_id) total order.  The fusion join is
    keyed (query_id, doc_id) over two |Q|x10 rank lists — trivially
    small no matter the corpus; the expensive parts are the two
    retrieval channels, which here are the SIZE-GUARDED brute-force
    correctness baselines.  At scale both channels route through the
    SRP inverted file and the fusion stage is unchanged — that twin is
    REGISTERED as search_hybrid_rank_fusion_ivf (oracle-exact,
    rank-overlap-gated against this baseline) — the point of fusing on
    ranks, not scores: channels swap exact for approximate
    independently.
    Zero lexical vectors (sign-cancelled docs) are excluded from the
    lexical channel only; the full-outer fusion keeps their semantic
    evidence."""
    from pyspark.sql import Window

    lex, sem = _hybrid_channels(spark, sf_dir, "search_hybrid_rank_fusion")
    fused = lex.join(sem, ["query_id", "doc_id"], "full_outer")
    borda = (
        F.coalesce(F.lit(11) - F.col("rn_lex"), F.lit(0))
        + F.coalesce(F.lit(11) - F.col("rn_sem"), F.lit(0))
    ).cast("bigint")
    w = Window.partitionBy("query_id").orderBy(F.desc("borda"), F.asc("doc_id"))
    return (
        fused.select("query_id", "doc_id", borda.alias("borda"), "rn_lex", "rn_sem")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
    )


# IVF-routed hybrid fusion: same two channels and the same integer
# Borda fusion as search_hybrid_rank_fusion, but each channel retrieves
# through the SRP inverted file (the registered ANN scale path) instead
# of the size-guarded brute-force baseline. The lexical channel indexes
# the 16-dim hashed-BoW vectors with its own 16-dim hyperplane matrix;
# the semantic channel reuses the embedding-space matrix from
# plans/similarity. Both mirrors embed the identical count-adaptive
# bit-width rule, so the approximate retrieval itself is oracle-exact.
_W16 = None  # filled lazily below to keep import cost near the use site


def _hybrid_w16() -> list[list[int]]:
    global _W16
    if _W16 is None:
        from etl_8million_data__spark.operators.similarity import hyperplane_weights
        from etl_8million_data__spark.plans.similarity import _MAX_BITS

        _W16 = hyperplane_weights(_MAX_BITS, 16)
    return _W16


def _hybrid_ivf_oracle(fusion: str = "borda") -> str:
    from etl_8million_data__spark.plans.similarity import _NB_SQL, _NPROBE, _W_SQL

    w16_sql = "[" + ", ".join(
        "[" + ", ".join(str(x) for x in row) + "]" for row in _hybrid_w16()
    ) + "]"
    if fusion == "borda":
        fuse_expr = "coalesce(11 - l.rn_lex, 0) + coalesce(11 - s.rn_sem, 0)"
        fuse_col = "borda"
    else:  # integer-micro RRF (see search_hybrid_rrf_fusion)
        fuse_expr = (
            "coalesce(1000000 // (60 + l.rn_lex), 0)"
            " + coalesce(1000000 // (60 + s.rn_sem), 0)"
        )
        fuse_col = "rrf_micro"

    def channel(pfx: str, rel: str, idc: str, vec: str, dim: int, w: str) -> str:
        """One SRP-IVF retrieval channel: projections -> sign-bit cell
        -> multiprobe -> exact cosine inside probed cells -> top-10."""
        return f"""
    {pfx}pr AS (SELECT {_NB_SQL} AS nb FROM (SELECT count(*) AS cnt FROM {rel})),
    {pfx}p AS (
      SELECT {idc}, {vec}, n2, {pfx}pr.nb AS nb,
             list_transform(range({pfx}pr.nb), j ->
               list_reduce(list_prepend(0.0, list_transform(range({dim}),
                 i -> {w}w.W[j+1][i+1] * {vec}[i+1]::DOUBLE)), (a, x) -> a + x)
             ) AS projs
      FROM {rel}, {w}w, {pfx}pr),
    {pfx}c AS (
      SELECT {idc}, {vec}, n2, nb, projs,
             list_reduce(list_prepend(0, list_transform(range(nb), j ->
               CASE WHEN projs[j+1] > 0 THEN 1 << j ELSE 0 END)), (a, x) -> a + x
             ) AS cell
      FROM {pfx}p),
    {pfx}q AS (
      SELECT {idc} AS query_id, {vec} AS qvec, n2 AS qn2, nb,
             projs AS qprojs, cell AS qcell
      FROM {pfx}c WHERE {idc} % 25 = 0),
    {pfx}probes AS (
      SELECT query_id, qvec, qn2,
             unnest(list_prepend(qcell,
               list_transform(
                 list_slice(
                   list_sort(list_transform(range(nb), j ->
                     {{'a': abs(qprojs[j+1]), 'j': j}})),
                   1, {_NPROBE - 1}),
                 s -> xor(qcell, 1 << struct_extract(s, 'j'))))) AS cell
      FROM {pfx}q),
    {pfx}scored AS (
      SELECT p.query_id, c.{idc} AS doc_id,
             {_HYBRID_DOT.format(a='p.qvec', b=f'c.{vec}')}
               / (sqrt(p.qn2) * sqrt(c.n2)) AS cosine
      FROM {pfx}probes p JOIN {pfx}c c
        ON c.cell = p.cell AND c.{idc} <> p.query_id)"""

    return f"""
    WITH cids AS (
      SELECT d.doc_id
      FROM (SELECT DISTINCT doc_id FROM documents) d
      JOIN (SELECT DISTINCT vec_id FROM embeddings) v ON v.vec_id = d.doc_id),
    tok AS (SELECT doc_id, unnest({_TOKS}) AS token
            FROM documents WHERE doc_id IN (SELECT doc_id FROM cids)),
    h AS (
      SELECT doc_id,
             strpos('0123456789abcdef', md5(token)[1:1]) - 1 AS bucket,
             CASE WHEN (strpos('0123456789abcdef', md5(token)[2:2]) - 1) % 2 = 0
                  THEN 1 ELSE -1 END AS sgn
      FROM tok),
    agg AS (SELECT doc_id, bucket, CAST(sum(sgn) AS BIGINT) AS v
            FROM h GROUP BY doc_id, bucket),
    grid AS (SELECT unnest(range(16)) AS bucket),
    dense AS (
      SELECT c.doc_id, g.bucket, coalesce(a.v, 0) AS v
      FROM cids c CROSS JOIN grid g
      LEFT JOIN agg a ON a.doc_id = c.doc_id AND a.bucket = g.bucket),
    lvecs AS (
      SELECT doc_id, list(v ORDER BY bucket) AS fv, sum(v * v) AS n2
      FROM dense GROUP BY doc_id),
    le AS (SELECT doc_id, fv, n2 FROM lvecs WHERE n2 > 0),
    lw(W) AS (SELECT {w16_sql}),
    se AS (
      SELECT vec_id, embedding,
             {_HYBRID_DOT.format(a='embedding', b='embedding')} AS n2
      FROM embeddings WHERE vec_id IN (SELECT doc_id FROM cids)),
    sw(W) AS (SELECT {_W_SQL}),
    {channel('l', 'le', 'doc_id', 'fv', 16, 'l')},
    {channel('s', 'se', 'vec_id', 'embedding', 64, 's')},
    lex AS (
      SELECT query_id, doc_id, rn AS rn_lex
      FROM (SELECT *, row_number() OVER (
              PARTITION BY query_id ORDER BY cosine DESC, doc_id) AS rn
            FROM lscored)
      WHERE rn <= 10),
    sem AS (
      SELECT query_id, doc_id, rn AS rn_sem
      FROM (SELECT *, row_number() OVER (
              PARTITION BY query_id ORDER BY cosine DESC, doc_id) AS rn
            FROM sscored)
      WHERE rn <= 10),
    fused AS (
      SELECT coalesce(l.query_id, s.query_id) AS query_id,
             coalesce(l.doc_id, s.doc_id) AS doc_id,
             CAST({fuse_expr} AS BIGINT) AS {fuse_col},
             l.rn_lex, s.rn_sem
      FROM lex l FULL OUTER JOIN sem s
        ON s.query_id = l.query_id AND s.doc_id = l.doc_id)
    SELECT query_id, doc_id, {fuse_col}, rn_lex, rn_sem, rn
    FROM (SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY {fuse_col} DESC, doc_id) AS rn
          FROM fused)
    WHERE rn <= 5
    """


def _hybrid_ivf_channels(spark: SparkSession, sf_dir: str):
    """The two SRP-IVF retrieval channels shared by the ANN-routed
    fusion queries (see search_hybrid_rank_fusion_ivf's docstring for
    the routing story): each channel derives its bit-width from its own
    corpus count and retrieves top-10 through the inverted file."""
    from etl_8million_data__spark.operators.similarity import adaptive_n_bits, knn_ivf
    from etl_8million_data__spark.plans.similarity import (
        _MAX_BITS,
        _MIN_BITS,
        _NPROBE,
        _TARGET_BUCKET,
        _W,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    cids = emb.select(F.col("vec_id").alias("doc_id")).distinct().join(
        docs.select("doc_id").distinct(), "doc_id"
    )

    n2i = F.lit(0).cast("bigint")
    for _i in range(16):  # unrolled 16-dim int fold (codegen; HOFs interpret)
        n2i = n2i + F.col("feats")[_i] * F.col("feats")[_i]
    # one (id, vector) frame per channel, materialized once: the corpus
    # side feeds cell assignment, the query side, and the adaptive
    # bit-width count (3 consumers -> 1 scan each).
    le = (
        hashed_doc_vectors(spark, sf_dir)
        .join(cids, "doc_id")
        .filter(n2i > 0)
        .localCheckpoint(eager=True)
    )
    nb_lex = adaptive_n_bits(le.count(), _TARGET_BUCKET, _MIN_BITS, _MAX_BITS)
    lq = le.filter(F.col("doc_id") % 25 == 0).select(
        F.col("doc_id").alias("query_id"), F.col("feats").alias("query_vec")
    )
    lex = knn_ivf(
        le, lq, _hybrid_w16(), k=10, nprobe=_NPROBE, n_bits=nb_lex,
        id_col="doc_id", vec_col="feats",
    ).select("query_id", F.col("vec_id").alias("doc_id"), F.col("rn").alias("rn_lex"))

    se = emb.join(
        cids.select(F.col("doc_id").alias("vec_id")), "vec_id"
    ).localCheckpoint(eager=True)
    nb_sem = adaptive_n_bits(se.count(), _TARGET_BUCKET, _MIN_BITS, _MAX_BITS)
    sq = se.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    sem = knn_ivf(se, sq, _W, k=10, nprobe=_NPROBE, n_bits=nb_sem).select(
        "query_id", F.col("vec_id").alias("doc_id"), F.col("rn").alias("rn_sem")
    )
    return lex, sem


@register(
    "search_hybrid_rank_fusion_ivf",
    oracle=_hybrid_ivf_oracle(),
    tags=("similarity", "search", "fusion", "ivf", "extension", "scale-path"),
)
def search_hybrid_rank_fusion_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANN-routed twin of search_hybrid_rank_fusion — the executable
    scale story its docstring promises: both retrieval channels go
    through the SRP inverted file (operators/similarity.knn_ivf, the
    recall-gated registered scale path) instead of the size-guarded
    brute-force baselines, and the integer Borda fusion stage is
    UNCHANGED.  That is the point of fusing on ranks, not scores:
    channels swap exact for approximate independently, fusion never
    knows.  The lexical channel indexes the 16-dim hashed-BoW vectors
    under a dedicated 16-dim hyperplane matrix; the semantic channel
    reuses the embedding-space matrix; each channel derives its SRP
    bit-width from ITS OWN corpus count with the shared adaptive rule,
    so candidate fractions fall as the corpus grows.  Everything stays
    deterministic (integer hyperplanes, fixed fold order, total-order
    tie-breaks), so the whole approximate pipeline — not just a recall
    summary — is oracle-checked exactly; rank overlap vs the exact
    baseline is gated in tests/test_similarity.py."""
    from pyspark.sql import Window

    lex, sem = _hybrid_ivf_channels(spark, sf_dir)
    fused = lex.join(sem, ["query_id", "doc_id"], "full_outer")
    borda = (
        F.coalesce(F.lit(11) - F.col("rn_lex"), F.lit(0))
        + F.coalesce(F.lit(11) - F.col("rn_sem"), F.lit(0))
    ).cast("bigint")
    w = Window.partitionBy("query_id").orderBy(F.desc("borda"), F.asc("doc_id"))
    return (
        fused.select("query_id", "doc_id", borda.alias("borda"), "rn_lex", "rn_sem")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
    )


@register(
    "search_phrase_positions",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents
               WHERE len({_TOKS}) >= 3),
    post AS (
      SELECT doc_id, CAST(u.i AS BIGINT) AS pos, toks[u.i + 1] AS token
      FROM t, unnest(range(len(toks))) AS u(i)),
    tri AS (
      SELECT array_to_string(toks[u.i + 1 : u.i + 3], ' ') AS phrase
      FROM t, unnest(range(len(toks) - 2)) AS u(i)),
    topq AS (SELECT phrase, count(*) AS n FROM tri GROUP BY phrase
             ORDER BY n DESC, phrase LIMIT 3),
    q AS (SELECT phrase, string_split(phrase, ' ') AS w FROM topq),
    m AS (
      SELECT q.phrase, p1.doc_id, p1.pos
      FROM q
      JOIN post p1 ON p1.token = q.w[1]
      JOIN post p2 ON p2.doc_id = p1.doc_id AND p2.pos = p1.pos + 1
                  AND p2.token = q.w[2]
      JOIN post p3 ON p3.doc_id = p1.doc_id AND p3.pos = p1.pos + 2
                  AND p3.token = q.w[3])
    SELECT phrase, doc_id, count(*) AS n_occ, min(pos) AS first_pos
    FROM m GROUP BY phrase, doc_id
    """,
    tags=("search", "inverted-index", "phrase", "extension"),
)
def search_phrase_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phrase search over a POSITIONAL INVERTED INDEX — the retrieval
    primitive exact-phrase queries need: postings are (token, doc_id,
    pos) rows from one posexplode, and a phrase matches where the
    postings of its words align at consecutive positions (p2.pos =
    p1.pos + 1, p3.pos = p1.pos + 2), i.e. the classic positional-index
    intersection, NOT a substring rescan of every document.  The query
    workload here is self-contained: the corpus's top-3 trigram phrases
    (count DESC, phrase tie-break).  Per (phrase, doc) the result
    carries occurrence count and first position — the inputs snippet
    generation and proximity ranking need.  Shape at scale: the phrase
    table is tiny and broadcast; postings are filtered to the query
    words BEFORE any join (so each join input is sum of df(w), not the
    corpus); the alignment joins are equi on (doc_id, pos±k) and
    co-partition by doc_id; overlapping matches count on both engines
    identically.  A real deployment would persist `post` partitioned by
    token — the engine-side plan is unchanged."""
    d = load_table(spark, sf_dir, "documents")
    t = (
        spread(d, "doc_id")
        .select("doc_id", tokens(F.col("text")).alias("toks"))
        .filter(F.size("toks") >= 3)
    )
    post = t.select(
        "doc_id", F.posexplode("toks").alias("pos", "token")
    ).select("doc_id", F.col("pos").cast("bigint").alias("pos"), "token")
    post = post.localCheckpoint(eager=True)

    tri = t.select(F.explode(word_shingles(F.col("toks"), 3)).alias("phrase"))
    topq = (
        tri.groupBy("phrase")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("phrase"))
        .limit(3)
    )
    q = topq.select(
        "phrase",
        F.split(F.col("phrase"), " ").getItem(0).alias("w1"),
        F.split(F.col("phrase"), " ").getItem(1).alias("w2"),
        F.split(F.col("phrase"), " ").getItem(2).alias("w3"),
    )
    # 3 rows after the limit — materialize once so the corpus-wide
    # trigram count doesn't re-run for every consumer (q feeds the
    # word semi-filter AND the p1 probe; unchecked, each broadcast
    # rebuilds the whole count pipeline).
    q = q.localCheckpoint(eager=True)

    allw = q.select(
        F.explode(F.array("w1", "w2", "w3")).alias("token")
    ).distinct()
    post = post.join(F.broadcast(allw), "token", "left_semi")

    p1 = post.join(F.broadcast(q), post["token"] == q["w1"]).select(
        "phrase", "w2", "w3", "doc_id", "pos"
    )
    p2 = post.select(
        F.col("doc_id").alias("_d2"), F.col("pos").alias("_p2"),
        F.col("token").alias("_t2"),
    )
    p3 = post.select(
        F.col("doc_id").alias("_d3"), F.col("pos").alias("_p3"),
        F.col("token").alias("_t3"),
    )
    m = (
        p1.join(
            p2,
            (F.col("_d2") == F.col("doc_id"))
            & (F.col("_p2") == F.col("pos") + 1)
            & (F.col("_t2") == F.col("w2")),
        )
        .join(
            p3,
            (F.col("_d3") == F.col("doc_id"))
            & (F.col("_p3") == F.col("pos") + 2)
            & (F.col("_t3") == F.col("w3")),
        )
        .select("phrase", "doc_id", "pos")
    )
    return m.groupBy("phrase", "doc_id").agg(
        F.count(F.lit(1)).alias("n_occ"), F.min("pos").alias("first_pos")
    )


# ---------------------------------------------------------------------------
# BPE tokenizer-vocabulary induction (operators/bpe.py).  The oracle
# unrolls the training loop: one (pairs -> top-rule -> fold-apply) CTE
# block per merge round, with the SAME greedy left-to-right fold the
# Spark operator uses (a string replace() would diverge on runs like
# 'a a a a').

_BPE_MERGES = 8


def _bpe_fold_sql(seq: str, pair: str) -> str:
    """DuckDB mirror of operators/bpe.apply_merge (state 'out<US>prev')."""
    return f"""trim(replace(
      list_reduce(
        list_prepend(chr(31), string_split({seq}, ' ')),
        (acc, x) -> CASE
          WHEN {pair} IS NOT NULL
               AND split_part(acc, chr(31), 2) = string_split({pair}, ' ')[1]
               AND x = string_split({pair}, ' ')[2]
            THEN split_part(acc, chr(31), 1) || ' ' || replace({pair}, ' ', '')
                 || chr(31)
          ELSE split_part(acc, chr(31), 1)
               || CASE WHEN split_part(acc, chr(31), 2) = '' THEN ''
                       ELSE ' ' || split_part(acc, chr(31), 2) END
               || chr(31) || x
        END),
      chr(31), ' '))"""


def _bpe_ctes(n_merges: int) -> str:
    parts = [
        f"""v0 AS (
      SELECT token, cnt,
             trim(regexp_replace(token, '(.)', '\\1 ', 'g')) AS seq
      FROM (SELECT token, CAST(count(*) AS BIGINT) AS cnt
            FROM (SELECT unnest({_TOKS}) AS token FROM documents)
            GROUP BY token))"""
    ]
    for r in range(1, n_merges + 1):
        parts.append(
            f"""p{r} AS (
      SELECT sub.s[u.i + 1] || ' ' || sub.s[u.i + 2] AS pair, sub.cnt
      FROM (SELECT string_split(seq, ' ') AS s, cnt FROM v{r - 1}) sub,
           unnest(range(len(sub.s) - 1)) AS u(i))"""
        )
        parts.append(
            f"""r{r} AS (
      SELECT pair, CAST(sum(cnt) AS BIGINT) AS c FROM p{r}
      GROUP BY pair ORDER BY c DESC, pair LIMIT 1)"""
        )
        # the rule joins in as a plain column (DuckDB forbids
        # subqueries inside lambdas); LEFT JOIN ON TRUE keeps the
        # vocabulary intact when a round has no pair left (NULL rule
        # -> identity fold), mirroring the Spark crossJoin of the
        # always-one-row aggregated rule.
        parts.append(
            f"""v{r} AS (
      SELECT token, cnt,
             {_bpe_fold_sql('seq', f'rp{r}.pair')} AS seq
      FROM v{r - 1} LEFT JOIN (SELECT pair FROM r{r}) rp{r} ON TRUE)"""
        )
    return "WITH " + ",\n    ".join(parts)


_BPE_MERGE_UNION = "\n    UNION ALL ".join(
    f"SELECT {r} AS merge_no, pair, replace(pair, ' ', '') AS merged, "
    f"c AS weight FROM r{r}"
    for r in range(1, _BPE_MERGES + 1)
)


def _doc_token_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        spread(d, "doc_id")
        .select(F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "corpus_bpe_merges",
    oracle=f"""
    {_bpe_ctes(_BPE_MERGES)}
    SELECT * FROM ({_BPE_MERGE_UNION})
    """,
    tags=("corpus", "tokenizer", "bpe", "extension"),
)
def corpus_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training, round for round inside the engine: the
    ordered merge table (merge_no, 'a b', 'ab', weighted count) learned
    by 8 rounds of merge-the-most-frequent-adjacent-symbol-pair over
    the corpus word vocabulary weighted by occurrence counts (word-
    level BPE a la Sennrich et al.) — the artifact a tokenizer build
    ships.  Every round is exact: the winner is the (count DESC, pair
    ASC) argmax via min(struct(-c, pair)), and merge application is the
    greedy left-to-right fold (operators/bpe.apply_merge) that the
    oracle's unrolled CTE chain mirrors token for token.  Shape at
    scale: rounds cost one VOCABULARY-sized aggregation each (the
    corpus is touched once, for the word counts); the per-round rule is
    one broadcast row; the driver loop carries only the round index —
    the same control-not-data shape as the k-means training loop."""
    from etl_8million_data__spark.operators.bpe import bpe_train

    merges, _ = bpe_train(_doc_token_vocab(spark, sf_dir), _BPE_MERGES)
    return merges


@register(
    "corpus_bpe_segmentation",
    oracle=f"""
    {_bpe_ctes(_BPE_MERGES)}
    SELECT token, cnt, seq, len(string_split(seq, ' ')) AS n_symbols
    FROM v{_BPE_MERGES}
    """,
    tags=("corpus", "tokenizer", "bpe", "extension"),
)
def corpus_bpe_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned BPE vocabulary APPLIED: every corpus word with its
    final symbol segmentation and symbol count after the 8 trained
    merges — the lookup table a tokenizer uses at encode time (and the
    compression evidence: sum(cnt * n_symbols) vs sum(cnt * chars) is
    the corpus token-length saving).  Exercises all 8 greedy folds end
    to end, so any divergence in merge order OR application surfaces
    here even when the merge table itself matches."""
    from etl_8million_data__spark.operators.bpe import bpe_train

    _, segmented = bpe_train(_doc_token_vocab(spark, sf_dir), _BPE_MERGES)
    return segmented


@register(
    "corpus_bpe_token_counts",
    oracle=f"""
    {_bpe_ctes(_BPE_MERGES)},
    segw AS (
      SELECT token, len(string_split(seq, ' ')) AS n_sym
      FROM v{_BPE_MERGES}),
    tok AS (SELECT doc_id, unnest({_TOKS}) AS token FROM documents)
    SELECT t.doc_id,
           count(*) AS n_words,
           CAST(sum(s.n_sym) AS BIGINT) AS n_bpe_tokens,
           CAST(sum(length(t.token)) AS BIGINT) AS n_chars,
           sum(s.n_sym) * 1.0 / sum(length(t.token)) AS bpe_per_char
    FROM tok t JOIN segw s ON s.token = t.token
    GROUP BY t.doc_id
    """,
    tags=("corpus", "tokenizer", "bpe", "extension"),
)
def corpus_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token counts UNDER THE LEARNED TOKENIZER: each
    document's word count, BPE-token count after the 8 trained merges,
    character count, and BPE-tokens-per-character — the numbers a
    packing/budgeting stage actually needs (whitespace token counts
    misprice documents once a subword tokenizer is in play; sequence
    lengths are billed in BPE units).  Composes the trained
    segmentation (a VOCABULARY-sized table, broadcast) with the doc
    postings via one token-keyed join + per-doc aggregate; training
    cost is amortized across every document because word-level BPE
    segments types, not occurrences.  The per-char ratio is one exact
    division of integer sums."""
    from etl_8million_data__spark.operators.bpe import bpe_train

    _, seg = bpe_train(_doc_token_vocab(spark, sf_dir), _BPE_MERGES)
    segw = seg.select("token", F.col("n_symbols").alias("n_sym"))
    d = load_table(spark, sf_dir, "documents")
    tok = spread(d, "doc_id").select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("token")
    )
    return (
        tok.join(F.broadcast(segw), "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_sym").alias("n_bpe_tokens"),
            F.sum(F.length("token")).alias("n_chars"),
            (
                F.sum("n_sym") * 1.0 / F.sum(F.length("token"))
            ).alias("bpe_per_char"),
        )
    )


@register(
    "search_late_interaction_maxsim",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents
               WHERE len({_TOKS}) >= 1),
    ch AS (
      SELECT doc_id, CAST(u.i AS BIGINT) AS chunk_no,
             toks[u.i * 8 + 1 : u.i * 8 + 16] AS ctoks
      FROM t, unnest(range((len(toks) - 1) // 8 + 1)) AS u(i)),
    tok AS (
      SELECT doc_id, chunk_no, unnest(ctoks) AS token FROM ch),
    h AS (
      SELECT doc_id, chunk_no,
             strpos('0123456789abcdef', md5(token)[1:1]) - 1 AS bucket,
             CASE WHEN (strpos('0123456789abcdef', md5(token)[2:2]) - 1) % 2 = 0
                  THEN 1 ELSE -1 END AS sgn
      FROM tok),
    agg AS (SELECT doc_id, chunk_no, bucket, CAST(sum(sgn) AS BIGINT) AS v
            FROM h GROUP BY 1, 2, 3),
    grid AS (SELECT unnest(range(16)) AS bucket),
    dense AS (
      SELECT c.doc_id, c.chunk_no, g.bucket, coalesce(a.v, 0) AS v
      FROM (SELECT DISTINCT doc_id, chunk_no FROM ch) c
      CROSS JOIN grid g
      LEFT JOIN agg a ON a.doc_id = c.doc_id AND a.chunk_no = c.chunk_no
                     AND a.bucket = g.bucket),
    cv AS (
      SELECT doc_id, chunk_no, list(v ORDER BY bucket) AS fv,
             sum(v * v) AS n2
      FROM dense GROUP BY doc_id, chunk_no),
    nz AS (SELECT * FROM cv WHERE n2 > 0),
    qc AS (SELECT doc_id AS query_id, chunk_no AS qchunk, fv AS qv, n2 AS qn2
           FROM nz WHERE doc_id % 100 = 0),
    best AS (
      SELECT q.query_id, q.qchunk, d.doc_id,
             max({_HYBRID_DOT.format(a='q.qv', b='d.fv')}
                 / (sqrt(q.qn2) * sqrt(d.n2))) AS mx
      FROM qc q JOIN nz d ON d.doc_id <> q.query_id
      GROUP BY 1, 2, 3),
    score AS (
      SELECT query_id, doc_id,
             list_reduce(list_prepend(0.0, list(mx ORDER BY qchunk)),
                         (acc, x) -> acc + x) AS maxsim
      FROM best GROUP BY query_id, doc_id)
    SELECT query_id, doc_id, maxsim, rn
    FROM (SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY maxsim DESC, doc_id) AS rn
          FROM score)
    WHERE rn <= 3
    """,
    tags=("search", "late-interaction", "extension", "correctness-baseline"),
)
def search_late_interaction_maxsim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATE-INTERACTION retrieval (ColBERT-style MaxSim), model-free:
    documents decompose into 16-token chunks at stride 8, every chunk
    gets a 16-dim hashed-BoW vector, and a query document scores a
    candidate as Σ over ITS chunks of the max chunk-cosine in the
    candidate — matching at sub-document granularity, so a long doc
    containing one strongly-matching passage ranks above a uniformly
    lukewarm one (exactly what single-vector retrieval flattens out).
    Top-3 per query (every 100th doc), ties by doc_id.

    Exactness: per-chunk-pair cosines use the pinned fold; the max is
    order-free; the SUM over query chunks is an ORDERED fold by
    chunk_no (the EMA/CUSUM technique) so float addition order is
    identical in both engines.  Zero-norm chunks (sign-cancelled) are
    excluded on both sides.  Size-guarded correctness baseline: the
    chunk-pair join is |Qchunks| x |Dchunks|; at scale the same
    chunk vectors route through the hashed-BoW IVF cells and MaxSim
    runs on candidates only — the scoring stages are unchanged, which
    is the point of keeping them relational."""
    from pyspark.sql import Window

    from etl_8million_data__spark.operators.similarity import assert_baseline_scale
    from etl_8million_data__spark.operators.text import hex_char_val, md5_utf8

    d = load_table(spark, sf_dir, "documents")
    t = (
        spread(d, "doc_id")
        .select("doc_id", tokens(F.col("text")).alias("toks"))
        .filter(F.size("toks") >= 1)
    )
    n = F.size("toks")
    ch = t.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.floor((n - F.lit(1)) / F.lit(8)).cast("int"))
        ).alias("chunk_no"),
        "toks",
    ).select(
        "doc_id",
        F.col("chunk_no").cast("bigint").alias("chunk_no"),
        F.slice(F.col("toks"), F.col("chunk_no") * 8 + 1, 16).alias("ctoks"),
    )
    tok = ch.select(
        "doc_id", "chunk_no", F.explode("ctoks").alias("token")
    )
    hx = md5_utf8(F.col("token"))
    bucket = hex_char_val(F.substring(hx, 1, 1)).cast("int")
    sgn = F.when(hex_char_val(F.substring(hx, 2, 1)) % 2 == 0, F.lit(1)).otherwise(
        F.lit(-1)
    )
    agg = (
        tok.select("doc_id", "chunk_no", bucket.alias("bucket"), sgn.alias("sgn"))
        .groupBy("doc_id", "chunk_no", "bucket")
        .agg(F.sum("sgn").alias("v"))
    )
    dense = agg.groupBy("doc_id", "chunk_no").agg(
        F.map_from_entries(F.collect_list(F.struct("bucket", "v"))).alias("m")
    )
    feats = F.transform(
        F.sequence(F.lit(0), F.lit(15)),
        lambda b: F.coalesce(F.element_at(F.col("m"), b), F.lit(0).cast("bigint")),
    )
    n2i = F.lit(0).cast("bigint")
    for _i in range(16):  # unrolled 16-dim int fold (codegen; HOFs interpret)
        n2i = n2i + F.col("fv")[_i] * F.col("fv")[_i]
    nz = (
        dense.select("doc_id", "chunk_no", feats.alias("fv"))
        .withColumn("n2", n2i)
        .filter(F.col("n2") > 0)
        .localCheckpoint(eager=True)
    )
    assert_baseline_scale(
        nz, 200_000, "search_late_interaction_maxsim",
        "hashed-BoW IVF-routed chunk candidates, MaxSim on candidates only",
    )
    qc = nz.filter(F.col("doc_id") % 100 == 0).select(
        F.col("doc_id").alias("query_id"),
        F.col("chunk_no").alias("qchunk"),
        F.col("fv").alias("qv"),
        F.col("n2").alias("qn2"),
    )
    # Codegen dot (optimization round 14, guide §4.1 applied to the JVM
    # boundary): higher-order functions (aggregate/zip_with) are
    # CodegenFallback — interpreted per element, per pair. The 16-dim
    # dot unrolls into a flat arithmetic expression that whole-stage
    # codegen compiles. Bit-identical to the old fold: it starts at
    # lit(0.0) and adds the products left-to-right — exactly the
    # (…((0.0 + v0) + v1)…) sequence the fold executed. (A full
    # chunks-per-doc array rewrite was tried and measured 4.7x SLOWER —
    # nested interpreted HOFs — so the row shape stays.)
    dot = F.lit(0.0)
    for _i in range(16):
        dot = dot + F.col("qv")[_i].cast("double") * F.col("fv")[_i].cast("double")
    # unhinted: qc grows with the corpus (|N|/100 chunk rows), so the
    # planner/AQE picks broadcast only while it genuinely fits
    best = (
        nz.join(qc, F.col("doc_id") != F.col("query_id"))
        .select(
            "query_id", "qchunk", "doc_id",
            (dot / (F.sqrt("qn2") * F.sqrt("n2"))).alias("cos"),
        )
        .groupBy("query_id", "qchunk", "doc_id")
        .agg(F.max("cos").alias("mx"))
    )
    score = best.groupBy("query_id", "doc_id").agg(
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("qchunk", "mx"))),
                lambda s: s["mx"],
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ).alias("maxsim")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("maxsim"), F.asc("doc_id"))
    return (
        score.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("query_id", "doc_id", "maxsim", "rn")
    )


@register(
    "corpus_group_split",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, lang, source, n_chars,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(range(6), c ->
                 CAST(strpos('0123456789abcdef', md5(source)[c+1:c+1]) - 1
                   AS BIGINT))),
               (a, x) -> a * 16 + x) % 1000 AS bucket
      FROM documents),
    s AS (
      SELECT source,
             CASE WHEN bucket < 800 THEN 'train'
                  WHEN bucket < 900 THEN 'val'
                  ELSE 'test' END AS split,
             count(*) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS total_chars
      FROM b GROUP BY 1, 2)
    SELECT s.source, s.split, s.n_docs, s.total_chars,
           CAST(count(*) OVER (PARTITION BY s.source) AS BIGINT) AS n_splits_of_source
    FROM s
    """,
    tags=("corpus", "split", "leakage", "extension"),
)
def corpus_group_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP-AWARE train/val/test split: the split is decided by a
    deterministic hash of the SOURCE (domain) key, so every document
    of a source lands in the same split — the leakage-free complement
    of corpus_train_split (doc-level hash) and the structural fix for
    what corpus_split_leakage measures: near-duplicates overwhelmingly
    cluster within a source, and a doc-level split scatters them
    across train and heldout. The hash is the first-6-hex fold of
    md5(source) (operators/text.py contract — engine-portable, unlike
    rand() or either engine's native hash()), ~80/10/10 by bucket —
    coarser than the doc-level 90/5/5 because split granularity is now
    whole groups: with few distinct sources a 5% bucket band can easily
    contain none of them (the sf0.01 fixtures' 20 sources all hash
    below 900), which is the real operational footgun of group splits
    and why the ratio is widened here. The
    output carries n_splits_of_source, which this construction pins to
    1 for every source — the no-straddle audit is part of the
    oracle-checked result, not a side assertion. One shuffle on
    (source, split); the window is per-source, never data-sized."""
    from pyspark.sql import Window

    from etl_8million_data__spark.operators.text import hex_prefix_int, md5_utf8

    d = load_table(spark, sf_dir, "documents")
    bucket = hex_prefix_int(md5_utf8(F.col("source")), 6) % 1000
    split = (
        F.when(bucket < 800, "train").when(bucket < 900, "val").otherwise("test")
    )
    agg = (
        d.withColumn("split", split)
        .groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )
    w = Window.partitionBy("source")
    return agg.select(
        "source",
        "split",
        "n_docs",
        "total_chars",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_splits_of_source"),
    )


_GROUP_BUCKET = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(6), c -> "
    "CAST(strpos('0123456789abcdef', md5(source)[c+1:c+1]) - 1 AS BIGINT))), "
    "(a, x) -> a * 16 + x) % 1000"
)


@register(
    "corpus_split_scheme_leakage_compare",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             CASE WHEN {_SPLIT_BUCKET} < 800 THEN 'train' ELSE 'heldout' END
               AS doc_split,
             CASE WHEN {_GROUP_BUCKET} < 800 THEN 'train' ELSE 'heldout' END
               AS grp_split,
             {_TOKS} AS toks
      FROM documents),
    g AS (
      SELECT doc_id, doc_split, grp_split,
             unnest(list_distinct(list_transform(range(len(toks) - 2),
                    i -> array_to_string(toks[i+1:i+3], ' ')))) AS gram
      FROM t WHERE len(toks) >= 3),
    schemes AS (
      SELECT 'doc_hash' AS scheme, doc_id, doc_split AS split, gram FROM g
      UNION ALL
      SELECT 'group_hash', doc_id, grp_split, gram FROM g),
    tr AS (SELECT DISTINCT scheme, gram FROM schemes WHERE split = 'train'),
    he AS (SELECT scheme, doc_id, gram FROM schemes WHERE split = 'heldout'),
    per_doc AS (
      SELECT he.scheme, he.doc_id,
             CAST(count(*) AS BIGINT) AS n_grams,
             CAST(count(tr.gram) AS BIGINT) AS n_leaked,
             (1000000 * count(tr.gram)) // count(*) AS leak_micro
      FROM he LEFT JOIN tr
        ON tr.scheme = he.scheme AND tr.gram = he.gram
      GROUP BY 1, 2)
    SELECT scheme,
           CAST(count(*) AS BIGINT) AS n_heldout_docs,
           CAST(sum(n_grams) AS BIGINT) AS n_grams,
           CAST(sum(n_leaked) AS BIGINT) AS n_leaked,
           CAST(sum(leak_micro) AS BIGINT) // count(*) AS mean_leak_micro
    FROM per_doc GROUP BY scheme
    """,
    tags=("corpus", "split", "leakage", "extension"),
)
def corpus_split_scheme_leakage_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The group-split claim, MEASURED in-engine: run the
    corpus_split_leakage audit under BOTH split schemes — doc-level
    hash (corpus_train_split) and source-level hash (corpus_group_split)
    — over one shared gram frame, and report per scheme the heldout doc
    count and the mean leaked-gram fraction (per-doc fractions floored
    to integer micro before the cross-doc mean, so the comparison
    hashes exactly; an 80/20 boundary on both schemes so both heldout
    sets are populated at fixture group counts). The group scheme
    structurally eliminates SAME-SOURCE leakage (a heldout doc's source
    has zero train docs, by construction); what remains is cross-source
    gram reuse — which is why the synthetic fixtures, whose vocabulary
    is global rather than source-clustered, show the group scheme at a
    similar (even higher) mean leak than the doc scheme: the query
    reports the decomposition honestly instead of asserting the
    real-corpus expectation.
    One gram explode feeds both schemes; each scheme's train-gram join
    is co-partitioned on (scheme, gram)."""
    from etl_8million_data__spark.operators.text import hex_prefix_int, md5_utf8

    d = load_table(spark, sf_dir, "documents")
    doc_bucket = (
        ((F.col("doc_id") % 2147483648) * 2654435761 + 104729) % 4294967296
    ) % 1000
    grp_bucket = hex_prefix_int(md5_utf8(F.col("source")), 6) % 1000
    t = (
        spread(d, "doc_id")
        .select(
            "doc_id",
            F.when(doc_bucket < 800, "train").otherwise("heldout").alias("doc_split"),
            F.when(grp_bucket < 800, "train").otherwise("heldout").alias("grp_split"),
            tokens(F.col("text")).alias("toks"),
        )
        .filter(F.size("toks") >= 3)
    )
    g = t.select(
        "doc_id",
        "doc_split",
        "grp_split",
        F.explode(F.array_distinct(word_shingles(F.col("toks"), 3))).alias("gram"),
    ).localCheckpoint(eager=True)
    schemes = g.select(
        F.lit("doc_hash").alias("scheme"), "doc_id",
        F.col("doc_split").alias("split"), "gram",
    ).unionByName(
        g.select(
            F.lit("group_hash").alias("scheme"), "doc_id",
            F.col("grp_split").alias("split"), "gram",
        )
    )
    tr = (
        schemes.filter(F.col("split") == "train")
        .select("scheme", "gram")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    he = schemes.filter(F.col("split") == "heldout").select(
        "scheme", "doc_id", "gram"
    )
    hit = F.sum(F.when(F.col("_hit").isNotNull(), 1).otherwise(0))
    per_doc = (
        he.join(tr, ["scheme", "gram"], "left")
        .groupBy("scheme", "doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            hit.cast("bigint").alias("n_leaked"),
            F.expr("(1000000 * sum(CASE WHEN _hit IS NOT NULL THEN 1 ELSE 0 END))"
                   " div count(1)").alias("leak_micro"),
        )
    )
    return per_doc.groupBy("scheme").agg(
        F.count(F.lit(1)).alias("n_heldout_docs"),
        F.sum("n_grams").alias("n_grams"),
        F.sum("n_leaked").alias("n_leaked"),
        F.expr("sum(leak_micro) div count(1)").alias("mean_leak_micro"),
    )


@register(
    "corpus_tokenizer_fertility_by_lang",
    oracle=f"""
    {_bpe_ctes(_BPE_MERGES)},
    segw AS (
      SELECT token, len(string_split(seq, ' ')) AS n_sym
      FROM v{_BPE_MERGES}),
    tok AS (SELECT doc_id, lang, unnest({_TOKS}) AS token FROM documents)
    SELECT t.lang,
           CAST(count(DISTINCT t.doc_id) AS BIGINT) AS n_docs,
           count(*) AS n_words,
           CAST(sum(s.n_sym) AS BIGINT) AS n_bpe_tokens,
           (1000000 * CAST(sum(s.n_sym) AS BIGINT)) // count(*)
             AS fertility_micro,
           (1000000 * CAST(sum(s.n_sym) AS BIGINT))
             // CAST(sum(length(t.token)) AS BIGINT) AS bpe_per_char_micro
    FROM tok t JOIN segw s ON s.token = t.token
    GROUP BY t.lang
    """,
    tags=("corpus", "tokenizer", "bpe", "evaluation", "extension"),
)
def corpus_tokenizer_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer FERTILITY by language — the standard tokenizer-equity
    metric (BPE tokens emitted per word): a tokenizer trained on a
    language mix bills under-represented languages more subword units
    per word, inflating their effective sequence cost; this query puts
    the per-language number next to tokens-per-char so the disparity
    is visible before a training run pays for it. Composes the trained
    BPE segmentation (vocabulary-sized, broadcast) with the token
    postings exactly like corpus_bpe_token_counts, aggregated by
    document language; ratios are truncating integer-micro divisions
    of exact integer sums, so they hash identically."""
    from etl_8million_data__spark.operators.bpe import bpe_train

    _, seg = bpe_train(_doc_token_vocab(spark, sf_dir), _BPE_MERGES)
    segw = seg.select("token", F.col("n_symbols").alias("n_sym"))
    d = load_table(spark, sf_dir, "documents")
    tok = spread(d, "doc_id").select(
        "doc_id", "lang", F.explode(tokens(F.col("text"))).alias("token")
    )
    return (
        tok.join(F.broadcast(segw), "token")
        .groupBy("lang")
        .agg(
            F.count_distinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_sym").alias("n_bpe_tokens"),
            F.expr("(1000000 * sum(n_sym)) div count(1)").alias("fertility_micro"),
            F.expr(
                "(1000000 * sum(n_sym)) div sum(length(token))"
            ).alias("bpe_per_char_micro"),
        )
    )


@register(
    "similarity_modality_agreement",
    oracle=f"""
    WITH cids AS (
      SELECT d.doc_id
      FROM (SELECT DISTINCT doc_id FROM documents) d
      JOIN (SELECT DISTINCT vec_id FROM embeddings) v ON v.vec_id = d.doc_id),
    tok AS (SELECT doc_id, unnest({_TOKS}) AS token
            FROM documents WHERE doc_id IN (SELECT doc_id FROM cids)),
    h AS (
      SELECT doc_id,
             strpos('0123456789abcdef', md5(token)[1:1]) - 1 AS bucket,
             CASE WHEN (strpos('0123456789abcdef', md5(token)[2:2]) - 1) % 2 = 0
                  THEN 1 ELSE -1 END AS sgn
      FROM tok),
    agg AS (SELECT doc_id, bucket, CAST(sum(sgn) AS BIGINT) AS v
            FROM h GROUP BY doc_id, bucket),
    grid AS (SELECT unnest(range(16)) AS bucket),
    dense AS (
      SELECT c.doc_id, g.bucket, coalesce(a.v, 0) AS v
      FROM cids c CROSS JOIN grid g
      LEFT JOIN agg a ON a.doc_id = c.doc_id AND a.bucket = g.bucket),
    lvecs AS (
      SELECT doc_id, list(v ORDER BY bucket) AS fv, sum(v * v) AS n2
      FROM dense GROUP BY doc_id),
    le AS (SELECT doc_id, fv, n2 FROM lvecs WHERE n2 > 0),
    lq AS (SELECT doc_id AS query_id, fv AS qv, n2 AS qn2
           FROM le WHERE doc_id % 25 = 0),
    lex_scored AS (
      SELECT q.query_id, e.doc_id,
             {_HYBRID_DOT.format(a='q.qv', b='e.fv')}
               / (sqrt(q.qn2) * sqrt(e.n2)) AS cosine
      FROM lq q JOIN le e ON e.doc_id <> q.query_id),
    lex AS (
      SELECT query_id, doc_id
      FROM (SELECT *, row_number() OVER (
              PARTITION BY query_id ORDER BY cosine DESC, doc_id) AS rn
            FROM lex_scored)
      WHERE rn <= 10),
    se AS (
      SELECT vec_id, embedding,
             {_HYBRID_DOT.format(a='embedding', b='embedding')} AS n2
      FROM embeddings WHERE vec_id IN (SELECT doc_id FROM cids)),
    sq AS (SELECT vec_id AS query_id, embedding AS qvec, n2 AS qn2
           FROM se WHERE vec_id % 25 = 0),
    sem_scored AS (
      SELECT q.query_id, e.vec_id AS doc_id,
             {_HYBRID_DOT.format(a='q.qvec', b='e.embedding')}
               / (sqrt(q.qn2) * sqrt(e.n2)) AS cosine
      FROM sq q JOIN se e ON e.vec_id <> q.query_id),
    sem AS (
      SELECT query_id, doc_id
      FROM (SELECT *, row_number() OVER (
              PARTITION BY query_id ORDER BY cosine DESC, doc_id) AS rn
            FROM sem_scored)
      WHERE rn <= 10),
    qs AS (
      SELECT query_id FROM lex GROUP BY query_id
      INTERSECT
      SELECT query_id FROM sem GROUP BY query_id),
    inter AS (
      SELECT l.query_id, CAST(count(*) AS BIGINT) AS n_common
      FROM lex l JOIN sem s
        ON s.query_id = l.query_id AND s.doc_id = l.doc_id
      GROUP BY 1),
    per_q AS (
      SELECT qs.query_id, coalesce(i.n_common, 0) AS n_common
      FROM qs LEFT JOIN inter i ON i.query_id = qs.query_id)
    SELECT CAST(count(*) AS BIGINT) AS n_queries,
           CAST(sum(n_common) AS BIGINT) AS n_common_total,
           (1000000 * CAST(sum(n_common) AS BIGINT))
             // (10 * count(*)) AS agreement_micro
    FROM per_q
    """,
    tags=("similarity", "diagnostics", "multimodal", "extension"),
)
def similarity_modality_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EMBEDDING-QUALITY DIAGNOSTIC — neighborhood agreement between the
    two retrieval modalities: for every query document, the overlap of
    its lexical top-10 (exact cosine over the model-free hashed-BoW
    vectors) with its semantic top-10 (exact cosine over the embedding
    column), summarized as one engine-side row (query count, total
    common neighbors, mean agreement in integer micro). Low agreement
    flags embeddings that have drifted from surface content — the
    cheap audit to run before trusting semantic dedup or ANN retrieval
    on a new embedding version; the same number also calibrates how
    much the hybrid fusion's two channels actually complement each
    other. Channels are the size-guarded exact baselines (the ANN
    twins swap in without changing the diagnostic's meaning)."""
    from etl_8million_data__spark.operators.similarity import (
        assert_baseline_scale,
        knn_bruteforce,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    cids = emb.select(F.col("vec_id").alias("doc_id")).distinct().join(
        docs.select("doc_id").distinct(), "doc_id"
    )
    n2i = F.lit(0).cast("bigint")
    for _i in range(16):  # unrolled 16-dim int fold (codegen; HOFs interpret)
        n2i = n2i + F.col("feats")[_i] * F.col("feats")[_i]
    le = (
        hashed_doc_vectors(spark, sf_dir)
        .join(cids, "doc_id")
        .filter(n2i > 0)
        .localCheckpoint(eager=True)
    )
    assert_baseline_scale(
        le, 200_000, "similarity_modality_agreement",
        "route both channels through knn_ivf; the overlap aggregate is unchanged",
    )
    lq = le.filter(F.col("doc_id") % 25 == 0).select(
        F.col("doc_id").alias("query_id"), F.col("feats").alias("query_vec")
    )
    lex = knn_bruteforce(le, lq, k=10, id_col="doc_id", vec_col="feats").select(
        "query_id", F.col("vec_id").alias("doc_id")
    )
    se = emb.join(
        cids.select(F.col("doc_id").alias("vec_id")), "vec_id"
    ).localCheckpoint(eager=True)
    sq = se.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    sem = knn_bruteforce(se, sq, k=10).select(
        "query_id", F.col("vec_id").alias("doc_id")
    )
    qs = (
        lex.select("query_id").distinct()
        .intersect(sem.select("query_id").distinct())
    )
    inter = (
        lex.join(sem, ["query_id", "doc_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    per_q = qs.join(inter, "query_id", "left").select(
        "query_id", F.coalesce("n_common", F.lit(0)).alias("n_common")
    )
    return per_q.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.sum("n_common").alias("n_common_total"),
        F.expr("(1000000 * sum(n_common)) div (10 * count(1))").alias(
            "agreement_micro"
        ),
    )


@register(
    "search_bm25_rsj_topk",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    dl AS (SELECT doc_id, len(toks) AS dl FROM t),
    stats AS (SELECT count(*) AS n_docs,
                     CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
              FROM dl),
    tf AS (SELECT doc_id, token, count(*) AS tf
           FROM (SELECT doc_id, unnest(toks) AS token FROM t)
           GROUP BY doc_id, token),
    dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
    q AS (SELECT token, df FROM dfreq, stats
          WHERE df * 4 <= n_docs
          ORDER BY df DESC, token LIMIT 5),
    scored AS (
      SELECT q.token AS term, tf.doc_id,
             ((CAST(s.n_docs AS DOUBLE) - CAST(q.df AS DOUBLE) + 0.5)
                / (CAST(q.df AS DOUBLE) + 0.5))
             * ((CAST(tf.tf AS DOUBLE) * 2.2)
                / (CAST(tf.tf AS DOUBLE)
                   + (1.2 * (0.25
                             + ((0.75 * CAST(dl.dl AS DOUBLE)) / s.avgdl)))))
               AS bm25
      FROM q JOIN tf ON tf.token = q.token
      JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN stats s)
    SELECT term, doc_id, bm25, rn
    FROM (SELECT *, row_number() OVER (
            PARTITION BY term ORDER BY bm25 DESC, doc_id) AS rn
          FROM scored)
    WHERE rn <= 10
    """,
    tags=("search", "bm25", "ranking", "extension", "scale-path"),
)
def search_bm25_rsj_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranking with the log-free RSJ idf — the lexical-retrieval
    scorer a training-data search/retrieval stage runs at corpus scale
    (reference analogue: the keyword filters in Summary.py; this is the
    ranked generalization). The query workload is derived from the
    corpus itself (the 5 highest-df terms appearing in <=25% of docs —
    contentful, not stopwords), so the whole query is reproducible with
    no fixture strings.

    Exactness: idf is the raw Robertson–Sparck-Jones odds ratio
    (N-df+0.5)/(df+0.5) — deliberately NO log, because log's last ulp
    differs across engines (same discipline as corpus_lm_fluency_scores);
    a deployment takes log downstream, which is rank-preserving. All
    remaining arithmetic is IEEE +,*,/ over exact integer counts with an
    identical expression tree on both engines, so scores hash-match.

    Scale shape: tf and df are two hash aggregates over the exploded
    token stream (map-side partials); the 5-term workload broadcasts to
    join the posting lists (tf filtered by term); the only window is
    partitioned by term over <=|matching docs|. At 100 TB the same plan
    holds with the persisted positional index (operators/search_index.py)
    supplying tf — no all-pairs stage, no unpartitioned window."""
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents")
    t = d.select("doc_id", tokens(F.col("text")).alias("toks"))
    dl = t.select("doc_id", F.size("toks").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    tf = (
        t.select("doc_id", F.explode("toks").alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    q = (
        dfreq.crossJoin(F.broadcast(stats))
        .filter(F.col("df") * 4 <= F.col("n_docs"))
        .orderBy(F.desc("df"), F.asc("token"))
        .limit(5)
        .select("token", "df")
    )
    nd = F.col("n_docs").cast("double")
    dfd = F.col("df").cast("double")
    tfd = F.col("tf").cast("double")
    dld = F.col("dl").cast("double")
    bm25 = ((nd - dfd + F.lit(0.5)) / (dfd + F.lit(0.5))) * (
        (tfd * F.lit(2.2))
        / (tfd + (F.lit(1.2) * (F.lit(0.25) + ((F.lit(0.75) * dld) / F.col("avgdl")))))
    )
    scored = (
        tf.join(F.broadcast(q), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(F.col("token").alias("term"), "doc_id", bm25.alias("bm25"))
    )
    w = Window.partitionBy("term").orderBy(F.desc("bm25"), F.asc("doc_id"))
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 10)


@register(
    "corpus_dsir_importance",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lang,
             (strpos('0123456789abcdef', md5(token)[1:1]) - 1) * 16
               + (strpos('0123456789abcdef', md5(token)[2:2]) - 1) AS bucket
      FROM (SELECT doc_id, lang, unnest({_TOKS}) AS token FROM documents)),
    grid AS (SELECT unnest(range(256)) AS bucket),
    ct AS (SELECT bucket, count(*) AS c FROM tok WHERE lang = 'en'
           GROUP BY bucket),
    cs AS (SELECT bucket, count(*) AS c FROM tok GROUP BY bucket),
    tot AS (SELECT (SELECT count(*) FROM tok WHERE lang = 'en') AS nt,
                   (SELECT count(*) FROM tok) AS ns),
    g AS (SELECT (1000000 * (ns + 256)) // (nt + 256) AS g_micro FROM tot),
    w AS (SELECT grid.bucket,
                 ((coalesce(ct.c, 0) + 1) * g.g_micro)
                   // (coalesce(cs.c, 0) + 1) AS w_micro
          FROM grid
          LEFT JOIN ct ON ct.bucket = grid.bucket
          LEFT JOIN cs ON cs.bucket = grid.bucket
          CROSS JOIN g)
    SELECT tok.doc_id,
           count(*) AS n_tokens,
           CAST(sum(w.w_micro) AS BIGINT) AS sum_w_micro,
           CAST(sum(w.w_micro) // count(*) AS BIGINT) AS mean_w_micro
    FROM tok JOIN w ON w.bucket = tok.bucket
    GROUP BY tok.doc_id
    """,
    tags=("corpus", "sampling", "dsir", "quality", "extension", "scale-path"),
)
def corpus_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weights (Data Selection via Importance
    Resampling, Xie et al. 2023): score every document in the raw pool
    by how target-like its hashed unigram distribution is, where the
    target domain is the corpus's English slice. Features are 256
    hashed buckets (md5 hex chars — the same portable token hash as
    text_feature_hashing), add-1 smoothed.

    Exactness: the per-bucket weight is the integer-micro probability
    ratio ((ct+1)/(Nt+D)) / ((cs+1)/(Ns+D)) folded as
    ((ct+1) * g_micro) div (cs+1) with g_micro = (1e6*(Ns+D)) div (Nt+D)
    — all bigint, no log (log's last ulp differs across engines; a
    deployment exponent-sums downstream, which is rank-preserving for
    the resampling draw). Per-doc scores are bigint sums of bigint
    weights, so order-insensitive and hash-identical in DuckDB.
    Magnitudes: (ct+1) * g_micro <= Nt * 1e6 * (Ns/Nt + 1) stays under
    int64 up to ~1e11 target tokens; beyond that a deployment scales
    counts to per-mille before the ratio (documented, not silently
    wrapped — Spark and DuckDB both compute the same bigint here).

    Scale shape: two 256-key hash aggregates build the model; the model
    broadcasts (256 rows) onto the exploded token stream; one doc_id
    aggregate produces the scores. No all-pairs stage; the token
    explode is the same stream every corpus statistic here shares. The
    deterministic epoch draw (corpus_soft_dedup_draw) consumes these
    weights unchanged at resampling time."""
    from etl_8million_data__spark.operators.text import hex_char_val, md5_utf8

    d = load_table(spark, sf_dir, "documents")
    h = md5_utf8(F.col("token"))
    bucket = (
        (hex_char_val(F.substring(h, 1, 1)) * 16 + hex_char_val(F.substring(h, 2, 1)))
        .cast("int")
        .alias("bucket")
    )
    tok = d.select(
        "doc_id", "lang", F.explode(tokens(F.col("text"))).alias("token")
    ).select("doc_id", "lang", bucket)
    # ONE pass over the exploded token stream (guide §2.3/§2.4): the
    # old shape re-derived `tok` four times (ct, cs, tot, scoring) —
    # four explode+md5 passes over every token. The win is the removed
    # token-stream derivations (Scan parquet 8 -> 6 in the r14 plan
    # dumps): the per-bucket model, the corpus totals, and the per-doc
    # scores are all re-aggregations of the (doc_id, lang, bucket)
    # pre-aggregate's ≤ |docs|*256 rows — each consumer re-runs that
    # small aggregate (no ReusedExchange: the consumers' partitionings
    # differ), which is still orders cheaper than re-exploding the
    # corpus. Identical bigint math: per-bucket en/all
    # counts, g_micro, ((ct+1)*g) div (cs+1), and per-doc sums weight
    # each bucket count n by w_micro — sum(w) over tokens == sum(n*w)
    # over (doc, bucket).
    db = tok.groupBy("doc_id", "lang", "bucket").agg(F.count(F.lit(1)).alias("n"))
    model = db.groupBy("bucket").agg(
        F.sum(F.when(F.col("lang") == "en", F.col("n")).otherwise(F.lit(0))).alias(
            "ct"
        ),
        F.sum("n").alias("cs"),
    )
    g = model.agg(F.sum("ct").alias("nt"), F.sum("cs").alias("ns")).select(
        F.expr("(1000000 * (ns + 256)) div (nt + 256)").alias("g_micro")
    )
    w = model.crossJoin(F.broadcast(g)).select(
        "bucket",
        F.expr("((ct + 1) * g_micro) div (cs + 1)").alias("w_micro"),
    )
    return (
        db.join(F.broadcast(w), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("n").alias("n_tokens"),
            F.sum(F.col("n") * F.col("w_micro")).alias("sum_w_micro"),
            F.expr("sum(n * w_micro) div sum(n)").alias("mean_w_micro"),
        )
    )


@register(
    "search_hybrid_rrf_fusion",
    oracle=f"""
    WITH {_HYBRID_CHANNELS_SQL},
    fused AS (
      SELECT coalesce(l.query_id, s.query_id) AS query_id,
             coalesce(l.doc_id, s.doc_id) AS doc_id,
             CAST(coalesce(1000000 // (60 + l.rn_lex), 0)
                  + coalesce(1000000 // (60 + s.rn_sem), 0) AS BIGINT)
               AS rrf_micro,
             l.rn_lex, s.rn_sem
      FROM lex l FULL OUTER JOIN sem s
        ON s.query_id = l.query_id AND s.doc_id = l.doc_id)
    SELECT query_id, doc_id, rrf_micro, rn_lex, rn_sem, rn
    FROM (SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY rrf_micro DESC, doc_id) AS rn
          FROM fused)
    WHERE rn <= 5
    """,
    tags=("similarity", "search", "fusion", "rrf", "extension"),
)
def search_hybrid_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal Rank Fusion over the same two retrieval channels as
    search_hybrid_rank_fusion — the fusion rule production hybrid
    search actually defaults to (Cormack et al. 2009: score =
    Σ 1/(60 + rank)), made ENGINE-EXACT by working in integer micros
    with truncating division: 1000000 div (60 + rank) summed as
    bigints, so the float-summation-order problem the Borda docstring
    calls out never arises and even the fused scores hash-match. RRF's
    property over Borda: a doc ranked 1st in one list and absent from
    the other still beats docs ranked mid-list in both (reciprocal
    decay), which is usually what you want when channels have very
    different score scales. Fusion stage is the identical |Q|x10
    full-outer join; the channels swap to ANN exactly like the Borda
    twins."""
    from pyspark.sql import Window

    lex, sem = _hybrid_channels(spark, sf_dir, "search_hybrid_rrf_fusion")
    fused = lex.join(sem, ["query_id", "doc_id"], "full_outer")
    rrf = (
        F.coalesce(F.expr("1000000 div (60 + rn_lex)"), F.lit(0))
        + F.coalesce(F.expr("1000000 div (60 + rn_sem)"), F.lit(0))
    ).cast("bigint")
    w = Window.partitionBy("query_id").orderBy(F.desc("rrf_micro"), F.asc("doc_id"))
    return (
        fused.select(
            "query_id", "doc_id", rrf.alias("rrf_micro"), "rn_lex", "rn_sem"
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
    )


@register(
    "search_hybrid_rrf_fusion_ivf",
    oracle=_hybrid_ivf_oracle("rrf"),
    tags=("similarity", "search", "fusion", "rrf", "ivf", "extension", "scale-path"),
)
def search_hybrid_rrf_fusion_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fusion matrix completed: {Borda, RRF} x {exact, ANN-routed}.
    Integer-micro RRF (see search_hybrid_rrf_fusion) over the SRP-IVF
    channels (see search_hybrid_rank_fusion_ivf) — channels and fusion
    rule swap independently because fusion consumes only ranks, and
    every combination stays hash-exact."""
    from pyspark.sql import Window

    lex, sem = _hybrid_ivf_channels(spark, sf_dir)
    fused = lex.join(sem, ["query_id", "doc_id"], "full_outer")
    rrf = (
        F.coalesce(F.expr("1000000 div (60 + rn_lex)"), F.lit(0))
        + F.coalesce(F.expr("1000000 div (60 + rn_sem)"), F.lit(0))
    ).cast("bigint")
    w = Window.partitionBy("query_id").orderBy(F.desc("rrf_micro"), F.asc("doc_id"))
    return (
        fused.select(
            "query_id", "doc_id", rrf.alias("rrf_micro"), "rn_lex", "rn_sem"
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
    )


# --- persisted-text-index probe twins (round 9): the text-search
# counterpart of the ANN persisted twins — same oracles as the
# in-memory queries, so parquet persistence (build -> pfx-partitioned
# postings + _doclen sidecar -> probe) is provably a pure I/O layout
# choice for lexical retrieval too.
from etl_8million_data__spark.plans.registry import _REGISTRY as _REG


@register(
    "search_bm25_persisted",
    oracle=_REG["search_bm25_rsj_topk"].oracle,
    tags=("search", "bm25", "persisted-index", "extension", "scale-path"),
)
def search_bm25_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """search_bm25_rsj_topk through the PERSISTED index path — what a
    production retrieval deployment runs: postings + the `_doclen`
    sidecar are built once into the pfx-partitioned parquet layout
    (operators/search_index.py), the same 5-term workload is derived
    (the only corpus-side derivation — a deployment's queries arrive
    externally), and `bm25_probe` scores against the INDEX: tf/df are
    aggregates over only the probed terms' postings, corpus stats come
    from the sidecar. Hash-checked against the same oracle as the
    in-memory query — persistence loses nothing. Amortized story:
    the build is paid once; every subsequent probe is Σ df(query
    terms) I/O, the lexical analog of the ANN persisted probes."""
    from etl_8million_data__spark.operators.search_index import (
        bm25_probe,
        build_postings,
    )
    from etl_8million_data__spark.plans.similarity import _persisted_index_root

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    root = _persisted_index_root(sf_dir, "postings_bm25")
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    build_postings(d, root)

    t = d.select("doc_id", tokens(F.col("text")).alias("toks"))
    dl = t.select("doc_id", F.size("toks").alias("dl"))
    stats = dl.agg(F.count(F.lit(1)).alias("n_docs"))
    tf = (
        t.select("doc_id", F.explode("toks").alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    terms = (
        dfreq.crossJoin(F.broadcast(stats))
        .filter(F.col("df") * 4 <= F.col("n_docs"))
        .orderBy(F.desc("df"), F.asc("token"))
        .limit(5)
        .select(F.col("token").alias("term"))
    )
    return bm25_probe(spark, root, terms, k=10)


@register(
    "search_phrase_persisted",
    oracle=_REG["search_phrase_positions"].oracle,
    tags=("search", "inverted-index", "phrase", "persisted-index", "extension"),
)
def search_phrase_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """search_phrase_positions through the PERSISTED index path: the
    corpus's top-3 trigram phrases probe the pfx-partitioned postings
    via `phrase_probe`'s anchor alignment (one join + one aggregate for
    any phrase length, vs the in-memory form's per-word join chain) —
    and the result still hash-matches the in-memory query's oracle:
    layout AND algorithm both swap with zero semantic drift. The probe
    join input is Σ df of the query words (skew-tested in
    tests/test_search_index_skew.py), never the corpus."""
    from etl_8million_data__spark.operators.dedup import spread
    from etl_8million_data__spark.operators.search_index import (
        build_postings,
        phrase_probe,
    )
    from etl_8million_data__spark.operators.text import word_shingles
    from etl_8million_data__spark.plans.similarity import _persisted_index_root

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    root = _persisted_index_root(sf_dir, "postings_phrase")
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    build_postings(d, root)

    t = (
        spread(d, "doc_id")
        .select("doc_id", tokens(F.col("text")).alias("toks"))
        .filter(F.size("toks") >= 3)
    )
    tri = t.select(F.explode(word_shingles(F.col("toks"), 3)).alias("phrase"))
    phrases = (
        tri.groupBy("phrase")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("phrase"))
        .limit(3)
        .select("phrase")
    )
    return phrase_probe(spark, root, phrases)


@register(
    "dedup_multi_evidence_components",
    oracle=f"""
    WITH RECURSIVE shingled AS ({_SHINGLED}), sig AS ({_SIG}),
    bands AS ({_BANDS}), lshp AS MATERIALIZED ({_PAIRS}),
    {_WINNOW_SEL},
    docfp AS (
      SELECT DISTINCT doc_id, u.e[1] AS fp
      FROM sel, unnest(sel.fps) AS u(e)),
    fpdf AS (SELECT fp, count(*) AS df FROM docfp GROUP BY fp),
    rare AS (
      SELECT d.doc_id, d.fp FROM docfp d JOIN fpdf USING (fp)
      WHERE fpdf.df <= 20),
    winp AS MATERIALIZED (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM rare a JOIN rare b ON a.fp = b.fp AND a.doc_id < b.doc_id
      GROUP BY 1, 2 HAVING count(*) >= 3),
    allp AS MATERIALIZED (
      -- MATERIALIZED + explicit DISTINCT over UNION ALL: under WITH
      -- RECURSIVE, DuckDB 1.0's CTE handling was MEASURED breaking a
      -- bare UNION's distinctness (the pair survived once per
      -- contributing channel) AND inlined CTEs' SELECT DISTINCT — the
      -- kcore/MMR inlining lesson, now with two more affected forms
      SELECT DISTINCT doc_a, doc_b FROM
        (SELECT doc_a, doc_b FROM lshp UNION ALL SELECT doc_a, doc_b FROM winp)),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM allp
      UNION ALL SELECT doc_b, doc_a FROM allp),
    walk(src, dst) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT w.src, e.dst FROM walk w JOIN edges e ON w.dst = e.src),
    comp AS (
      SELECT src AS node, least(src, min(dst)) AS component
      FROM walk GROUP BY src),
    tagged AS (
      SELECT c.component, p.doc_a, p.doc_b,
             CASE WHEN l.doc_a IS NOT NULL THEN 1 ELSE 0 END AS is_lsh,
             CASE WHEN w.doc_a IS NOT NULL THEN 1 ELSE 0 END AS is_win
      FROM allp p
      JOIN comp c ON c.node = p.doc_a
      LEFT JOIN lshp l ON l.doc_a = p.doc_a AND l.doc_b = p.doc_b
      LEFT JOIN winp w ON w.doc_a = p.doc_a AND w.doc_b = p.doc_b)
    SELECT t.component,
           CAST(n.n_docs AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(t.is_lsh) AS BIGINT) AS n_lsh_pairs,
           CAST(sum(t.is_win) AS BIGINT) AS n_winnow_pairs,
           CAST(sum(CASE WHEN t.is_lsh = 1 AND t.is_win = 1
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_corroborated
    FROM tagged t
    JOIN (SELECT component, count(*) AS n_docs FROM comp GROUP BY 1) n
      ON n.component = t.component
    GROUP BY t.component, n.n_docs
    """,
    tags=("dedup", "graph", "multi-evidence", "extension"),
)
def dedup_multi_evidence_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTI-EVIDENCE entity graph — the production dedup shape: a
    near-dup decision rarely rests on one signal, so the whole-document
    channel (MinHash-LSH band pairs) and the local-overlap channel
    (winnowing shared-fingerprint pairs, which catch embedded clones
    LSH structurally cannot) union into ONE edge set, connected
    components form the entities, and each component reports how many
    of its edges each channel contributed — `n_corroborated` (edges
    both channels assert) is the confidence signal reviewers sort by,
    and a component held together only by single-channel edges is the
    one to audit before collapsing. Per component (>= 1 edge): member
    count and per-channel pair counts.

    Scale shape: both channels are the audited sub-quadratic blocked
    joins (band keys / df-capped rare fingerprints); the union is
    pair-scale; components use the iterative min-label propagation
    (rounds = clique diameter); the per-component attribution joins
    edges to the component map on doc_a — pair-scale, AQE-splittable.
    Oracle: recursive-CTE transitive closure over the identical union
    edge set."""
    from etl_8million_data__spark.plans.dedup import dedup_winnowing_pairs

    d = load_table(spark, sf_dir, "documents")
    lsh = minhash_lsh_candidate_pairs(d).select("doc_a", "doc_b")
    win = dedup_winnowing_pairs(spark, sf_dir).select("doc_a", "doc_b")
    lsh = lsh.localCheckpoint(eager=True)
    win = win.localCheckpoint(eager=True)
    allp = lsh.unionByName(win).distinct().localCheckpoint(eager=True)
    comp = connected_components(
        d.select("doc_id"), allp, node_col="doc_id", src_col="doc_a", dst_col="doc_b"
    )
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    tagged = (
        allp.join(
            comp.select(F.col("node").alias("doc_a"), "component"), "doc_a"
        )
        .join(
            lsh.withColumn("_l", F.lit(1)), ["doc_a", "doc_b"], "left"
        )
        .join(win.withColumn("_w", F.lit(1)), ["doc_a", "doc_b"], "left")
        .select(
            "component",
            F.coalesce(F.col("_l"), F.lit(0)).alias("is_lsh"),
            F.coalesce(F.col("_w"), F.lit(0)).alias("is_win"),
        )
    )
    return (
        tagged.groupBy("component")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum("is_lsh").cast("bigint").alias("n_lsh_pairs"),
            F.sum("is_win").cast("bigint").alias("n_winnow_pairs"),
            F.sum(F.col("is_lsh") * F.col("is_win"))
            .cast("bigint")
            .alias("n_corroborated"),
        )
        .join(F.broadcast(sizes), "component")
        .select(
            "component", "n_docs", "n_pairs", "n_lsh_pairs", "n_winnow_pairs",
            "n_corroborated",
        )
    )


@register(
    "search_proximity_min_window",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents
               WHERE len({_TOKS}) >= 2),
    post AS (
      SELECT doc_id, CAST(u.i AS BIGINT) AS pos, toks[u.i + 1] AS token
      FROM t, unnest(range(len(toks))) AS u(i)),
    bi AS (
      SELECT array_to_string(toks[u.i + 1 : u.i + 2], ' ') AS phrase
      FROM t, unnest(range(len(toks) - 1)) AS u(i)),
    topq AS (SELECT phrase, count(*) AS n FROM bi GROUP BY phrase),
    topf AS (SELECT phrase FROM topq
             WHERE string_split(phrase, ' ')[1] <> string_split(phrase, ' ')[2]
             ORDER BY n DESC, phrase LIMIT 3),
    q AS (SELECT phrase, string_split(phrase, ' ') AS w FROM topf),
    m AS (
      SELECT q.phrase, p1.doc_id, abs(p1.pos - p2.pos) AS dist
      FROM q
      JOIN post p1 ON p1.token = q.w[1]
      JOIN post p2 ON p2.doc_id = p1.doc_id AND p2.token = q.w[2]),
    agg AS (
      SELECT phrase, doc_id, CAST(min(dist) AS BIGINT) AS min_dist,
             CAST(count(*) AS BIGINT) AS n_pairs
      FROM m GROUP BY 1, 2),
    rk AS (
      SELECT *, row_number() OVER (
               PARTITION BY phrase
               ORDER BY min_dist ASC, n_pairs DESC, doc_id ASC) AS rank
      FROM agg)
    SELECT phrase, doc_id, min_dist, n_pairs,
           CAST(1000000 // (1 + min_dist) AS BIGINT) AS proximity_score_micro,
           CAST(rank AS BIGINT) AS rank
    FROM rk WHERE rank <= 5
    """,
    tags=("search", "inverted-index", "proximity", "extension"),
)
def search_proximity_min_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PROXIMITY ranking over the positional inverted index — the
    retrieval primitive between bag-of-words BM25 (ignores positions)
    and exact phrase match (demands adjacency): documents where the
    query terms appear NEAR each other outrank documents where they
    are far apart. For each query pair (the corpus's top-3 distinct
    bigrams — deterministic workload, same convention as phrase
    search), per document: the MINIMUM distance between any occurrence
    of the two words (the 2-term min-window), the co-occurrence pair
    count, and an integer proximity score 1e6/(1+min_dist); top-5 docs
    per query under the (min_dist, n_pairs desc, doc_id) total order.
    An adjacent pair scores 500000, same-sentence ~1e5, far co-occurrence
    → tail — exactly the boost a BM25+proximity fusion consumes (the
    rank-fusion family composes it unchanged, channels being ranks).

    Scale shape: postings filtered to the query words BEFORE any join
    (input is Σ df(w), never the corpus — the phrase-search
    discipline); the pair join is equi on doc_id with per-doc fan-out
    tf(w1)·tf(w2); the ranking window partitions by query. A real
    deployment persists postings partitioned by token; the plan is
    unchanged."""
    from etl_8million_data__spark.operators.dedup import spread
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    t = (
        spread(d, "doc_id")
        .select("doc_id", tokens(F.col("text")).alias("toks"))
        .filter(F.size("toks") >= 2)
    )
    post = t.select(
        "doc_id", F.posexplode("toks").alias("pos", "token")
    ).select("doc_id", F.col("pos").cast("bigint").alias("pos"), "token")
    post = post.localCheckpoint(eager=True)

    bi = t.select(F.explode(word_shingles(F.col("toks"), 2)).alias("phrase"))
    topq = bi.groupBy("phrase").agg(F.count(F.lit(1)).alias("n"))
    w1 = F.split(F.col("phrase"), " ").getItem(0)
    w2 = F.split(F.col("phrase"), " ").getItem(1)
    q = (
        topq.filter(w1 != w2)
        .orderBy(F.desc("n"), F.asc("phrase"))
        .limit(3)
        .select("phrase", w1.alias("w1"), w2.alias("w2"))
        .localCheckpoint(eager=True)
    )
    allw = q.select(F.explode(F.array("w1", "w2")).alias("token")).distinct()
    post = post.join(F.broadcast(allw), "token", "left_semi")
    p1 = post.join(F.broadcast(q), post["token"] == q["w1"]).select(
        "phrase", "w2", "doc_id", "pos"
    )
    p2 = post.select(
        F.col("doc_id").alias("doc_id"),
        F.col("pos").alias("_p2"),
        F.col("token").alias("_t2"),
    )
    m = p1.join(p2, "doc_id").filter(F.col("_t2") == F.col("w2")).select(
        "phrase", "doc_id", F.abs(F.col("pos") - F.col("_p2")).alias("dist")
    )
    agg = m.groupBy("phrase", "doc_id").agg(
        F.min("dist").cast("bigint").alias("min_dist"),
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
    )
    wrk = Window.partitionBy("phrase").orderBy(
        F.asc("min_dist"), F.desc("n_pairs"), F.asc("doc_id")
    )
    return (
        agg.withColumn("rank", F.row_number().over(wrk).cast("bigint"))
        .filter(F.col("rank") <= 5)
        .select(
            "phrase", "doc_id", "min_dist", "n_pairs",
            F.expr("1000000 div (1 + min_dist)")
            .cast("bigint")
            .alias("proximity_score_micro"),
            "rank",
        )
    )


@register(
    "search_bm25_proximity_fusion",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents
               WHERE len({_TOKS}) >= 2),
    dl AS (SELECT doc_id, len(toks) AS dl FROM t),
    stats AS (SELECT count(*) AS n_docs,
                     CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
              FROM dl),
    tf AS (SELECT doc_id, token, count(*) AS tf
           FROM (SELECT doc_id, unnest(toks) AS token FROM t)
           GROUP BY doc_id, token),
    dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
    post AS (
      SELECT doc_id, CAST(u.i AS BIGINT) AS pos, toks[u.i + 1] AS token
      FROM t, unnest(range(len(toks))) AS u(i)),
    bi AS (
      SELECT array_to_string(toks[u.i + 1 : u.i + 2], ' ') AS phrase
      FROM t, unnest(range(len(toks) - 1)) AS u(i)),
    topq AS (SELECT phrase, count(*) AS n FROM bi GROUP BY phrase),
    topf AS (SELECT phrase FROM topq
             WHERE string_split(phrase, ' ')[1] <> string_split(phrase, ' ')[2]
             ORDER BY n DESC, phrase LIMIT 3),
    q AS (SELECT phrase, string_split(phrase, ' ') AS w FROM topf),
    terms AS (
      SELECT phrase, u.tok AS token
      FROM q, unnest(q.w) AS u(tok)),
    perterm AS (
      SELECT m.phrase, tf.doc_id,
             ((CAST(s.n_docs AS DOUBLE) - CAST(d.df AS DOUBLE) + 0.5)
                / (CAST(d.df AS DOUBLE) + 0.5))
             * ((CAST(tf.tf AS DOUBLE) * 2.2)
                / (CAST(tf.tf AS DOUBLE)
                   + (1.2 * (0.25
                             + ((0.75 * CAST(dl.dl AS DOUBLE)) / s.avgdl)))))
               AS bm25
      FROM terms m
      JOIN tf ON tf.token = m.token
      JOIN dfreq d ON d.token = m.token
      JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN stats s),
    bmdoc AS (SELECT phrase, doc_id, sum(bm25) AS bm25
              FROM perterm GROUP BY 1, 2),
    bmrank AS (
      SELECT phrase, doc_id, row_number() OVER (
               PARTITION BY phrase ORDER BY bm25 DESC, doc_id) AS rn_b
      FROM bmdoc),
    prox AS (
      SELECT q.phrase, p1.doc_id, abs(p1.pos - p2.pos) AS dist
      FROM q
      JOIN post p1 ON p1.token = q.w[1]
      JOIN post p2 ON p2.doc_id = p1.doc_id AND p2.token = q.w[2]),
    proxagg AS (
      SELECT phrase, doc_id, min(dist) AS min_dist, count(*) AS n_pairs
      FROM prox GROUP BY 1, 2),
    proxrank AS (
      SELECT phrase, doc_id, row_number() OVER (
               PARTITION BY phrase
               ORDER BY min_dist ASC, n_pairs DESC, doc_id ASC) AS rn_p
      FROM proxagg),
    fused AS (
      SELECT coalesce(b.phrase, p.phrase) AS phrase,
             coalesce(b.doc_id, p.doc_id) AS doc_id,
             CAST(coalesce(11 - b.rn_b, 0) + coalesce(11 - p.rn_p, 0)
               AS BIGINT) AS borda
      FROM (SELECT * FROM bmrank WHERE rn_b <= 10) b
      FULL OUTER JOIN (SELECT * FROM proxrank WHERE rn_p <= 10) p
        ON p.phrase = b.phrase AND p.doc_id = b.doc_id)
    SELECT phrase, doc_id, borda,
           CAST(row_number() OVER (
             PARTITION BY phrase ORDER BY borda DESC, doc_id) AS BIGINT) AS rank
    FROM fused
    QUALIFY rank <= 5
    """,
    tags=("search", "fusion", "proximity", "bm25", "extension"),
)
def search_bm25_proximity_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 × PROXIMITY rank fusion — the composition the proximity
    operator exists for: the lexical channel (per-term RSJ-idf BM25
    summed over the 2-term query, the search_bm25_rsj_topk scorer) and
    the positional channel (min-distance proximity,
    search_proximity_min_window) each produce a per-query top-10 RANK
    list, and integer Borda fusion combines them — a document that is
    both term-rich AND has the terms adjacent outranks one that is
    merely term-rich. Fusion consumes ranks, never scores (the rank-
    fusion family's standing contract), so the float BM25 channel and
    the integer proximity channel compose without any score
    normalization and the fused ranking hashes exactly.

    Scale shape: both channels are the audited standalone plans (two
    hash aggregates + broadcast query join; semi-filtered postings);
    the fusion is a full-outer join of two |Q|×10 rank lists — trivial
    at any corpus size; final top-5 per query under a total order."""
    from pyspark.sql import Window

    from etl_8million_data__spark.operators.dedup import spread

    d = load_table(spark, sf_dir, "documents")
    t = (
        spread(d, "doc_id")
        .select("doc_id", tokens(F.col("text")).alias("toks"))
        .filter(F.size("toks") >= 2)
    )
    t = t.localCheckpoint(eager=True)
    dl = t.select("doc_id", F.size("toks").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    tf = (
        t.select("doc_id", F.explode("toks").alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=True)
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    post = t.select(
        "doc_id", F.posexplode("toks").alias("pos", "token")
    ).select("doc_id", F.col("pos").cast("bigint").alias("pos"), "token")

    bi = t.select(F.explode(word_shingles(F.col("toks"), 2)).alias("phrase"))
    w1 = F.split(F.col("phrase"), " ").getItem(0)
    w2 = F.split(F.col("phrase"), " ").getItem(1)
    q = (
        bi.groupBy("phrase")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(w1 != w2)
        .orderBy(F.desc("n"), F.asc("phrase"))
        .limit(3)
        .select("phrase", w1.alias("w1"), w2.alias("w2"))
        .localCheckpoint(eager=True)
    )
    terms = q.select(
        "phrase", F.explode(F.array("w1", "w2")).alias("token")
    )
    bm25 = (
        (F.col("n_docs").cast("double") - F.col("df").cast("double") + 0.5)
        / (F.col("df").cast("double") + 0.5)
    ) * (
        (F.col("tf").cast("double") * 2.2)
        / (
            F.col("tf").cast("double")
            + (1.2 * (0.25 + ((0.75 * F.col("dl").cast("double")) / F.col("avgdl"))))
        )
    )
    perterm = (
        F.broadcast(terms)
        .join(tf, "token")
        .join(dfreq, "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("phrase", "doc_id", bm25.alias("bm25"))
    )
    bmdoc = perterm.groupBy("phrase", "doc_id").agg(F.sum("bm25").alias("bm25"))
    wb = Window.partitionBy("phrase").orderBy(F.desc("bm25"), F.asc("doc_id"))
    bmrank = (
        bmdoc.withColumn("rn_b", F.row_number().over(wb))
        .filter(F.col("rn_b") <= 10)
        .select("phrase", "doc_id", "rn_b")
        .localCheckpoint(eager=True)
    )

    allw = q.select(F.explode(F.array("w1", "w2")).alias("token")).distinct()
    postf = post.join(F.broadcast(allw), "token", "left_semi")
    p1 = postf.join(F.broadcast(q), postf["token"] == q["w1"]).select(
        "phrase", "w2", "doc_id", "pos"
    )
    p2 = postf.select(
        "doc_id", F.col("pos").alias("_p2"), F.col("token").alias("_t2")
    )
    prox = p1.join(p2, "doc_id").filter(F.col("_t2") == F.col("w2")).select(
        "phrase", "doc_id", F.abs(F.col("pos") - F.col("_p2")).alias("dist")
    )
    proxagg = prox.groupBy("phrase", "doc_id").agg(
        F.min("dist").alias("min_dist"), F.count(F.lit(1)).alias("n_pairs")
    )
    wp = Window.partitionBy("phrase").orderBy(
        F.asc("min_dist"), F.desc("n_pairs"), F.asc("doc_id")
    )
    proxrank = (
        proxagg.withColumn("rn_p", F.row_number().over(wp))
        .filter(F.col("rn_p") <= 10)
        .select("phrase", "doc_id", "rn_p")
        .localCheckpoint(eager=True)
    )

    fused = bmrank.join(proxrank, ["phrase", "doc_id"], "full_outer").select(
        "phrase",
        "doc_id",
        (
            F.coalesce(F.lit(11) - F.col("rn_b"), F.lit(0))
            + F.coalesce(F.lit(11) - F.col("rn_p"), F.lit(0))
        )
        .cast("bigint")
        .alias("borda"),
    )
    wf = Window.partitionBy("phrase").orderBy(F.desc("borda"), F.asc("doc_id"))
    return (
        fused.withColumn("rank", F.row_number().over(wf).cast("bigint"))
        .filter(F.col("rank") <= 5)
        .select("phrase", "doc_id", "borda", "rank")
    )


@register(
    "corpus_incremental_curation",
    oracle=f"""
    WITH shingled AS ({_SHINGLED}), sig AS ({_SIG}), bands AS ({_BANDS}),
    qual AS (
      SELECT doc_id FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)
      WHERE len(toks) >= 10),
    hb AS (SELECT b.* FROM bands b JOIN qual USING (doc_id)
           WHERE doc_id % 5 <> 0),
    db AS (SELECT b.* FROM bands b JOIN qual USING (doc_id)
           WHERE doc_id % 5 = 0),
    hist_drop AS (
      SELECT DISTINCT a.doc_id FROM hb a
      JOIN hb b ON a.band = b.band AND a.band_key = b.band_key
               AND b.doc_id < a.doc_id),
    hist_kept AS (
      SELECT doc_id FROM qual
      WHERE doc_id % 5 <> 0
        AND doc_id NOT IN (SELECT doc_id FROM hist_drop)),
    idx AS (
      SELECT DISTINCT band, band_key FROM hb JOIN hist_kept USING (doc_id)),
    delta_drop AS (
      SELECT DISTINCT d.doc_id FROM db d
      JOIN idx i ON d.band = i.band AND d.band_key = i.band_key
      UNION
      SELECT DISTINCT a.doc_id FROM db a
      JOIN db b ON a.band = b.band AND a.band_key = b.band_key
               AND b.doc_id < a.doc_id),
    delta_kept AS (
      SELECT doc_id FROM qual
      WHERE doc_id % 5 = 0
        AND doc_id NOT IN (SELECT doc_id FROM delta_drop))
    SELECT 'history' AS batch, doc_id FROM hist_kept
    UNION ALL
    SELECT 'delta' AS batch, doc_id FROM delta_kept
    """,
    tags=("corpus", "dedup", "incremental", "curation", "extension",
          "persisted-view"),
)
def corpus_incremental_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL corpus curation end to end — the operational twin of
    the corpus_e2e_curation flagship: a continuously-growing training
    corpus is curated batch by batch against PERSISTED state instead of
    re-deduping history on every ingest. Each batch (here: a history
    load, then a delta of every 5th doc) passes the quality gate
    (>= 10 normalized tokens), then
    operators/incremental_dedup.dedup_increment probes the persisted
    LSH band index — a new doc is dropped on any band collision with
    the ACCEPTED corpus (recall-biased, the module's documented
    tradeoff) or with a smaller-id doc in its own batch — and only the
    survivors' bands extend the index. The oracle replays BOTH stages'
    decision rules in SQL over the same minhash/band fragments the
    batch LSH queries mirror, so the hash gate covers the exact
    accept/drop semantics, not just row counts. Returns (batch,
    doc_id) of the curated corpus.

    Scale shape: each batch computes signatures for ITS OWN docs only
    and equi-joins the compact (band, band_key) index — never re-reads
    corpus text; the index append is survivors-only and id-bucketed
    (forget/compaction rewrite only touched buckets); the streaming
    twin with replay idempotence is streaming/jobs.stream_dedup_increment
    (tested in tests/test_incremental_dedup.py)."""
    import os
    import shutil

    from etl_8million_data__spark.operators.incremental_dedup import (
        dedup_increment,
    )
    from etl_8million_data__spark.plans.similarity import _persisted_index_root

    docs = load_table(spark, sf_dir, "documents")
    qual = docs.filter(F.size(tokens(F.col("text"))) >= 10).localCheckpoint(
        eager=True
    )
    hist = qual.filter(F.col("doc_id") % 5 != 0)
    delta = qual.filter(F.col("doc_id") % 5 == 0)
    root = _persisted_index_root(sf_dir, "inc_curation")
    shutil.rmtree(root, ignore_errors=True)
    idx = os.path.join(root, "bands")
    kept_h = dedup_increment(hist, idx)
    kept_d = dedup_increment(delta, idx)
    return kept_h.select(F.lit("history").alias("batch"), "doc_id").unionByName(
        kept_d.select(F.lit("delta").alias("batch"), "doc_id")
    )
