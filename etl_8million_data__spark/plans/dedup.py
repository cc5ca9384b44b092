"""Dedup extension queries over the documents table (SURVEY.md §7.2(4))
with exact DuckDB oracles.

The DuckDB SQL mirrors the Spark operators' hashing scheme literally:
lowercase md5 hex, string-min for MinHash, strpos-based hex folds — see
operators/text.py for the portability contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_8million_data__spark.catalog import load_table
from etl_8million_data__spark.operators.dedup import (
    exact_dedup_groups,
    jaccard_verified_pairs,
    minhash_lsh_candidate_pairs,
    minhash_signature_frame,
)
from etl_8million_data__spark.operators.dedup import doc_shingle_frame
from etl_8million_data__spark.plans.registry import register

# Shared DuckDB fragments (must mirror operators/text.py exactly).
_NORM = r"lower(trim(regexp_replace(text, '\s+', ' ', 'g')))"
_TOKS = f"string_split({_NORM}, ' ')"
_SHINGLED = f"""
  SELECT doc_id,
         list_distinct(list_transform(range(len(toks) - 2),
                       i -> array_to_string(toks[i+1:i+3], ' '))) AS shingles
  FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)
  WHERE len(toks) >= 3
"""
_SIG = """
  SELECT doc_id,
         list_transform(range(16), j ->
           list_aggregate(list_transform(shingles,
             s -> md5(j::VARCHAR || '|' || s)), 'min')) AS sig
  FROM shingled
"""
_BANDS = """
  SELECT doc_id, b.band,
         md5(array_to_string(sig[b.band*4+1 : b.band*4+4], ',')) AS band_key
  FROM sig CROSS JOIN (SELECT unnest(range(4)) AS band) b
"""
_PAIRS = """
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
              AND a.doc_id < b.doc_id
"""


@register(
    "dedup_exact_groups",
    oracle=f"""
    SELECT md5({_NORM}) AS fingerprint,
           count(*) AS dup_count,
           min(doc_id) AS canonical_doc_id
    FROM documents
    GROUP BY 1
    """,
    tags=("dedup", "extension"),
)
def dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on md5(normalized text), canonical =
    min doc_id. One shuffle on a 32-byte key regardless of doc size."""
    return exact_dedup_groups(load_table(spark, sf_dir, "documents"))


@register(
    "dedup_minhash_signatures",
    oracle=f"""
    WITH shingled AS ({_SHINGLED}), sig AS ({_SIG})
    SELECT doc_id, array_to_string(sig, ',') AS sig_csv FROM sig
    """,
    tags=("dedup", "minhash", "extension"),
)
def dedup_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-hash MinHash signatures over distinct 3-word shingles — the
    md5s run in a codegen'd explode stage and the 16 conditional mins
    combine map-side, so only (doc_id, 16 hashes) hits the shuffle."""
    sh = doc_shingle_frame(load_table(spark, sf_dir, "documents"))
    return minhash_signature_frame(sh, "doc_id", 16).select(
        "doc_id", F.array_join(F.col("sig"), ",").alias("sig_csv")
    )


@register(
    "dedup_minhash_lsh_pairs",
    oracle=f"""
    WITH shingled AS ({_SHINGLED}), sig AS ({_SIG}), bands AS ({_BANDS})
    {_PAIRS}
    """,
    tags=("dedup", "minhash", "lsh", "extension"),
)
def dedup_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded LSH candidate pairs (4 bands × 4 rows): only
    (doc_id, band_key) tuples are shuffled; the self-join is equi on
    band_key so it scales to billions of docs with AQE skew handling."""
    return minhash_lsh_candidate_pairs(load_table(spark, sf_dir, "documents"))


@register(
    "dedup_near_dup_jaccard",
    oracle=f"""
    WITH shingled AS ({_SHINGLED}), sig AS ({_SIG}), bands AS ({_BANDS}),
    pairs AS ({_PAIRS})
    SELECT p.doc_a, p.doc_b,
           len(list_intersect(sa.shingles, sb.shingles))
             / (len(sa.shingles) + len(sb.shingles)
                - len(list_intersect(sa.shingles, sb.shingles))) AS jaccard
    FROM pairs p
    JOIN shingled sa ON sa.doc_id = p.doc_a
    JOIN shingled sb ON sb.doc_id = p.doc_b
    WHERE len(list_intersect(sa.shingles, sb.shingles))
          / (len(sa.shingles) + len(sb.shingles)
             - len(list_intersect(sa.shingles, sb.shingles))) >= 0.5
    """,
    tags=("dedup", "minhash", "jaccard", "extension"),
)
def dedup_near_dup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidates verified by exact shingle-set Jaccard >= 0.5 —
    the full near-dup pipeline (shingle → minhash → band → verify)."""
    return jaccard_verified_pairs(load_table(spark, sf_dir, "documents"), threshold=0.5)


@register(
    "dedup_simhash",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(list_distinct({_TOKS})) AS t FROM documents),
    hx AS (SELECT doc_id, md5(t)[1:8] AS h FROM tok),
    bits AS (
      SELECT doc_id, b.b,
             sum(CASE WHEN CAST(floor(
                    (strpos('0123456789abcdef', h[(b.b//4)+1 : (b.b//4)+1]) - 1)
                    / (2 ** (3 - (b.b % 4)))) AS BIGINT) % 2 = 1
                 THEN 1 ELSE -1 END) AS score
      FROM hx CROSS JOIN (SELECT unnest(range(32)) AS b) b
      GROUP BY doc_id, b.b)
    SELECT doc_id,
           CAST(sum(CASE WHEN score > 0 THEN CAST(2 ** b AS BIGINT) ELSE 0 END) AS BIGINT)
             AS simhash
    FROM bits GROUP BY doc_id
    """,
    tags=("dedup", "simhash", "extension"),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash per document — one bigint per doc from a narrow
    map stage; near-dup candidates are low-Hamming-distance pairs."""
    from etl_8million_data__spark.operators.dedup import simhash32_frame, spread

    d = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    return simhash32_frame(d, "doc_id", "text")


@register(
    "dedup_prefix_filter_pairs",
    oracle=f"""
    WITH shingled AS ({_SHINGLED}),
    ex AS (SELECT doc_id, unnest(shingles) AS g FROM shingled),
    sz AS (SELECT doc_id, len(shingles) AS n FROM shingled),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
      FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT doc_a, doc_b, common,
           na.n + nb.n - common AS union_size,
           common * 1.0 / (na.n + nb.n - common) AS jaccard
    FROM common
    JOIN sz na ON na.doc_id = doc_a
    JOIN sz nb ON nb.doc_id = doc_b
    WHERE common * 3 >= na.n + nb.n
    """,
    tags=("dedup", "similarity-join", "extension", "scale-path"),
)
def dedup_prefix_filter_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT all-pairs similarity join (Jaccard >= 1/2 on word-3-
    shingle sets) via prefix filtering — the LOSSLESS complement to the
    probabilistic MinHash-LSH path: every qualifying pair is returned,
    none missed. Candidates are generated only from each document's
    rarest-shingle prefix (n - ceil(n/2) + 1 shingles under the global
    ascending-df order), so blocking keys are the SMALL end of the df
    distribution and boilerplate grams never form hot blocks; exact
    common-shingle counting runs only on candidates. The oracle is the
    naive definition itself (all gram-sharing pairs, full Jaccard) —
    hash-equality proves the pruned plan computes exactly the textbook
    result. Threshold gate is the pure-integer predicate
    3*common >= n_a + n_b."""
    from etl_8million_data__spark.operators.dedup import prefix_filter_pairs

    d = load_table(spark, sf_dir, "documents")
    return prefix_filter_pairs(d, threshold_num=1, threshold_den=2)


@register(
    "dedup_edit_distance_verify",
    oracle=f"""
    WITH shingled AS ({_SHINGLED}), sig AS ({_SIG}), bands AS ({_BANDS}),
    pairs AS ({_PAIRS}),
    nt AS (SELECT doc_id, {_NORM} AS norm FROM documents),
    verified AS (
      SELECT p.doc_a, p.doc_b,
             levenshtein(na.norm, nb.norm) AS edit_dist,
             length(na.norm) AS len_a, length(nb.norm) AS len_b
      FROM pairs p
      JOIN nt na ON na.doc_id = p.doc_a
      JOIN nt nb ON nb.doc_id = p.doc_b)
    SELECT doc_a, doc_b, edit_dist, len_a, len_b,
           edit_dist * 1.0 / greatest(len_a, len_b) AS rel_dist
    FROM verified
    WHERE edit_dist <= 64 AND edit_dist * 5 <= greatest(len_a, len_b)
    """,
    tags=("dedup", "fuzzy", "edit-distance", "extension"),
)
def dedup_edit_distance_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy dedup with an EDIT-DISTANCE verify stage: LSH candidate
    pairs whose normalized texts are within Levenshtein distance 64 AND
    within 20% relative distance (pure-integer gate
    5*dist <= max(len)).  This is the character-level complement of the
    shingle-set Jaccard verifier — it catches small in-place edits
    (typo fixes, number bumps, template fills) that shift every
    surrounding shingle, and its distance is a true metric on strings.
    Shape at scale: the quadratic-looking DP runs ONLY on LSH
    candidates (sub-quadratic volume), and Spark's thresholded
    ``levenshtein(l, r, 64)`` abandons each pair after the banded DP
    proves distance > 64 — O(threshold * min_len) per pair, not
    O(len_a * len_b); texts reach the verify join by two id-keyed
    shuffles of (id, norm) projections, never the full doc row.  The
    relative gate divides exact integers once, so both engines agree
    bit-for-bit."""
    from etl_8million_data__spark.operators.text import normalize_text

    d = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_candidate_pairs(d)
    nt = d.select("doc_id", normalize_text(F.col("text")).alias("norm"))
    na = nt.select(
        F.col("doc_id").alias("doc_a"),
        F.col("norm").alias("_na"),
        F.length("norm").alias("len_a"),
    )
    nb = nt.select(
        F.col("doc_id").alias("doc_b"),
        F.col("norm").alias("_nb"),
        F.length("norm").alias("len_b"),
    )
    lev = F.levenshtein(F.col("_na"), F.col("_nb"), 64)
    mx = F.greatest(F.col("len_a"), F.col("len_b"))
    return (
        pairs.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            lev.alias("edit_dist"),
            "len_a",
            "len_b",
        )
        .filter((F.col("edit_dist") >= 0) & (F.col("edit_dist") * 5 <= mx))
        .select(
            "doc_a",
            "doc_b",
            "edit_dist",
            "len_a",
            "len_b",
            (F.col("edit_dist") * 1.0 / mx).alias("rel_dist"),
        )
    )


@register(
    "dedup_containment_pairs",
    oracle=f"""
    WITH shingled AS ({_SHINGLED}),
    ex AS (SELECT doc_id, unnest(shingles) AS g FROM shingled),
    sz AS (SELECT doc_id, len(shingles) AS n FROM shingled),
    common AS (
      SELECT a.doc_id AS inner_doc, b.doc_id AS outer_doc,
             CAST(count(*) AS BIGINT) AS common
      FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id <> b.doc_id
      GROUP BY 1, 2)
    SELECT inner_doc, outer_doc, common,
           ni.n AS n_inner, no_.n AS n_outer,
           common * 1.0 / ni.n AS containment
    FROM common
    JOIN sz ni ON ni.doc_id = inner_doc
    JOIN sz no_ ON no_.doc_id = outer_doc
    WHERE common * 5 >= 4 * ni.n
    """,
    tags=("dedup", "containment", "similarity-join", "extension", "scale-path"),
)
def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT directed containment join (|inner ∩ outer| / |inner| >=
    4/5 on word-3-shingle sets) — the doc-in-doc detector Jaccard
    structurally misses: a paragraph quoted inside a long article
    keeps containment ~1 while its Jaccard collapses with the union.
    Inner docs are prefixed by their rarest shingles (asymmetric
    prefix filter: overlap >= ceil(t*n_in) forces a prefix hit); the
    outer side keeps full ranked postings because containment puts no
    lower bound on outer size — deliberately NO length filter, which
    is exactly what lets supersets through.  The oracle is the naive
    all-gram-sharing-pairs definition, so hash equality proves the
    pruned plan computes the textbook result.  Scaling-probe caveat
    (same regime as dedup_prefix_filter_pairs): the synthetic fixtures
    draw shingles from a FIXED vocabulary, so gram df — and with it
    candidate volume — densifies quadratically with corpus size
    (9.3x time on 10x docs at sf0.1); real corpora grow their
    vocabulary with size, which is the regime prefix filtering is
    designed for — measured at 3.2x time / linear pair growth on a
    vocabulary-growing corpus (tools/scaling_probe.py:
    vocab_growth_probe, SCALING.md)."""
    from etl_8million_data__spark.operators.dedup import containment_pairs

    d = load_table(spark, sf_dir, "documents")
    return containment_pairs(d, threshold_num=4, threshold_den=5)


@register(
    "dedup_graph_triangles",
    oracle=f"""
    WITH shingled AS ({_SHINGLED}), sig AS ({_SIG}), bands AS ({_BANDS}),
    e AS ({_PAIRS}),
    und AS (
      SELECT doc_a AS u, doc_b AS v FROM e
      UNION ALL SELECT doc_b, doc_a FROM e),
    deg AS (SELECT u, count(*) AS degree FROM und GROUP BY u),
    tri AS (
      SELECT e1.doc_a AS a, e1.doc_b AS b, e2.doc_b AS c
      FROM e e1
      JOIN e e2 ON e2.doc_a = e1.doc_a AND e2.doc_b > e1.doc_b
      JOIN e e3 ON e3.doc_a = e1.doc_b AND e3.doc_b = e2.doc_b),
    corners AS (
      SELECT a AS node FROM tri
      UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri),
    tc AS (SELECT node, count(*) AS n_triangles FROM corners GROUP BY node)
    SELECT d.u AS node, d.degree,
           CAST(coalesce(tc.n_triangles, 0) AS BIGINT) AS n_triangles,
           CASE WHEN d.degree >= 2
                THEN coalesce(tc.n_triangles, 0) * 2.0
                     / (d.degree * (d.degree - 1)) END AS clustering
    FROM deg d LEFT JOIN tc ON tc.node = d.u
    """,
    tags=("dedup", "graph", "extension", "scale-path"),
)
def dedup_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counts + local clustering coefficient over the near-dup
    candidate graph (LSH band pairs as edges) — the graph-shape audit
    of a dedup run: high-clustering knots are boilerplate families
    (safe to collapse to one keeper), low-clustering chains are
    transitive drift (risky to collapse — the classic near-dup chain
    A~B~C where A!~C).  Counted via DEGREE-ORDERED ORIENTATION: every
    edge points to its higher-(degree, id) endpoint, so wedge fan-out
    is bounded by out-degree O(sqrt(|E|)) even around hub documents —
    the standard distributed-triangle technique; the oracle counts the
    same triangles from the naive id-ordered enumeration.  Each
    triangle is attributed to all three corners; the coefficient is
    one exact division, NULL for degree-1 nodes."""
    from etl_8million_data__spark.operators.graph import triangle_counts

    d = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_candidate_pairs(d)
    return triangle_counts(pairs)


# Winnowing oracle fragments: gram-hash list per doc (first-6-hex fold
# of md5, the operators/text.py contract), then the rightmost-min of
# each 5-hash window via a left fold with a <= tie rule — bit-identical
# to operators/dedup.winnowing_fingerprints.
_WINNOW_SEL = f"""
  t AS (SELECT doc_id, {_TOKS} AS toks FROM documents
        WHERE len({_TOKS}) >= 8),
  g AS (
    SELECT doc_id,
           list_transform(range(len(toks) - 3), i ->
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(range(6), c ->
                 CAST(strpos('0123456789abcdef',
                      md5(array_to_string(toks[i+1:i+4], ' '))[c+1:c+1]) - 1
                   AS BIGINT))),
               (a, x) -> a * 16 + x)) AS hs
    FROM t),
  sel AS (
    SELECT doc_id,
           list_transform(range(len(hs) - 4), j ->
             list_reduce(
               list_transform(range(5), u -> [hs[j+u+1], CAST(j+u AS BIGINT)]),
               (acc, e) -> CASE WHEN e[1] <= acc[1] THEN e ELSE acc END)) AS fps
    FROM g)
"""


@register(
    "dedup_winnowing_fingerprints",
    oracle=f"""
    WITH {_WINNOW_SEL}
    SELECT DISTINCT doc_id, u.e[2] AS pos, u.e[1] AS fp
    FROM sel, unnest(sel.fps) AS u(e)
    """,
    tags=("dedup", "fingerprint", "winnowing", "extension", "scale-path"),
)
def dedup_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (MOSS) local fingerprints per document: the minimum
    gram hash of every 5-hash window over 4-token grams, rightmost on
    ties — see operators/dedup.winnowing_fingerprints for the
    guarantees (any shared >= 8-token run produces a shared
    fingerprint; density ~2/(w+1) independent of doc length). Pure
    narrow array work per doc; the oracle replays the identical hash
    fold and window minimum."""
    from etl_8million_data__spark.operators.dedup import winnowing_fingerprints

    d = load_table(spark, sf_dir, "documents")
    return winnowing_fingerprints(d, k=4, w=5)


@register(
    "dedup_winnowing_pairs",
    oracle=f"""
    WITH {_WINNOW_SEL},
    docfp AS (
      SELECT DISTINCT doc_id, u.e[1] AS fp
      FROM sel, unnest(sel.fps) AS u(e)),
    fpdf AS (SELECT fp, count(*) AS df FROM docfp GROUP BY fp),
    rare AS (
      SELECT d.doc_id, d.fp FROM docfp d JOIN fpdf USING (fp)
      WHERE fpdf.df <= 20),
    nfp AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM rare GROUP BY doc_id),
    shared AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(count(*) AS BIGINT) AS n_shared
      FROM rare a JOIN rare b ON a.fp = b.fp AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT doc_a, doc_b, n_shared,
           na.n AS n_a, nb.n AS n_b,
           n_shared * 1.0 / least(na.n, nb.n) AS overlap
    FROM shared
    JOIN nfp na ON na.doc_id = doc_a
    JOIN nfp nb ON nb.doc_id = doc_b
    WHERE n_shared >= 3
    """,
    tags=("dedup", "fingerprint", "winnowing", "similarity-join", "extension", "scale-path"),
)
def dedup_winnowing_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document pairs sharing >= 3 winnowed fingerprints — the MOSS
    match step: because winnowing guarantees a shared fingerprint for
    any shared run of >= w+k-1 tokens, this finds LOCAL overlap
    (quoted paragraphs, cloned passages) that whole-document and
    set-Jaccard methods dilute. Fingerprints present in more than 20
    documents are masked first (boilerplate — the standard MOSS
    exclusion), so join blocks stay bounded: the pair join is keyed on
    RARE fingerprints only, the same sub-quadratic shape as the LSH
    band join, and the overlap fraction n_shared/min(|A|,|B|) is one
    exact division."""
    from etl_8million_data__spark.operators.dedup import winnowing_fingerprints

    d = load_table(spark, sf_dir, "documents")
    fp = winnowing_fingerprints(d, k=4, w=5)
    docfp = fp.select("doc_id", "fp").distinct().localCheckpoint(eager=True)
    fpdf = docfp.groupBy("fp").agg(F.count(F.lit(1)).alias("df"))
    rare = docfp.join(fpdf.filter(F.col("df") <= 20), "fp").select("doc_id", "fp")
    nfp = rare.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = rare.select(F.col("doc_id").alias("doc_a"), "fp")
    b = rare.select(F.col("doc_id").alias("doc_b"), "fp")
    shared = (
        a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= 3)
    )
    na = nfp.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a"))
    nb = nfp.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b"))
    return (
        shared.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "n_shared",
            "n_a",
            "n_b",
            (F.col("n_shared") * 1.0 / F.least("n_a", "n_b")).alias("overlap"),
        )
    )


def _lpa_oracle(n_iter: int = 3) -> str:
    """DuckDB mirror of operators/graph.label_propagation_weighted over
    the winnowing-pair edge list: ``n_iter`` synchronous rounds, each
    adopting the neighbor label with the largest total incident weight
    under the (weight DESC, label ASC) total order."""
    parts = [
        f"""wp AS (
      WITH {_WINNOW_SEL},
      docfp AS (
        SELECT DISTINCT doc_id, u.e[1] AS fp
        FROM sel, unnest(sel.fps) AS u(e)),
      fpdf AS (SELECT fp, count(*) AS df FROM docfp GROUP BY fp),
      rare AS (
        SELECT d.doc_id, d.fp FROM docfp d JOIN fpdf USING (fp)
        WHERE fpdf.df <= 20)
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(count(*) AS BIGINT) AS w
      FROM rare a JOIN rare b ON a.fp = b.fp AND a.doc_id < b.doc_id
      GROUP BY 1, 2
      HAVING count(*) >= 3)""",
        """und AS (
      SELECT doc_a AS u, doc_b AS v, w FROM wp
      UNION ALL SELECT doc_b, doc_a, w FROM wp)""",
        f"""nodes AS (
      WITH {_WINNOW_SEL}
      SELECT DISTINCT doc_id AS node FROM sel)""",
        "l0 AS (SELECT node, node AS lbl FROM nodes)",
    ]
    for it in range(1, n_iter + 1):
        prev = f"l{it - 1}"
        parts.append(f"""s{it} AS (
      SELECT und.u AS node, l.lbl, CAST(sum(und.w) AS BIGINT) AS tw
      FROM und JOIN {prev} l ON l.node = und.v GROUP BY 1, 2)""")
        parts.append(f"""b{it} AS (
      SELECT node, lbl FROM (
        SELECT node, lbl, row_number() OVER (
          PARTITION BY node ORDER BY tw DESC, lbl) AS rn
        FROM s{it}) WHERE rn = 1)""")
        parts.append(f"""l{it} AS (
      SELECT p.node, coalesce(b.lbl, p.lbl) AS lbl
      FROM {prev} p LEFT JOIN b{it} b ON b.node = p.node)""")
    return (
        "WITH " + ",\n    ".join(parts) + f"""
    SELECT node AS doc_id, lbl AS community,
           CAST(count(*) OVER (PARTITION BY lbl) AS BIGINT) AS community_size
    FROM l{n_iter}
    """
    )


@register(
    "dedup_winnowing_communities",
    oracle=_lpa_oracle(3),
    tags=("dedup", "graph", "communities", "iterative", "extension", "scale-path"),
)
def dedup_winnowing_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted label-propagation communities over the winnowing
    local-overlap graph (edges = dedup_winnowing_pairs with weight =
    shared fingerprint count): the community refinement connected
    components can't give — CC fuses everything reachable, so one
    shared boilerplate bridge merges two distinct clone families; LPA
    keeps them apart because each document adopts the label with the
    LARGEST total overlap weight, not any reachable label. 3
    synchronous rounds under a (weight DESC, label ASC) total order —
    the entire iterative result is oracle-hash-checked like PageRank /
    k-means / the power iteration. Output: (doc_id, community,
    community_size); documents with no qualifying overlap stay
    singletons."""
    from etl_8million_data__spark.operators.dedup import winnowing_fingerprints
    from etl_8million_data__spark.operators.graph import label_propagation_weighted
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    edges = dedup_winnowing_pairs(spark, sf_dir).select(
        "doc_a", "doc_b", F.col("n_shared").alias("w")
    )
    nodes = winnowing_fingerprints(d, k=4, w=5).select(
        F.col("doc_id").alias("node")
    ).distinct()
    lab = label_propagation_weighted(
        edges, nodes, n_iter=3, src_col="doc_a", dst_col="doc_b", w_col="w"
    )
    wsz = Window.partitionBy("lbl")
    return lab.select(
        F.col("node").alias("doc_id"),
        F.col("lbl").alias("community"),
        F.count(F.lit(1)).over(wsz).cast("bigint").alias("community_size"),
    )


@register(
    "dedup_lsh_quality_vs_exact",
    oracle=f"""
    WITH shingled AS ({_SHINGLED}), sig AS ({_SIG}), bands AS ({_BANDS}),
    cand AS ({_PAIRS}),
    ex AS (SELECT doc_id, unnest(shingles) AS g FROM shingled),
    sz AS (SELECT doc_id, len(shingles) AS n FROM shingled),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(count(*) AS BIGINT) AS common
      FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    truth AS (
      SELECT doc_a, doc_b FROM common
      JOIN sz na ON na.doc_id = doc_a
      JOIN sz nb ON nb.doc_id = doc_b
      WHERE common * 3 >= na.n + nb.n),
    hits AS (
      SELECT t.doc_a FROM truth t
      JOIN cand c ON c.doc_a = t.doc_a AND c.doc_b = t.doc_b),
    true_cand AS (
      SELECT c.doc_a FROM cand c
      JOIN truth t ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b)
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM truth) AS n_true_pairs,
           (SELECT CAST(count(*) AS BIGINT) FROM cand) AS n_candidates,
           (SELECT CAST(count(*) AS BIGINT) FROM hits) AS n_hits,
           (SELECT (1000000 * CAST(count(*) AS BIGINT)) FROM hits)
             // greatest((SELECT count(*) FROM truth), 1) AS recall_micro,
           (SELECT (1000000 * CAST(count(*) AS BIGINT)) FROM true_cand)
             // greatest((SELECT count(*) FROM cand), 1) AS precision_micro
    """,
    tags=("dedup", "lsh", "quality", "extension"),
)
def dedup_lsh_quality_vs_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible QUALITY GATE for the probabilistic dedup path —
    the similarity_knn_ivf_recall pattern applied to MinHash-LSH:
    candidate pairs from the banded index are scored against the
    LOSSLESS prefix-filter join's ground truth (Jaccard >= 1/2), and
    the one-row report carries candidate recall (what fraction of true
    near-dup pairs the bands surface — LSH's miss rate is the
    probabilistic tradeoff being bought) and precision (what fraction
    of candidates survive exact verification — the verify stage's
    workload multiplier). Both inputs are deterministic, so the
    quality numbers themselves hash-match the oracle exactly; ratios
    are truncating integer-micro divisions guarded against empty
    denominators."""
    from etl_8million_data__spark.operators.dedup import (
        minhash_lsh_candidate_pairs,
        prefix_filter_pairs,
    )

    d = load_table(spark, sf_dir, "documents")
    truth = (
        prefix_filter_pairs(d, threshold_num=1, threshold_den=2)
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=True)
    )
    cand = minhash_lsh_candidate_pairs(d).localCheckpoint(eager=True)
    hits = truth.join(cand, ["doc_a", "doc_b"])
    nt = truth.agg(F.count(F.lit(1)).alias("n_true_pairs"))
    nc = cand.agg(F.count(F.lit(1)).alias("n_candidates"))
    nh = hits.agg(F.count(F.lit(1)).alias("n_hits"))
    return (
        nt.crossJoin(F.broadcast(nc))
        .crossJoin(F.broadcast(nh))
        .select(
            "n_true_pairs",
            "n_candidates",
            "n_hits",
            F.expr(
                "(1000000 * n_hits) div greatest(n_true_pairs, 1)"
            ).alias("recall_micro"),
            F.expr(
                "(1000000 * n_hits) div greatest(n_candidates, 1)"
            ).alias("precision_micro"),
        )
    )


@register(
    "dedup_threshold_coverage_curve",
    oracle=f"""
    WITH shingled AS ({_SHINGLED}),
    ex AS (SELECT doc_id, unnest(shingles) AS g FROM shingled),
    sz AS (SELECT doc_id, len(shingles) AS n FROM shingled),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(count(*) AS BIGINT) AS common
      FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    pairs AS (
      SELECT doc_a, doc_b, common,
             na.n + nb.n - common AS u
      FROM common
      JOIN sz na ON na.doc_id = doc_a
      JOIN sz nb ON nb.doc_id = doc_b
      WHERE common * 3 >= na.n + nb.n),
    grid AS (SELECT unnest([50, 60, 70, 80, 90]) AS thr),
    hit AS (
      SELECT g.thr, p.doc_a, p.doc_b
      FROM pairs p JOIN grid g ON p.common * 100 >= g.thr * p.u),
    docs AS (
      SELECT thr, doc_a AS d FROM hit
      UNION ALL SELECT thr, doc_b FROM hit),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM shingled)
    SELECT CAST(g.thr AS INT) AS thr_pct,
           CAST(coalesce(count(DISTINCT (h.doc_a, h.doc_b)), 0) AS BIGINT)
             AS n_pairs,
           CAST(coalesce(count(DISTINCT d.d), 0) AS BIGINT) AS n_docs_covered,
           (1000000 * CAST(coalesce(count(DISTINCT d.d), 0) AS BIGINT))
             // any_value(n.n_docs) AS covered_micro
    FROM grid g
    LEFT JOIN hit h ON h.thr = g.thr
    LEFT JOIN docs d ON d.thr = g.thr
    CROSS JOIN n
    GROUP BY g.thr
    """,
    tags=("dedup", "calibration", "extension"),
)
def dedup_threshold_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup THRESHOLD CALIBRATION curve — the table a curator reads to
    pick the Jaccard cutoff that meets a dedup budget (the
    text_quality_threshold_sweep pattern applied to near-dup removal):
    from ONE lossless similarity join at the loosest threshold (the
    prefix-filter join at 1/2), bucket every qualifying pair by the
    integer predicate common*100 >= thr*union for thr in 50..90 and
    report pairs and distinct-document coverage per cutoff. No
    re-join per threshold — the grid join fans each pair out to the
    thresholds it clears (<= 5 rows/pair); coverage fractions are
    truncating integer-micro divisions."""
    from etl_8million_data__spark.operators.dedup import (
        doc_shingle_frame,
        prefix_filter_pairs,
    )

    d = load_table(spark, sf_dir, "documents")
    pairs = (
        prefix_filter_pairs(d, threshold_num=1, threshold_den=2)
        .select("doc_a", "doc_b", "common", F.col("union_size").alias("u"))
        .localCheckpoint(eager=True)
    )
    grid = d.sparkSession.range(5).select(
        (F.lit(50) + F.col("id") * 10).cast("int").alias("thr")
    )
    hit = pairs.crossJoin(F.broadcast(grid)).filter(
        F.col("common") * 100 >= F.col("thr") * F.col("u")
    )
    docs = hit.select("thr", F.col("doc_a").alias("d")).unionByName(
        hit.select("thr", F.col("doc_b").alias("d"))
    )
    n = doc_shingle_frame(d).agg(F.count(F.lit(1)).alias("n_docs"))
    pair_counts = hit.groupBy("thr").agg(F.count(F.lit(1)).alias("n_pairs"))
    doc_counts = docs.groupBy("thr").agg(
        F.count_distinct("d").alias("n_docs_covered")
    )
    return (
        grid.join(pair_counts, "thr", "left")
        .join(doc_counts, "thr", "left")
        .crossJoin(F.broadcast(n))
        .select(
            F.col("thr").alias("thr_pct"),
            F.coalesce("n_pairs", F.lit(0)).cast("bigint").alias("n_pairs"),
            F.coalesce("n_docs_covered", F.lit(0)).cast("bigint").alias(
                "n_docs_covered"
            ),
            F.expr(
                "(1000000 * coalesce(n_docs_covered, 0)) div n_docs"
            ).alias("covered_micro"),
        )
    )


def _kcore_ctes(k: int, rounds: int) -> str:
    """Unrolled k-core peeling rounds over edge CTE ``e`` — the SQL
    mirror of operators/graph.kcore_nodes' fixed-round loop. Every
    round CTE is MATERIALIZED: each references its predecessor three
    times, so DuckDB's default CTE inlining would expand the chain
    3^rounds-fold (measured: exhausts file handles re-opening the
    parquet); materialization keeps the oracle linear in rounds, which
    is also exactly what the Spark side's per-round localCheckpoint
    does."""
    parts = [
        """und0 AS MATERIALIZED (
      SELECT doc_a AS u, doc_b AS v FROM e
      UNION ALL SELECT doc_b, doc_a FROM e)"""
    ]
    for r in range(rounds):
        parts.append(
            f"""k{r} AS MATERIALIZED (SELECT u FROM (
        SELECT u, count(*) AS c FROM und{r} GROUP BY u) WHERE c >= {k})"""
        )
        parts.append(
            f"""und{r + 1} AS MATERIALIZED (SELECT t.u, t.v FROM und{r} t
      JOIN k{r} a ON a.u = t.u JOIN k{r} b ON b.u = t.v)"""
        )
    return ",\n    ".join(parts)


@register(
    "dedup_graph_kcore",
    oracle=f"""
    WITH shingled AS ({_SHINGLED}), sig AS ({_SIG}), bands AS ({_BANDS}),
    e AS ({_PAIRS}),
    {_kcore_ctes(2, 8)}
    SELECT u AS node, CAST(count(*) AS BIGINT) AS core_degree
    FROM und8 GROUP BY u HAVING count(*) >= 2
    """,
    tags=("dedup", "graph", "kcore", "extension", "scale-path"),
)
def dedup_graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-core of the near-dup candidate graph (LSH band pairs as
    edges): 8 synchronous peeling rounds drop every document with
    fewer than 2 surviving near-dup links until the tight clone knots
    remain — the boilerplate families a dedup run can safely collapse
    to one keeper, separated from the chain periphery where transitive
    closure over-merges (A~B~C with A!~C contributes no 2-core mass
    unless the triangle actually closes). Complements the
    triangle/clustering audit: k-core is global (chains of any length
    peel away), clustering is local.

    The round count is FIXED, so the full iterative result is
    hash-checked against DuckDB's unrolled mirror; convergence within
    the bound is asserted in tests (an extra round removes nothing at
    fixture scale). Scale shape per round: one degree hash-aggregate
    (map-side partials) + two node-keyed semi joins, lineage truncated
    per round — the connected-components loop's shape with a
    degree filter instead of label propagation."""
    from etl_8million_data__spark.operators.graph import kcore_nodes

    d = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_candidate_pairs(d)
    return kcore_nodes(pairs, k=2, rounds=8)


@register(
    "dedup_sorted_neighborhood_pairs",
    oracle=f"""
    WITH t AS MATERIALIZED (
      SELECT doc_id, list_sort(shingles) AS ts
      FROM ({_SHINGLED})),
    k1 AS (
      SELECT doc_id,
             array_to_string(ts[1:10], '|') AS key,
             array_to_string(ts[1:2], '|') AS blk
      FROM t),
    r1 AS (SELECT doc_id, blk,
                  row_number() OVER (PARTITION BY blk ORDER BY key, doc_id) AS rn
           FROM k1),
    k2 AS (
      SELECT doc_id,
             array_to_string(list_reverse(ts)[1:10], '|') AS key,
             array_to_string(list_reverse(ts)[1:2], '|') AS blk
      FROM t),
    r2 AS (SELECT doc_id, blk,
                  row_number() OVER (PARTITION BY blk ORDER BY key, doc_id) AS rn
           FROM k2),
    cand AS (
      SELECT least(a.doc_id, b.doc_id) AS doc_a,
             greatest(a.doc_id, b.doc_id) AS doc_b
      FROM r1 a JOIN r1 b
        ON a.blk = b.blk AND b.rn BETWEEN a.rn + 1 AND a.rn + 3
      UNION
      SELECT least(a.doc_id, b.doc_id), greatest(a.doc_id, b.doc_id)
      FROM r2 a JOIN r2 b
        ON a.blk = b.blk AND b.rn BETWEEN a.rn + 1 AND a.rn + 3)
    SELECT c.doc_a, c.doc_b,
           len(list_intersect(a.ts, b.ts))
             / (len(a.ts) + len(b.ts) - len(list_intersect(a.ts, b.ts)))
             AS jaccard
    FROM cand c
    JOIN t a ON a.doc_id = c.doc_a
    JOIN t b ON b.doc_id = c.doc_b
    WHERE len(list_intersect(a.ts, b.ts))
          / (len(a.ts) + len(b.ts) - len(list_intersect(a.ts, b.ts))) >= 0.5
    """,
    tags=("dedup", "snm", "extension", "scale-path"),
)
def dedup_sorted_neighborhood_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-pass sorted-neighborhood near-dup pairs (Hernandez &
    Stolfo 1995) — the record-linkage blocking family, deliberately
    hash-free: documents sort by their canonical sorted-shingle
    sequence, each compares only with its 3 successors per pass
    (ascending + reversed-key passes cover block boundaries), and
    candidates verify by exact shingle-set Jaccard >= 0.5 — the SAME
    similarity the MinHash-LSH family verifies, so both candidate
    strategies are measured against one truth set. O(n·window)
    candidates, windows partitioned by 2-shingle block keys (never
    data-sized), lead() fan-out instead of a self-join
    (operators/dedup.py:sorted_neighborhood_pairs; recall vs the exact
    all-pairs truth gated in tests/test_snm.py)."""
    from etl_8million_data__spark.operators.dedup import sorted_neighborhood_pairs

    return sorted_neighborhood_pairs(
        load_table(spark, sf_dir, "documents"), window=4, threshold=0.5
    )


@register(
    "corpus_fuzzy_contamination",
    oracle=f"""
    WITH shingled AS ({_SHINGLED}),
    fsrc AS (SELECT doc_id, source FROM documents),
    fex AS (SELECT doc_id, unnest(shingles) AS g FROM shingled),
    fsz AS (SELECT doc_id, len(shingles) AS n FROM shingled),
    fcommon AS (
      SELECT a.doc_id AS bench_doc, b.doc_id AS train_doc,
             CAST(count(*) AS BIGINT) AS common
      FROM fex a
      JOIN fsrc sa ON sa.doc_id = a.doc_id AND sa.source = 'src0'
      JOIN fex b ON b.g = a.g AND b.doc_id <> a.doc_id
      JOIN fsrc sb ON sb.doc_id = b.doc_id AND sb.source <> 'src0'
      GROUP BY 1, 2)
    SELECT bench_doc, train_doc, common,
           ni.n AS n_bench,
           common * 1.0 / ni.n AS containment
    FROM fcommon
    JOIN fsz ni ON ni.doc_id = bench_doc
    WHERE common * 2 >= ni.n
    """,
    tags=("dedup", "contamination", "containment", "extension", "scale-path"),
)
def corpus_fuzzy_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FUZZY benchmark decontamination (the GPT-3/Llama-style sweep the
    exact-n-gram corpus_benchmark_contamination cannot do): every
    (benchmark doc, train doc) pair where the TRAIN doc contains >= 1/2
    of the benchmark doc's 3-word shingles. Containment — not Jaccard —
    is the right direction: a benchmark item quoted inside a long train
    document keeps containment ~1 while Jaccard collapses with the
    union, exactly the leak that inflates eval scores. The 'benchmark'
    here is the source='src0' slice (a held-out corpus partition);
    swapping in a real eval set is a one-line id-frame change.

    Scale shape: the asymmetric prefix filter runs with the INNER role
    restricted to the benchmark ids and the OUTER role to train ids
    BEFORE the candidate join (operators/dedup.containment_pairs
    inner_ids/outer_ids) — candidate cost is |benchmark-prefix grams| x
    their train-side postings, never train x train; benchmarks are
    small by definition, so the sweep stays cheap at any train-corpus
    size. The oracle is the naive all-gram definition restricted the
    same way, so hash equality proves the pruned plan computes the
    textbook result (7 contaminated pairs at sf0.001, 2 at sf0.01 —
    verified non-vacuous on the fixtures)."""
    from etl_8million_data__spark.operators.dedup import containment_pairs

    d = load_table(spark, sf_dir, "documents")
    bench = d.filter(F.col("source") == "src0").select("doc_id")
    train = d.filter(F.col("source") != "src0").select("doc_id")
    return containment_pairs(
        d, threshold_num=1, threshold_den=2, inner_ids=bench, outer_ids=train
    ).select(
        F.col("inner_doc").alias("bench_doc"),
        F.col("outer_doc").alias("train_doc"),
        "common",
        F.col("n_inner").alias("n_bench"),
        "containment",
    )
