"""Deduplication operators for training-data pipelines
(SURVEY.md §7.2(4)): exact, MinHash+LSH, SimHash.

All are compositions of built-in DataFrame ops — no Python UDFs — so
Catalyst sees the whole plan. Scale notes per operator:

- exact:    one hash-groupBy shuffle on a 32-byte key; at 100 TB,
            AQE coalesces the post-shuffle partitions.
- minhash:  signatures are computed in a narrow map stage (nested
            higher-order functions); only the (doc_id, band_key) pairs
            — tiny — hit the shuffle for the LSH self-join. The
            candidate-pair join is an equi-join on band_key, so skew =
            hot buckets; AQE skew-join splits those.
- simhash:  narrow map stage, one 64-bit int per doc.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from etl_8million_data__spark.operators.text import (
    md5_utf8,
    normalize_text,
    tokens,
    word_shingles,
)


def exact_fingerprint(text_col: Column) -> Column:
    """md5 of normalized text — exact-dup group key."""
    return md5_utf8(normalize_text(text_col))


def exact_dedup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One row per distinct content: fingerprint, dup_count, canonical
    (lowest) id — the 'hash-groupBy' exact dedup."""
    return (
        df.select(F.col(id_col), exact_fingerprint(F.col(text_col)).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("dup_count"),
            F.min(id_col).alias("canonical_doc_id"),
        )
    )


def minhash_min_frame(
    sh: DataFrame, id_col: str = "doc_id", num_hashes: int = 16
) -> DataFrame:
    """One row per doc with ``num_hashes`` MinHash columns ``_m0.._mN``:
    for seed j, min over shingles of md5(j || '|' || shingle). String-min
    over lowercase hex is a total order both engines agree on.

    Relational on purpose: the obvious nested
    ``transform(seq, j -> array_min(transform(shingles, md5...)))`` is
    CodegenFallback — every md5 evaluates interpreted, which measured
    ~9 s vs ~1 s for this formulation on the sf0.1 documents table (same
    trap simhash32_frame escaped). Here shingles explode to rows, the
    md5s run inside WholeStageCodegen, and the conditional-min hash
    aggregate combines map-side, so only (id, N hashes) hits the shuffle.
    Empty shingle sets are filtered by doc_shingle_frame upstream."""
    ex = sh.select(F.col(id_col), F.explode("shingles").alias("_s"))
    return ex.groupBy(id_col).agg(
        *[
            F.min(md5_utf8(F.concat(F.lit(f"{j}|"), F.col("_s")))).alias(f"_m{j}")
            for j in range(num_hashes)
        ]
    )


def minhash_signature_frame(
    sh: DataFrame, id_col: str = "doc_id", num_hashes: int = 16
) -> DataFrame:
    """(id, sig array<string>) — array form of minhash_min_frame."""
    mins = minhash_min_frame(sh, id_col, num_hashes)
    return mins.select(
        id_col, F.array(*[f"_m{j}" for j in range(num_hashes)]).alias("sig")
    )


def lsh_band_frame(
    mins: DataFrame, id_col: str = "doc_id", bands: int = 4, rows: int = 4
) -> DataFrame:
    """(id, band, band_key) — one row per band; band key = md5 of the
    comma-joined signature slice. Docs sharing any band key are candidate
    near-duplicates. Built from the plain ``_m*`` columns of
    minhash_min_frame so everything stays codegen (no array slicing)."""
    keys = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                md5_utf8(
                    F.concat_ws(",", *[f"_m{b * rows + r}" for r in range(rows)])
                ).alias("band_key"),
            )
            for b in range(bands)
        ]
    )
    return mins.select(F.col(id_col), F.explode(keys).alias("bk")).select(
        id_col, F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key")
    )


def spread(df: DataFrame, id_col: str) -> DataFrame:
    """Repartition by id before CPU-heavy per-row work.

    Small fixture files arrive as one input split, which would serialize
    the md5-heavy stages onto a single core; on a real cluster this
    same repartition balances skewed file sizes. Cost: one shuffle of
    the raw rows — cheap relative to the per-row hashing it parallelizes.
    """
    spark = df.sparkSession
    return df.repartition(spark.sparkContext.defaultParallelism, F.col(id_col))


def doc_shingle_frame(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """(id, distinct shingle set) for docs with >= k tokens.

    The >=k gate filters on token COUNT, not on the shingle array:
    ``filter(size(shingles) > 0)`` gets predicate-pushed below the
    repartition, where it re-inlines the whole interpreted shingle
    transform into the narrow pre-shuffle stage (all docs, one input
    split, twice — measured 8s vs 1s on sf0.1). size(split(..)) pushes
    down as one cheap codegen'd split and prunes the shuffle instead."""
    return (
        spread(df, id_col)
        # tokens staged as a named column: see word_shingles docstring
        .select(F.col(id_col), tokens(F.col(text_col)).alias("_toks"))
        .filter(F.size("_toks") >= k)
        .select(F.col(id_col), F.array_distinct(word_shingles(F.col("_toks"), k)).alias("shingles"))
    )


def minhash_lsh_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) via banded MinHash LSH.
    Pass ``shingles`` (a doc_shingle_frame) to share the tokenize+shingle
    stage with a downstream verifier instead of computing it twice."""
    rows = num_hashes // bands
    sh = shingles if shingles is not None else doc_shingle_frame(df, text_col, id_col, k)
    band = lsh_band_frame(
        minhash_min_frame(sh, id_col, num_hashes), id_col, bands, rows
    )
    # materialize once: the self-join would otherwise recompute the md5
    # signature pipeline for both sides. The band frame is tiny
    # (|docs| × bands rows of ~40 bytes); at petabyte scale you'd land
    # it in a temp table instead of executor storage.
    band = band.localCheckpoint(eager=True)
    a = band.alias("a")
    b = band.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
        .distinct()
    )


def jaccard_verified_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """LSH candidates filtered by exact shingle-set Jaccard >= threshold.
    Joins shingle sets only for the candidate pairs (the LSH output),
    never all-pairs — this is what keeps it sub-quadratic at scale.

    Pass ``shingles`` (a doc_shingle_frame-shaped (id, shingles) frame,
    already materialized by the caller) to share one tokenization with
    surrounding stages instead of re-tokenizing the corpus here."""
    # shingle sets feed the LSH pipeline AND both pair sides: compute once
    sh = (
        shingles
        if shingles is not None
        else doc_shingle_frame(df, text_col, id_col, k).localCheckpoint(eager=True)
    )
    pairs = minhash_lsh_candidate_pairs(df, text_col, id_col, k, shingles=sh)
    sa = sh.select(F.col(id_col).alias("doc_a"), F.col("shingles").alias("sh_a"))
    sb = sh.select(F.col(id_col).alias("doc_b"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", (inter / union).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def simhash32_frame(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, simhash) — 32-bit SimHash over each doc's distinct-token set.

    Fully relational formulation: explode distinct tokens to rows, md5
    each token ONCE, extract its 32 bits with shift/mask integer ops,
    and sum ±1 per bit in a single hash aggregate. Every stage is
    WholeStageCodegen (a higher-order-function fold over the token
    array is CodegenFallback and evaluates ~30× slower); the one
    shuffle moves skinny (id, 32 smallints) partial aggregates, and
    per-token rows parallelize huge documents instead of serializing
    them into one array. Near-dup distance = popcount(xor).
    """
    tok = df.select(
        F.col(id_col), F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("_t")
    )
    v = F.conv(F.substring(md5_utf8(F.col("_t")), 1, 8), 16, 10).cast("bigint")
    ints = tok.select(id_col, v.alias("_v"))
    # score_b = sum over tokens of (2*bit_b - 1); simhash bit b = score_b > 0
    scores = ints.groupBy(id_col).agg(
        *[
            F.sum(2 * F.shiftright(F.col("_v"), 31 - b).bitwiseAND(F.lit(1)) - 1).alias(f"_s{b}")
            for b in range(32)
        ]
    )
    sim = reduce(
        lambda a, b: a + b,
        [
            F.when(F.col(f"_s{b}") > 0, F.lit(1 << b).cast("bigint")).otherwise(
                F.lit(0).cast("bigint")
            )
            for b in range(32)
        ],
    )
    return scores.select(id_col, sim.alias("simhash"))


def prefix_filter_frames(
    docs: DataFrame,
    threshold_num: int = 1,
    threshold_den: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> dict[str, DataFrame]:
    """The PPJoin pipeline's intermediate frames, exposed so skew tests
    can audit the blocking stage directly (see prefix_filter_pairs for
    the algorithm): ``ex`` (_id, g) posting list, ``sz`` (_id, n) set
    sizes, ``prefix`` (_id, g, _rn, n) — the df-ranked prefix whose ``g``
    values are the BLOCKING KEYS (per-key block size bounds the largest
    irreducible join partition), and ``cand`` (doc_a, doc_b) — the
    distinct candidate pairs entering verification."""
    t_num, t_den = threshold_num, threshold_den
    sh = doc_shingle_frame(docs, text_col, id_col, k)
    # one materialized posting list: df ranking, the ranked prefix, and
    # BOTH sides of the verification join consume it (4 consumers -> 1
    # tokenize+shingle+explode instead of 4)
    ex = sh.select(
        F.col(id_col).alias("_id"), F.explode("shingles").alias("g")
    ).localCheckpoint(eager=True)
    sz = sh.select(
        F.col(id_col).alias("_id"), F.size("shingles").alias("n")
    ).localCheckpoint(eager=True)
    dfreq = ex.groupBy("g").agg(F.count(F.lit(1)).alias("_df"))
    w = Window.partitionBy("_id").orderBy("_df", "g")
    ranked = (
        ex.join(dfreq, "g")
        .withColumn("_rn", F.row_number().over(w))
        .join(sz, "_id")
    )
    # PROBE prefix length n - ceil(t*n) + 1, ceil(t*n) = (t_num*n + t_den - 1) div t_den
    ceil_tn = F.floor((F.col("n") * t_num + t_den - 1) / t_den).cast("int")
    prefix = ranked.filter(F.col("_rn") <= F.col("n") - ceil_tn + 1).select(
        "_id", "g", "_rn", "n"
    )
    # INDEX prefix (All-Pairs / PPJoin asymmetric prefixes): when the
    # pair is size-ordered so this side is the SMALLER set y, any
    # qualifying overlap is o >= t/(1+t)·(n_x+n_y) >= 2t/(1+t)·n_y, so
    # y only needs its first n - ceil(2t/(1+t)·n) + 1 rarest shingles
    # (~n/3 at t=1/2 vs the probe prefix's ~n/2) — lossless by the
    # prefix pigeonhole lemma applied at the true overlap. The probe
    # side's own bound o >= t·n_x needs n_y >= t·n_x, which the length
    # filter in the join enforces.
    ceil_2tn = F.floor(
        (F.col("n") * 2 * t_num + (t_num + t_den) - 1) / (t_num + t_den)
    ).cast("int")
    index_prefix = ranked.filter(F.col("_rn") <= F.col("n") - ceil_2tn + 1).select(
        "_id", "g", "_rn", "n"
    )
    a, b = prefix.alias("a"), index_prefix.alias("b")
    # required overlap α = ceil(t/(1+t) * (n_a + n_b)) as exact integers
    alpha = F.floor(
        (
            (F.col("a.n") + F.col("b.n")) * t_num + (t_num + t_den) - 1
        )
        / (t_num + t_den)
    )
    overlap_bound = 1 + F.least(
        F.col("a.n") - F.col("a._rn"), F.col("b.n") - F.col("b._rn")
    )
    cand = (
        a.join(
            b,
            (F.col("a.g") == F.col("b.g"))
            # size-ordered roles: a (probe prefix) is the LARGER set,
            # b (short index prefix) the smaller, ids break ties — every
            # unordered pair is examined under exactly one role split
            & (
                (F.col("a.n") > F.col("b.n"))
                | ((F.col("a.n") == F.col("b.n")) & (F.col("a._id") > F.col("b._id")))
            )
            # length filter: smaller set must be >= t * larger set
            & (F.col("b.n") * t_den >= F.col("a.n") * t_num)
            # position filter: best-case overlap from here must reach α
            & (overlap_bound >= alpha),
        )
        .select(
            F.least(F.col("a._id"), F.col("b._id")).alias("doc_a"),
            F.greatest(F.col("a._id"), F.col("b._id")).alias("doc_b"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    return {"ex": ex, "sz": sz, "prefix": prefix, "cand": cand}


def prefix_filter_pairs(
    docs: DataFrame,
    threshold_num: int = 1,
    threshold_den: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """EXACT set-similarity join via prefix filtering (the PPJoin
    family) — the lossless alternative to MinHash-LSH: every pair with
    shingle-set Jaccard >= t is returned, none missed.

    Order all shingles by ascending global document frequency (rarest
    first, ties on the shingle string); a document of set size n only
    needs its first ``n - ceil(t*n) + 1`` shingles as its PREFIX — two
    documents with J >= t MUST share a prefix shingle (if a pair misses
    A's whole prefix, their overlap is < t*n_a <= t*union). Candidates
    = pairs sharing any prefix shingle (rare shingles -> small blocks);
    verification counts common shingles only for candidates and keeps
    the pair via the pure-integer predicate
    ``common * (num + den) >= num * (n_a + n_b)``  (<=> J >= num/den).

    Three further LOSSLESS prunes from the PPJoin literature run inside
    the candidate join itself: the LENGTH filter (J >= t forces
    t_num*n_b <= t_den*n_a for n_a <= n_b — wildly different set sizes
    can never qualify), the POSITION filter (a match on prefix
    positions p_a, p_b bounds the best possible overlap by
    1 + min(n_a - p_a, n_b - p_b); if even that bound misses the
    required overlap ceil(t/(1+t)·(n_a+n_b)), the pair is pruned before
    it ever reaches verification), and the ASYMMETRIC INDEX PREFIX
    (All-Pairs: the size-smaller side of every pair only exposes its
    first n - ceil(2t/(1+t)·n) + 1 rarest shingles — ~n/3 at t=1/2 vs
    the probe prefix's ~n/2 — because its qualifying overlap is at
    least 2t/(1+t)·n). All are pure integer predicates.

    Scale shape: the df-rank window partitions by document (bounded by
    set size); prefix blocks are keyed by the RAREST shingles, so block
    sizes are the small end of the df distribution (boilerplate grams
    never become blocking keys; max block = 10 docs on the sf0.1
    fixtures), and the length+position filters cut candidates 3.3x
    (409k -> 125k measured at sf0.1, 977 -> 27 at sf0.01 against 25
    true pairs). Candidate volume is corpus-dependent: the synthetic
    fixtures draw shingles from a FIXED vocabulary, so every gram's df
    grows linearly with the corpus and pair density quadratically —
    real corpora grow their vocabulary with size, which is the regime
    prefix filtering is designed for. MEASURED, not argued: on a
    vocabulary-growing corpus (V = 5n, per-gram df ~flat) the same
    operator shows 3.0-4.5x time on 10x docs with exactly-linear output
    pair growth (tools/scaling_probe.py:vocab_growth_probe, SCALING.md)
    vs 8.3x under the fixed-vocab fixtures. Verification joins fan out only
    |candidates| x set size. Threshold is a rational num/den so the
    gate is integer-exact in any engine."""
    t_num, t_den = threshold_num, threshold_den
    frames = prefix_filter_frames(docs, t_num, t_den, text_col, id_col, k)
    ex, sz, cand = frames["ex"], frames["sz"], frames["cand"]
    ea = ex.select(F.col("_id").alias("doc_a"), F.col("g"))
    eb = ex.select(F.col("_id").alias("doc_b"), F.col("g"))
    common = (
        cand.join(ea, "doc_a")
        .join(eb, ["doc_b", "g"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    na = sz.select(F.col("_id").alias("doc_a"), F.col("n").alias("n_a"))
    nb = sz.select(F.col("_id").alias("doc_b"), F.col("n").alias("n_b"))
    return (
        common.join(na, "doc_a")
        .join(nb, "doc_b")
        .filter(
            F.col("common") * (t_num + t_den) >= t_num * (F.col("n_a") + F.col("n_b"))
        )
        .select(
            "doc_a",
            "doc_b",
            "common",
            (F.col("n_a") + F.col("n_b") - F.col("common")).alias("union_size"),
            (
                F.col("common") * 1.0
                / (F.col("n_a") + F.col("n_b") - F.col("common"))
            ).alias("jaccard"),
        )
    )


def containment_pairs(
    docs: DataFrame,
    threshold_num: int = 4,
    threshold_den: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    inner_ids: DataFrame | None = None,
    outer_ids: DataFrame | None = None,
) -> DataFrame:
    """EXACT directed containment join: every ordered pair (inner,
    outer) with shingle-set containment |inner ∩ outer| / |inner| >=
    t — the doc-in-doc detector.  Jaccard misses near-SUPERSETS (a
    quoted paragraph inside a long article, a doc re-issued with a
    boilerplate wrapper: the union grows with the outer doc, so J
    collapses while containment stays ~1); this is the asymmetric
    complement of :func:`prefix_filter_pairs`.

    Prefix filtering adapts to the asymmetry: overlap >= ceil(t*n_in)
    forces at least one shared shingle inside the INNER doc's
    ``n_in - ceil(t*n_in) + 1`` rarest-shingle prefix (else overlap <=
    ceil(t*n_in) - 1), so only the inner side is prefixed; the outer
    side keeps its full ranked postings because containment puts no
    lower bound on the outer size — there is NO length filter in the
    containment join, which is exactly why it catches what the
    Jaccard join's length filter (correctly) prunes.  The position
    filter still applies per match: best-case remaining overlap
    1 + min(n_in - p_in, n_out - p_out) must reach ceil(t*n_in).
    Verification counts common shingles for candidates only and keeps
    pairs via the pure-integer gate ``common * t_den >= t_num * n_in``.

    Scale shape: blocking keys are the inner docs' RAREST shingles
    (small df blocks); the outer side contributes df(g) postings per
    prefix gram.  Mutual containment (both directions emitted) flags
    near-equal pairs; one-directional rows are the true doc-in-doc
    hits."""
    t_num, t_den = threshold_num, threshold_den
    sh = doc_shingle_frame(docs, text_col, id_col, k)
    # one materialized posting list: df ranking, the ranked prefix, and
    # BOTH sides of the verification join consume it (4 consumers -> 1
    # tokenize+shingle+explode instead of 4)
    ex = sh.select(
        F.col(id_col).alias("_id"), F.explode("shingles").alias("g")
    ).localCheckpoint(eager=True)
    sz = sh.select(
        F.col(id_col).alias("_id"), F.size("shingles").alias("n")
    ).localCheckpoint(eager=True)
    dfreq = ex.groupBy("g").agg(F.count(F.lit(1)).alias("_df"))
    w = Window.partitionBy("_id").orderBy("_df", "g")
    ranked = (
        ex.join(dfreq, "g")
        .withColumn("_rn", F.row_number().over(w))
        .join(sz, "_id")
        .localCheckpoint(eager=True)
    )
    ceil_tn = F.floor((F.col("n") * t_num + t_den - 1) / t_den).cast("int")
    prefix = ranked.filter(F.col("_rn") <= F.col("n") - ceil_tn + 1)
    # Optional role restriction (cross-corpus containment, e.g. fuzzy
    # benchmark decontamination): inner_ids/outer_ids are single-column
    # id frames; a left-semi prune BEFORE the candidate join keeps its
    # cost proportional to the restricted sides (the df ranking stays
    # corpus-global so the position filter sees one consistent order).
    if inner_ids is not None:
        ii = inner_ids.select(F.col(inner_ids.columns[0]).alias("_id"))
        prefix = prefix.join(ii, "_id", "left_semi")
    outer_ranked = ranked
    if outer_ids is not None:
        oi = outer_ids.select(F.col(outer_ids.columns[0]).alias("_id"))
        outer_ranked = ranked.join(oi, "_id", "left_semi")
    a, b = prefix.alias("a"), outer_ranked.alias("b")
    alpha = F.floor((F.col("a.n") * t_num + t_den - 1) / t_den)
    overlap_bound = 1 + F.least(
        F.col("a.n") - F.col("a._rn"), F.col("b.n") - F.col("b._rn")
    )
    cand = (
        a.join(
            b,
            (F.col("a.g") == F.col("b.g"))
            & (F.col("a._id") != F.col("b._id"))
            & (overlap_bound >= alpha),
        )
        .select(F.col("a._id").alias("inner_doc"), F.col("b._id").alias("outer_doc"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    ea = ex.select(F.col("_id").alias("inner_doc"), F.col("g"))
    eb = ex.select(F.col("_id").alias("outer_doc"), F.col("g"))
    common = (
        cand.join(ea, "inner_doc")
        .join(eb, ["outer_doc", "g"])
        .groupBy("inner_doc", "outer_doc")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    ni = sz.select(F.col("_id").alias("inner_doc"), F.col("n").alias("n_inner"))
    no = sz.select(F.col("_id").alias("outer_doc"), F.col("n").alias("n_outer"))
    return (
        common.join(ni, "inner_doc")
        .join(no, "outer_doc")
        .filter(F.col("common") * t_den >= t_num * F.col("n_inner"))
        .select(
            "inner_doc",
            "outer_doc",
            "common",
            "n_inner",
            "n_outer",
            (F.col("common") * 1.0 / F.col("n_inner")).alias("containment"),
        )
    )


def winnowing_fingerprints(
    docs: DataFrame,
    k: int = 4,
    w: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03 — the MOSS algorithm): hash every ``k``-token gram, then
    in each window of ``w`` consecutive gram hashes select the minimum
    (rightmost on ties). The selected (position, hash) set is a LOCAL
    fingerprint with two guarantees the global rolling hash
    (text_doc_fingerprint) lacks: any shared run of at least w+k-1
    tokens yields at least one shared fingerprint (detection
    guarantee), and density is ~2/(w+1) of the grams regardless of
    document length — robust to insertions/reorderings that break
    whole-document hashes.

    Scale shape: everything is NARROW per-document array work (one
    transform for gram hashes, one w-bounded fold per window, one
    array_distinct) after the ``spread`` repartition — no shuffle, no
    fan-out beyond the selected ~n/w rows per doc. Engine-portable by
    construction: integer hash = first-6-hex-chars fold of md5 (the
    operators/text.py contract), left-fold window minimum with a <=
    tie rule (later position wins) that any engine replays exactly.

    Returns (doc_id, pos, fp): pos = 0-based gram position of each
    selected fingerprint. Docs with fewer than k+w-1 tokens (no full
    window) emit nothing."""
    from etl_8million_data__spark.operators.text import hex_prefix_int, md5_utf8

    base = (
        spread(docs, id_col)
        .select(F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("_toks"))
        .filter(F.size("_toks") >= k + w - 1)
    )
    hs = F.transform(
        F.sequence(F.lit(0), F.size("_toks") - k),
        lambda i: hex_prefix_int(
            md5_utf8(F.array_join(F.slice(F.col("_toks"), i + 1, k), " ")), 6
        ),
    )
    hashed = base.select("doc_id", hs.alias("_hs"))
    sel = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size("_hs") - w),
            lambda j: F.aggregate(
                F.sequence(j + 1, j + w - 1),
                F.struct(
                    F.element_at("_hs", (j + 1).cast("int")).alias("fp"),
                    j.cast("bigint").alias("pos"),
                ),
                lambda acc, u: F.when(
                    F.element_at("_hs", (u + 1).cast("int")) <= acc["fp"],
                    F.struct(
                        F.element_at("_hs", (u + 1).cast("int")).alias("fp"),
                        u.cast("bigint").alias("pos"),
                    ),
                ).otherwise(acc),
            ),
        )
    )
    return (
        hashed.select("doc_id", F.explode(sel).alias("_s"))
        .select("doc_id", F.col("_s.pos").alias("pos"), F.col("_s.fp").alias("fp"))
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    window: int = 4,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    _return_frames: bool = False,
) -> DataFrame:
    """Sorted-neighborhood (SNM) near-dup detection — the record-linkage
    blocking family (Hernandez & Stolfo 1995), a deliberate hash-free
    alternative to the LSH/SimHash candidate generators: documents sort
    by a canonical key, each compares only with its ``window - 1``
    successors, and candidates verify with exact shingle-set Jaccard
    >= ``threshold`` (the SAME similarity the MinHash-LSH family
    verifies, so the two candidate strategies are comparable against
    one truth set).

    Canonical key = the doc's SORTED DISTINCT 3-WORD-SHINGLE list,
    joined with '|' — near-dups share most shingles, so their sorted
    shingle sequences agree on a long prefix and they land adjacent no
    matter where the edits sit in the raw text. TWO passes cover
    boundary blindness (the classic multi-pass SNM fix): pass 1
    sorts/blocks on the ascending shingle sequence (first 2 shingles as
    the block key), pass 2 on the REVERSED sequence (last shingles
    lead) — a pair split across a pass-1 block boundary shares a pass-2
    neighborhood unless it differs at BOTH ends. The union of both
    passes' windows is the candidate set.

    Scale shape: O(n·window) candidate pairs instead of O(n²) — each
    pass is one narrow map + one window partitioned by block key (never
    a data-sized unpartitioned window) + a lead() fan-out, and the
    verify join touches candidates only. Block keys are 2-shingle
    prefixes, so block cardinality grows with the corpus vocabulary and
    blocks stay small; a pathological single-block corpus degrades to
    the window cost, not to all-pairs. Everything is deterministic
    ((key, id) total order, least/greatest pair normalization), so the
    candidate set itself hash-checks cross-engine."""
    ts = doc_shingle_frame(df, text_col, id_col).select(
        F.col(id_col).alias("doc_id"), F.array_sort("shingles").alias("ts")
    )

    def one_pass(arr: Column) -> DataFrame:
        keyed = ts.select(
            "doc_id",
            # sort key TRUNCATED to the first 10 shingles (the 2-shingle
            # block key + an 8-shingle prefix): adjacency inside a block
            # is decided by the leading shingles, and the untruncated
            # key shuffled a doc-sized string per row per pass — shuffle
            # bytes scaled with total corpus text twice. The oracle
            # mirrors the same truncation (ts[1:10]).
            F.array_join(F.slice(arr, 1, 10), "|").alias("key"),
            F.array_join(F.slice(arr, 1, 2), "|").alias("blk"),
        )
        w = Window.partitionBy("blk").orderBy("key", "doc_id")
        nbrs = keyed.select(
            "doc_id",
            F.array(
                *[F.lead("doc_id", i).over(w) for i in range(1, window)]
            ).alias("nbrs"),
        )
        return (
            nbrs.select("doc_id", F.explode("nbrs").alias("nbr"))
            .filter(F.col("nbr").isNotNull())
            .select(
                F.least("doc_id", "nbr").alias("doc_a"),
                F.greatest("doc_id", "nbr").alias("doc_b"),
            )
        )

    cands = (
        one_pass(F.col("ts"))
        .unionAll(one_pass(F.reverse(F.col("ts"))))
        .distinct()
    )
    if _return_frames:
        return {"ts": ts, "cands": cands}
    inter = F.size(F.array_intersect("ts_a", "ts_b"))
    jac = inter / (F.size("ts_a") + F.size("ts_b") - inter)
    return (
        cands.join(ts.select(F.col("doc_id").alias("doc_a"), F.col("ts").alias("ts_a")), "doc_a")
        .join(ts.select(F.col("doc_id").alias("doc_b"), F.col("ts").alias("ts_b")), "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def sorted_neighborhood_frames(
    df: DataFrame,
    window: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict[str, DataFrame]:
    """SNM's intermediate frames for scale audits: ``cands`` is the
    distinct union of both passes' window pairs (the O(n·window) set
    entering verification), ``ts`` the sorted-shingle frame."""
    return sorted_neighborhood_pairs(
        df, window=window, text_col=text_col, id_col=id_col, _return_frames=True
    )
