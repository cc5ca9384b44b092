"""Multimodal plumbing query: binary payload -> Arrow-batched feature
extraction via mapInPandas, oracle-checked because the deterministic
fake decoder's outputs are SQL-expressible (byte length, header hex).
The point of the oracle here is to pin the *plumbing* — schema, batch
shape, binary round-trip — not the codec."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from etl_8million_data__spark.catalog import load_table
from etl_8million_data__spark.operators.multimodal import (
    documents_as_media,
    extract_features,
)
from etl_8million_data__spark.plans.registry import register


@register(
    "multimodal_feature_extract",
    oracle="""
    SELECT doc_id AS media_id,
           octet_length(encode(text)) AS n_bytes,
           lower(hex(encode(substr(text, 1, 4)))) AS header_hex,
           octet_length(encode(text)) % 640 AS fake_width,
           (octet_length(encode(text)) % 3) + 1 AS fake_channels
    FROM documents
    """,
    tags=("multimodal", "pandas-udf", "extension"),
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents-as-binary -> mapInPandas feature extraction.

    NOTE: header_hex as hex-of-first-4-*chars* in the oracle matches
    hex-of-first-4-*bytes* in the UDF only for ASCII payloads — true
    for the fixtures; the operator itself is byte-correct.
    """
    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    return extract_features(media)


@register(
    "multimodal_frame_sample",
    oracle="""
    WITH f AS (
      SELECT doc_id AS media_id, text,
             unnest(range(CAST(ceil(octet_length(encode(text)) / 256.0)
                               AS BIGINT))) AS frame_no
      FROM documents)
    SELECT media_id, CAST(frame_no AS INTEGER) AS frame_no,
           octet_length(encode(substr(text, CAST(frame_no*256 + 1 AS INTEGER), 256)))
             AS frame_bytes,
           md5(substr(text, CAST(frame_no*256 + 1 AS INTEGER), 256)) AS frame_md5
    FROM f
    """,
    tags=("multimodal", "pandas-udf", "extension"),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1 -> N frame sampling (video/audio chunking shape): each binary
    payload emits one row per 256-byte window with its md5 — proves the
    mapInPandas expansion contract (variable output rows per input).
    ASCII fixtures make byte-md5 == string-md5 in the oracle."""
    from etl_8million_data__spark.operators.multimodal import sample_frames

    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    return sample_frames(media)


@register(
    "multimodal_resize_thumbnail",
    oracle="""
    WITH m AS (
      SELECT doc_id AS media_id, hex(encode(text)) AS hx,
             octet_length(encode(text)) AS n
      FROM documents),
    s AS (
      SELECT media_id, n,
             least(64, (n + 3) // 4) AS n_out, hx
      FROM m)
    SELECT media_id,
           CAST(n AS BIGINT) AS in_bytes,
           CAST(n_out AS BIGINT) AS out_bytes,
           lower(array_to_string(
             list_transform(range(n_out), i -> substr(hx, CAST(i*8 + 1 AS INTEGER), 2)),
             '')) AS thumb_hex
    FROM s
    """,
    tags=("multimodal", "pandas-udf", "resize", "extension"),
)
def multimodal_resize_thumbnail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload -> deterministic fake resize (every 4th byte,
    capped at 64) via Arrow-batched mapInPandas — the image-thumbnail
    plumbing with a REAL oracle: the strided byte sample is re-expressed
    in SQL as hex-string slicing, so schema, batch shape, and the binary
    round-trip are all value-checked. A real resizer replaces
    fake_resize behind the same (media_id, content) -> RESIZE_SCHEMA
    contract."""
    from etl_8million_data__spark.operators.multimodal import resize_media

    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    return resize_media(media)


@register(
    "multimodal_frame_dedup",
    oracle="""
    WITH f AS (
      SELECT doc_id AS media_id,
             md5(substr(text, CAST(u.frame_no*256 + 1 AS INTEGER), 256)) AS frame_md5
      FROM documents,
           unnest(range(CAST(ceil(octet_length(encode(text)) / 256.0) AS BIGINT)))
             AS u(frame_no)),
    s AS (
      SELECT frame_md5, count(DISTINCT media_id) AS n_media
      FROM f GROUP BY frame_md5)
    SELECT f.media_id,
           count(*) AS n_frames,
           CAST(sum(CASE WHEN s.n_media >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS shared_frames,
           CAST(sum(CASE WHEN s.n_media >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*) AS shared_ratio
    FROM f JOIN s ON s.frame_md5 = f.frame_md5
    GROUP BY f.media_id
    """,
    tags=("multimodal", "dedup", "extension", "scale-path"),
)
def multimodal_frame_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-level dedup across media — the cross-video content-dedup
    primitive: chunk every binary payload into frames (sample_frames,
    the 1->N mapInPandas stage), hash each frame, count how many
    distinct media share each hash, and report per-media how much of
    its content is duplicated elsewhere (re-encoded uploads, clip
    reuse, intro/outro boilerplate).

    Scale shape: frames shuffle on their md5 — a uniformly distributed
    key, so no skew; the share table joins back co-partitioned on the
    same key; the final aggregate keys on media_id. Never compares
    payload bytes pairwise — identical frames meet in the hash bucket."""
    from pyspark.sql import functions as F

    from etl_8million_data__spark.operators.multimodal import sample_frames

    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    f = sample_frames(media).select("media_id", "frame_md5")
    s = f.groupBy("frame_md5").agg(
        F.count_distinct("media_id").alias("n_media")
    )
    shared = F.when(F.col("n_media") >= 2, 1).otherwise(0)
    return (
        f.join(s, "frame_md5")
        .groupBy("media_id")
        .agg(
            F.count(F.lit(1)).alias("n_frames"),
            F.sum(shared).cast("bigint").alias("shared_frames"),
            (F.sum(shared).cast("double") / F.count(F.lit(1))).alias("shared_ratio"),
        )
    )


@register(
    "multimodal_perceptual_near_dup",
    oracle="""
    WITH m AS (
      SELECT doc_id AS media_id, text, length(text) AS n,
             greatest(length(text) // 49, 1) AS stride
      FROM documents WHERE length(text) >= 1),
    h AS (
      SELECT media_id,
             CAST(list_sum(list_transform(range(48), i ->
               CASE WHEN ord(substr(text, CAST((i*stride) % n + 1 AS INTEGER), 1)) >
                         ord(substr(text, CAST(((i+1)*stride) % n + 1 AS INTEGER), 1))
                    THEN (CAST(1 AS BIGINT) << i) ELSE 0 END)) AS BIGINT) AS dhash
      FROM m),
    b AS (
      SELECT media_id, dhash, j.j AS band,
             (dhash >> (j.j*12)) & 4095 AS band_key
      FROM h CROSS JOIN (SELECT unnest(range(4)) AS j) j)
    SELECT DISTINCT a.media_id AS media_a, b2.media_id AS media_b,
           bit_count(xor(a.dhash, b2.dhash)) AS hamming
    FROM b a JOIN b b2 ON a.band = b2.band AND a.band_key = b2.band_key
                      AND a.media_id < b2.media_id
    WHERE bit_count(xor(a.dhash, b2.dhash)) <= 6
    """,
    tags=("multimodal", "dedup", "perceptual", "extension", "scale-path"),
)
def multimodal_perceptual_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-dup pairs across media: 48-bit gradient dHash
    per payload (operators/multimodal.perceptual_hash — the fingerprint
    that survives re-encoding, where the exact frame md5 of
    multimodal_frame_dedup does not), then the simhash-style banded
    blocking: 4 x 12-bit bands, candidates = any shared band, verified
    at hamming distance <= 6 via bit_count(xor). Scale shape: the hash
    is a narrow Arrow-batched map; only (media_id, band, band_key) ever
    shuffles; the hamming verify runs on candidate pairs only — never
    all pairs."""
    from pyspark.sql import functions as F

    from etl_8million_data__spark.operators.multimodal import perceptual_hash

    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    h = perceptual_hash(media).filter(F.col("n_bytes") >= 1).localCheckpoint(eager=True)
    bands = h.select(
        "media_id",
        "dhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(j).alias("band"),
                    F.shiftright("dhash", j * 12).bitwiseAND(F.lit(4095)).alias(
                        "band_key"
                    ),
                )
                for j in range(4)
            ])
        ).alias("b"),
    ).select("media_id", "dhash", F.col("b.band").alias("band"), F.col("b.band_key").alias("band_key"))
    a, bb = bands.alias("a"), bands.alias("b")
    hamming = F.bit_count(F.col("a.dhash").bitwiseXOR(F.col("b.dhash")))
    return (
        a.join(
            bb,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .select(
            F.col("a.media_id").alias("media_a"),
            F.col("b.media_id").alias("media_b"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= 6)
        .distinct()
    )


@register(
    "multimodal_e2e_curation",
    oracle="""
    WITH m AS (
      SELECT doc_id AS media_id, text, octet_length(encode(text)) AS n
      FROM documents),
    q AS (SELECT * FROM m WHERE n >= 64),
    ex AS (SELECT media_id, md5(text) AS dg FROM q),
    keep1 AS (SELECT min(media_id) AS media_id FROM ex GROUP BY dg),
    s1 AS (SELECT q.* FROM q JOIN keep1 USING (media_id)),
    h AS (
      SELECT media_id, text, n,
             CAST(list_sum(list_transform(range(48), i ->
               CASE WHEN ord(substr(text,
                      CAST((i*greatest(n // 49, 1)) % n + 1 AS INTEGER), 1)) >
                         ord(substr(text,
                      CAST(((i+1)*greatest(n // 49, 1)) % n + 1 AS INTEGER), 1))
                    THEN (CAST(1 AS BIGINT) << i) ELSE 0 END)) AS BIGINT) AS dhash
      FROM s1),
    b AS (
      SELECT media_id, dhash, j.j AS band,
             (dhash >> (j.j*12)) & 4095 AS band_key
      FROM h CROSS JOIN (SELECT unnest(range(4)) AS j) j),
    drop2 AS (
      SELECT DISTINCT b2.media_id
      FROM b a JOIN b b2 ON a.band = b2.band AND a.band_key = b2.band_key
                        AND a.media_id < b2.media_id
      WHERE bit_count(xor(a.dhash, b2.dhash)) <= 6),
    s2 AS (
      SELECT s1.* FROM s1 LEFT JOIN drop2 d USING (media_id)
      WHERE d.media_id IS NULL),
    f AS (
      SELECT s2.media_id,
             md5(substr(s2.text, CAST(u.frame_no*256 + 1 AS INTEGER), 256))
               AS frame_md5
      FROM s2,
           unnest(range(CAST(ceil(s2.n / 256.0) AS BIGINT))) AS u(frame_no)),
    sh AS (SELECT frame_md5, count(DISTINCT media_id) AS n_media
           FROM f GROUP BY frame_md5),
    per AS (
      SELECT f.media_id,
             count(*) AS n_frames,
             CAST(sum(CASE WHEN sh.n_media >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS shared_frames
      FROM f JOIN sh USING (frame_md5) GROUP BY f.media_id)
    SELECT s2.media_id,
           CAST(s2.n AS BIGINT) AS n_bytes,
           s2.n % 640 AS fake_width,
           (s2.n % 3) + 1 AS fake_channels,
           per.n_frames, per.shared_frames,
           per.shared_frames * 1.0 / per.n_frames AS shared_ratio
    FROM s2 JOIN per USING (media_id)
    """,
    tags=("multimodal", "e2e", "curation", "extension", "scale-path"),
)
def multimodal_e2e_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MEDIA counterpart of corpus_e2e_curation — the whole
    multimodal curation pass as one declarative plan producing the
    curated-manifest table:

    1. quality gate (payload >= 64 bytes — stand-in for decode
       validity, same position a real codec check occupies);
    2. EXACT dedup: md5 of the full payload, keep the smallest id per
       digest (re-uploads collapse);
    3. PERCEPTUAL dedup: 48-bit gradient dHash, 4x12-bit banded
       blocking, hamming <= 6 verify, deterministic keep-smallest —
       drops re-encodes the exact pass cannot see;
    4. per-survivor frame stats: 256-byte frame hashes shared across
       surviving media (clip-reuse evidence, reported not gated);
    5. manifest: id, size, fake decode attrs, frame counts,
       shared-frame ratio.

    Every stage is the already-audited operator (md5 hash-groupBy,
    banded LSH equi-joins, frame-hash shuffle on a uniform key); the
    composition adds NO new shuffle shape — the plan is a linear chain
    of hash aggregates and equi-joins, each keyed as its standalone
    twin.  Payload bytes cross the wire exactly twice (dHash map,
    frame chunking); everything downstream moves (id, hash) pairs."""
    from pyspark.sql import functions as F

    from etl_8million_data__spark.operators.multimodal import (
        perceptual_hash,
        sample_frames,
    )

    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    q = media.filter(F.octet_length("content") >= 64)
    ex = q.select("media_id", F.md5("content").alias("dg"))
    keep1 = ex.groupBy("dg").agg(F.min("media_id").alias("media_id")).select(
        "media_id"
    )
    s1 = q.join(keep1, "media_id")

    h = perceptual_hash(s1).localCheckpoint(eager=True)
    bands = h.select(
        "media_id",
        "dhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(j).alias("band"),
                    F.shiftright("dhash", j * 12)
                    .bitwiseAND(F.lit(4095))
                    .alias("band_key"),
                )
                for j in range(4)
            ])
        ).alias("b"),
    ).select(
        "media_id", "dhash",
        F.col("b.band").alias("band"), F.col("b.band_key").alias("band_key"),
    )
    a, bb = bands.alias("a"), bands.alias("b")
    drop2 = (
        a.join(
            bb,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.media_id") < F.col("b.media_id"))
            & (
                F.bit_count(F.col("a.dhash").bitwiseXOR(F.col("b.dhash"))) <= 6
            ),
        )
        .select(F.col("b.media_id").alias("media_id"))
        .distinct()
    )
    s2 = s1.join(drop2, "media_id", "left_anti").localCheckpoint(eager=True)

    f = sample_frames(s2).select("media_id", "frame_md5")
    sh = f.groupBy("frame_md5").agg(F.count_distinct("media_id").alias("n_media"))
    shared = F.when(F.col("n_media") >= 2, 1).otherwise(0)
    per = (
        f.join(sh, "frame_md5")
        .groupBy("media_id")
        .agg(
            F.count(F.lit(1)).alias("n_frames"),
            F.sum(shared).cast("bigint").alias("shared_frames"),
        )
    )
    n = F.octet_length("content")
    return (
        s2.join(per, "media_id")
        .select(
            "media_id",
            n.cast("bigint").alias("n_bytes"),
            (n % 640).alias("fake_width"),
            ((n % 3) + 1).alias("fake_channels"),
            "n_frames",
            "shared_frames",
            (F.col("shared_frames") * 1.0 / F.col("n_frames")).alias("shared_ratio"),
        )
    )


_ENERGY_POS = "CAST(win*64 + i + 1 AS INT)"
_ENERGY_ORD = f"ord(text[{_ENERGY_POS}:{_ENERGY_POS}])"


@register(
    "multimodal_audio_energy_trim",
    oracle=f"""
    WITH m AS (SELECT doc_id AS media_id, text, length(text) AS n
               FROM documents),
    w AS (SELECT media_id, n, text,
                 unnest(range((n + 63) // 64)) AS win FROM m),
    e AS (
      SELECT media_id, CAST(win AS INT) AS win,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(range(64), i ->
                 CASE WHEN win*64 + i + 1 <= n
                      THEN CAST(({_ENERGY_ORD} - 128) * ({_ENERGY_ORD} - 128)
                             AS BIGINT)
                      ELSE 0 END)), (a, x) -> a + x) AS energy
      FROM w)
    SELECT media_id,
           CAST(count(*) AS BIGINT) AS n_windows,
           CAST(sum(CASE WHEN energy >= 60000 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_active,
           min(CASE WHEN energy >= 60000 THEN win END) AS first_active,
           max(CASE WHEN energy >= 60000 THEN win END) AS last_active,
           CAST(sum(CASE WHEN energy >= 60000 THEN energy ELSE 0 END) AS BIGINT)
             AS active_energy
    FROM e GROUP BY media_id
    """,
    tags=("multimodal", "audio", "pandas-udf", "extension"),
)
def multimodal_audio_energy_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio silence-trim summary per payload: windowed 8-bit-PCM
    energy from the Arrow-batched numpy kernel
    (operators/multimodal.waveform_energy_windows), then one
    media-keyed aggregate marking active (energy >= 60000) windows and
    the [first_active, last_active] trim span — the
    voice-activity-detection shape a real audio pipeline runs before
    chunking, with the codec stubbed by the byte-derived deterministic
    kernel (exact on the ASCII fixtures). Energies are exact integers
    end-to-end, so the mapInPandas output itself is oracle-checked, not
    just its plumbing."""
    from pyspark.sql import functions as F

    from etl_8million_data__spark.operators.multimodal import (
        waveform_energy_windows,
    )

    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    e = waveform_energy_windows(media, 64)
    active = F.when(F.col("energy") >= 60000, F.col("win"))
    return e.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n_windows"),
        F.sum(F.when(F.col("energy") >= 60000, 1).otherwise(0)).alias("n_active"),
        F.min(active).alias("first_active"),
        F.max(active).alias("last_active"),
        F.sum(F.when(F.col("energy") >= 60000, F.col("energy")).otherwise(0)).alias(
            "active_energy"
        ),
    )
