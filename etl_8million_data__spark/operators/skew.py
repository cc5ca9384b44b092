"""Skew mitigation: salted two-phase aggregation.

The EAV model makes some keys ubiquitous (SURVEY §4: popular metrics
like 'Accounts Payable' appear for every symbol), so single-key
reducers become stragglers at 100 TB. The standard fix: append a salt
to the hot key, aggregate partially per (key, salt), then aggregate
the partials — two small shuffles instead of one skewed one.

AQE's skew-join splitting handles *join* skew automatically
(session.py enables it); this operator is the *aggregation* analog,
and it is exact for any algebraic aggregate (sum/count/min/max here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    sum_cols: dict[str, "F.Column"],
    salt_buckets: int = 16,
) -> DataFrame:
    """Exact sum/count aggregation over skewed keys via salting.

    ``sum_cols`` maps output name -> column expression to sum
    (use exact integer expressions for determinism).
    """
    # any salt distribution preserves exactness (the outer agg re-merges);
    # monotonically_increasing_id spreads rows evenly without a hash of
    # the (hot) key, which would defeat the purpose
    salted = df.withColumn("_salt", F.monotonically_increasing_id() % salt_buckets)
    partial = salted.groupBy(*key_cols, "_salt").agg(
        F.count(F.lit(1)).alias("_cnt"),
        *[F.sum(expr).alias(f"_s_{name}") for name, expr in sum_cols.items()],
    )
    return partial.groupBy(*key_cols).agg(
        F.sum("_cnt").alias("cnt"),
        *[F.sum(f"_s_{name}").alias(name) for name in sum_cols],
    )


def salted_broadcast_replicate_join(
    big: DataFrame,
    small: DataFrame,
    key: str | list[str],
    salt_buckets: int = 8,
) -> DataFrame:
    """Manual skew-join salting for when the small side is too big to
    broadcast outright but the big side has hot keys: the big side gets
    a row-spread salt, the small side is replicated ``salt_buckets``
    times (explode over the salt range), and the equi-join runs on
    (keys..., salt) — each hot key now fans across ``salt_buckets``
    reducers instead of one straggler. Exact for any join semantics
    (every big row still meets every matching small row exactly once,
    in exactly one salt bucket); composite keys salt identically — the
    salt spreads ROWS, so it is independent of how many columns make
    up the key.

    AQE's skew-join split (on in session.py) usually makes this
    unnecessary; keep it for engines/paths where AQE is off (streaming
    micro-batches) or when the skew is known ahead of time.
    """
    keys = [key] if isinstance(key, str) else list(key)
    big_s = big.withColumn("_salt", F.monotonically_increasing_id() % salt_buckets)
    small_r = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    ).withColumn("_salt", F.col("_salt").cast("long"))
    out = big_s.join(small_r, [*keys, "_salt"])
    return out.drop("_salt")
