"""Pipeline-parity queries: the real stage-3/4/5 pipeline code
(pipelines/financials.py, summary.py, quotes.py) run end-to-end under
the driver's oracle gate.

Shape: driver fixture rows -> construct nested payload JSON (the
reference's bronze format, details.py:139-153) -> run the actual
pipeline (from_json + explode-chain / wide projection) -> compare
against a DuckDB oracle that computes the same result *directly from
the relational rows*, no JSON involved. Exact equality proves the
nest -> parse -> flatten round trip preserves every value, date, and
coalesce/regex derivation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_8million_data__spark.catalog import load_table
from etl_8million_data__spark.pipelines.financials import unpivot_financials
from etl_8million_data__spark.pipelines.quotes import quote_snapshot
from etl_8million_data__spark.pipelines.summary import normalize_summary
from etl_8million_data__spark.plans.registry import register


def _events_payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events -> one payload JSON per synthetic symbol (user_id)."""
    e = load_table(spark, sf_dir, "events")
    # Shuffle FIRST on the cheap derived key, THEN run the expensive
    # projection (get_json_object / date_format) post-shuffle: the
    # fixture arrives as one input split, so projecting before the
    # exchange would serialize the JSON parsing onto a single core.
    # One exchange, reused four times: hash-partitioning by symbol alone
    # satisfies the ClusteredDistribution of the window (symbol,...,metric)
    # AND of all three nested groupBys (each key set has symbol as a
    # prefix), so the window-dedup + 3 nesting aggregates below run
    # shuffle-free after this single repartition. The explicit partition
    # count keeps AQE from coalescing the (byte-small but CPU-heavy)
    # map-building stages onto too few cores.
    e = e.withColumn(
        "symbol", F.concat(F.lit("SYM"), F.col("user_id").cast("string"))
    ).repartition(spark.sparkContext.defaultParallelism, F.col("symbol"))
    k = F.get_json_object("props", "$.k").try_cast("int")
    base = e.select(
        "symbol",
        F.when(F.col("event_type").isin("click", "view"), "cashflow")
        .when(F.col("event_type").isin("purchase", "signup"), "incomestatement")
        .otherwise("balancesheet")
        .alias("folder"),
        F.when(F.col("event_id") % 2 == 0, "yearly").otherwise("quarterly").alias("freq"),
        F.date_format("ts", "yyyy-MM-dd").alias("date_str"),
        F.concat(F.lit("metric_"), (k % 5).cast("string")).alias("metric"),
        "value",
        "event_id",
    )
    w = Window.partitionBy("symbol", "folder", "freq", "date_str", "metric").orderBy(
        F.col("event_id").desc()
    )
    ded = base.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)
    by_date_metrics = ded.groupBy("symbol", "folder", "freq", "date_str").agg(
        F.map_from_entries(F.collect_list(F.struct("metric", "value"))).alias("metrics")
    )
    by_freq = by_date_metrics.groupBy("symbol", "folder", "freq").agg(
        F.map_from_entries(F.collect_list(F.struct("date_str", "metrics"))).alias("by_date")
    )
    per_symbol = by_freq.groupBy("symbol").agg(
        F.map_from_entries(
            F.collect_list(
                F.struct(F.concat("folder", F.lit("."), "freq").alias("k"), F.col("by_date"))
            )
        ).alias("fm")
    )

    def stmt(folder: str):
        return F.struct(
            F.try_element_at("fm", F.lit(f"{folder}.yearly")).alias("yearly"),
            F.try_element_at("fm", F.lit(f"{folder}.quarterly")).alias("quarterly"),
        ).alias(folder)

    info = F.create_map(
        F.lit("longName"),
        F.concat(F.lit("Name "), "symbol"),
        F.lit("currency"),
        F.lit("USD"),
        F.lit("financialCurrency"),
        F.lit("USD"),
    ).alias("info")
    return per_symbol.select(
        "symbol",
        F.to_json(F.struct(info, stmt("cashflow"), stmt("balancesheet"), stmt("incomestatement"))).alias(
            "payload"
        ),
    )


@register(
    "pipeline_financials_unpivot",
    oracle="""
    WITH base AS (
      SELECT 'SYM' || user_id AS stock,
             CASE WHEN event_type IN ('click','view') THEN 'CF'
                  WHEN event_type IN ('purchase','signup') THEN 'IS'
                  ELSE 'BS' END AS statement_type,
             CASE WHEN event_id % 2 = 0 THEN 'yearly' ELSE 'quarterly' END AS freq,
             CAST(date_trunc('day', ts) AS DATE) AS d,
             'metric_' || (CAST(json_extract_string(props, '$.k') AS INTEGER) % 5) AS metric,
             value, event_id
      FROM events),
    dedup AS (
      SELECT * FROM base
      QUALIFY row_number() OVER (
        PARTITION BY stock, statement_type, freq, d, metric
        ORDER BY event_id DESC) = 1)
    SELECT stock,
           'Name ' || stock AS yf_name,
           statement_type, metric,
           'USD' AS stockcurrency, 'USD' AS financialcurrency,
           year(d) AS calendar_year,
           CASE WHEN freq = 'yearly' THEN 4 ELSE quarter(d) END AS period,
           value,
           d AS date
    FROM dedup
    """,
    tags=("pipeline", "parity", "unpivot"),
)
def pipeline_financials_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events nested into bronze payload JSON, then flattened by the
    *actual* stage-3 pipeline (from_json + explode chain,
    Financilas.py:71-107 parity). Oracle computes the same fact rows
    relationally — exact match proves the round trip."""
    return unpivot_financials(_events_payloads(spark, sf_dir))


@register(
    "pipeline_summary_enrichment",
    oracle=r"""
    WITH prose AS (
      SELECT doc_id, source,
             'Name DOC' || doc_id AS expected_name,
             'Acme ' || source || ' Corp does business. It was formerly known as Doc'
               || doc_id || ' Holdings, among other names. The company was founded in '
               || (1900 + doc_id % 120) || ' and is headquartered in City'
               || (doc_id % 7)
               || CASE doc_id % 3 WHEN 1 THEN ', TX'
                                  WHEN 2 THEN ', TX, United States of America'
                                  ELSE '' END
               || '. It makes things.' AS long_summary
      FROM documents)
    SELECT 'DOC' || doc_id AS stock,
           expected_name AS yf_name,
           long_summary,
           CASE doc_id % 4 WHEN 0 THEN 17000 WHEN 1 THEN 250 ELSE NULL END AS employees,
           1900 + doc_id % 120 AS founded_year,
           'Doc' || doc_id || ' Holdings' AS former_name,
           CASE WHEN doc_id % 5 = 0 THEN 'JsonCity' ELSE 'City' || (doc_id % 7) END AS city,
           CASE WHEN doc_id % 3 = 2 THEN 'TX' ELSE NULL END AS state,
           CASE doc_id % 3 WHEN 1 THEN 'TX'
                           WHEN 2 THEN 'United States of America'
                           ELSE NULL END AS country
    FROM prose
    """,
    tags=("pipeline", "parity", "regex"),
)
def pipeline_summary_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constructed prose with known founded/former/HQ facts, wrapped as
    payload JSON, then enriched by the *actual* stage-4 pipeline
    (Summary.py:118-147 regexes). The oracle states the intended
    extraction directly — so this checks the regexes against their
    spec, not against themselves."""
    d = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    prose = F.concat(
        F.lit("Acme "),
        "source",
        F.lit(" Corp does business. It was formerly known as Doc"),
        did,
        F.lit(" Holdings, among other names. The company was founded in "),
        (1900 + F.col("doc_id") % 120).cast("string"),
        F.lit(" and is headquartered in City"),
        (F.col("doc_id") % 7).cast("string"),
        F.when(F.col("doc_id") % 3 == 1, ", TX")
        .when(F.col("doc_id") % 3 == 2, ", TX, United States of America")
        .otherwise(""),
        F.lit(". It makes things."),
    )
    emp = (
        F.when(F.col("doc_id") % 4 == 0, "17,000 employees")
        .when(F.col("doc_id") % 4 == 1, "250")
        .when(F.col("doc_id") % 4 == 2, "n/a")
        .otherwise(F.lit(None).cast("string"))
    )
    info = F.map_filter(
        F.create_map(
            F.lit("longName"), F.concat(F.lit("Name DOC"), did),
            F.lit("longBusinessSummary"), prose,
            F.lit("fullTimeEmployees"), emp,
            F.lit("city"), F.when(F.col("doc_id") % 5 == 0, "JsonCity"),
        ),
        lambda k, v: v.isNotNull(),
    )
    raw = d.select(
        F.concat(F.lit("DOC"), did).alias("symbol"),
        F.to_json(F.struct(info.alias("info"))).alias("payload"),
    )
    return normalize_summary(raw).select(
        "stock",
        "yf_name",
        "long_summary",
        "employees",
        "founded_year",
        "former_name",
        "city",
        "state",
        "country",
    )


@register(
    "pipeline_quotes_snapshot",
    oracle="""
    SELECT 'SYM' || c_custkey AS symbol,
           'Cust ' || c_custkey AS name,
           'USD' AS currency,
           CASE WHEN c_custkey % 2 = 0 THEN round(c_acctbal * 2, 2)
                ELSE c_acctbal END AS price,
           round(c_acctbal - 1.0, 2) AS previous_close,
           c_custkey * 10 AS volume,
           DATE '1970-01-01' + CAST((1718841600 + c_custkey * 86400) // 86400 AS INT)
             AS ex_dividend_date
    FROM customer
    """,
    tags=("pipeline", "parity", "quotes"),
)
def pipeline_quotes_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer rows wrapped as quote-info payloads, projected by the
    *actual* stage-5 pipeline: coalesce-across-sources price chain
    (lastPrice only for even keys) and epoch->date conversion."""
    c = load_table(spark, sf_dir, "customer")
    ck = F.col("c_custkey").cast("string")
    info = F.map_filter(
        F.create_map(
            F.lit("shortName"), F.concat(F.lit("Cust "), ck),
            F.lit("currency"), F.lit("USD"),
            F.lit("lastPrice"),
            F.when(F.col("c_custkey") % 2 == 0, F.round(F.col("c_acctbal") * 2, 2).cast("string")),
            F.lit("regularMarketPrice"), F.col("c_acctbal").cast("string"),
            F.lit("previousClose"), F.round(F.col("c_acctbal") - 1.0, 2).cast("string"),
            F.lit("volume"), (F.col("c_custkey") * 10).cast("string"),
            F.lit("exDividendDate"),
            (F.lit(1718841600) + F.col("c_custkey") * 86400).cast("string"),
        ),
        lambda k, v: v.isNotNull(),
    )
    raw = c.select(
        F.concat(F.lit("SYM"), ck).alias("symbol"),
        F.to_json(F.struct(info.alias("info"))).alias("payload"),
    )
    return quote_snapshot(raw).select(
        "symbol", "name", "currency", "price", "previous_close", "volume", "ex_dividend_date"
    )
