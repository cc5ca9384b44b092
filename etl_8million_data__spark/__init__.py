"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference ETL pipeline (hifzatahir568/ETL-8million-data-),
re-expressed Spark-first.

Subpackages
-----------
- ``sources``   : I/O adapters (CSV/Parquet/JSON scans, fixture-fed REST/scrape
  stand-ins) — SURVEY.md §2.1
- ``operators`` : composable DataFrame transforms (dedup, unpivot, upsert,
  top-k, minhash/simhash, similarity) — SURVEY.md §2.2-2.9 + extensions
- ``functions`` : scalar column expressions (string/date/JSON/null-handling)
  — SURVEY.md §2.8
- ``plans``     : the named query library backing ``__spark_entry__.queries()``
  with DuckDB oracle SQL for each
- ``streaming`` : event-time windows + Structured Streaming wrappers
  — SURVEY.md §2.10 / §7.2(4)
"""

__version__ = "0.1.0"
