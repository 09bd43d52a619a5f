"""outage_data_scraper_spark — a PySpark-native crawl + outage-analytics engine.

A from-scratch re-expression of the capabilities of
Urban-Research-Group/outage-data-scraper (see SURVEY.md) as a distributed
URL-frontier + fetch-scheduler engine over snapshot-versioned columnar tables:

- ``schemas``     explicit StructTypes for pages / frontier / seen / robots /
                  fetch_log / records / gold (reference inferred everything
                  dynamically; see SURVEY.md §1.3).
- ``catalog``     snapshot-versioned Parquet tables with append / overwrite /
                  time-travel semantics (Iceberg-shaped interface; swaps to a
                  real Iceberg catalog when its jars are on the classpath).
- ``frontier``    salted-host priority pop, exact + Bloom URL-seen set,
                  robots gate, politeness token buckets, the wave loop.
- ``parsers``     site-family payload parsers as vectorized pandas/Arrow UDFs
                  (no per-row Python at the Spark level).
- ``operators``   pipeline standardization, sessionization, dedup families,
                  similarity search, text analysis, multimodal plumbing.
- ``functions``   column-level helpers (URL canonicalization, text metrics)
                  built from pyspark.sql.functions so Catalyst can optimize.
"""

__version__ = "0.1.0"
