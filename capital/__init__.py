"""capital — a PySpark-native analytics engine.

A brand-new engine re-expressing the data-processing semantics of the
reference project ``DE-ta-e-il/catch-me-my-capital`` (an Airflow/Glue/
Redshift financial-data platform) as idiomatic Spark: DataFrame/Spark SQL
on Catalyst, Structured Streaming for incremental work, and LLM-data-
pipeline operators (dedup / similarity / text analysis) designed for
100 TB scale.

Layout (see SURVEY.md §7):

- :mod:`capital.session`   — SparkSession factory with scale-ready conf
- :mod:`capital.io`        — layered-lake readers/writers (ymd partitioning)
- :mod:`capital.schemas`   — StructType registry (the "Glue catalog")
- :mod:`capital.functions` — scalar function library (date/string/json)
- :mod:`capital.operators` — relational operators (as-of, dedup, reshape,
  windows, calendar)
- :mod:`capital.sources`   — ingestion sources (paginated REST, HTML
  tables, config registries) re-imagined as offline-testable components
- :mod:`capital.streaming` — Structured Streaming incremental layer
- :mod:`capital.llm`       — training-data pipeline ops (dedup, similarity
  search, text analysis, multimodal plumbing)
- :mod:`capital.queries`   — the checkable query surface (SURVEY.md §2),
  each entry paired with a DuckDB oracle SQL string
"""

__version__ = "0.1.0"
