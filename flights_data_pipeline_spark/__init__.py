"""flights_data_pipeline_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference ELT pipeline ``bhismaroi/flights-data-pipeline`` (an Airflow +
Postgres + MinIO star-schema pipeline; see SURVEY.md), re-expressed
Spark-first: DataFrame/SQL declarative plans, Catalyst optimization, AQE,
dynamic partition overwrite for idempotent incremental loads, and
Structured Streaming + Pandas-UDF extension operators for large-scale
training-data pipelines (dedup, similarity search, text analysis,
multimodal columns).

Layout:
  session     — SparkSession factory (UTC, AQE, partition-overwrite)
  io          — schema registry, CSV codec with the reference NULL
                convention, parquet/catalog helpers
  operators   — named relational operator surface (scan/join/agg/window/
                upsert) per SURVEY.md §2
  functions   — scalar function library (JSON, datetime, surrogate keys)
  queries     — the declared query registry consumed by __spark_entry__
  pipeline    — the flights star-schema pipeline (staging → dims → facts)
  extensions  — dedup / similarity / text-analysis / multimodal operators
  streaming   — Structured Streaming operators over the events table
"""

__version__ = "0.1.0"
