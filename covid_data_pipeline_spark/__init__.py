"""covid_data_pipeline_spark — a PySpark-native analytics engine.

A clean-room, Spark-first re-expression of the query and data-processing
capabilities of the reference pipeline (bouncerist/covid_data_pipeline):
a four-layer medallion warehouse (raw → ods → dds → data_mart) with
window-function analytics and threshold alerting, plus the large-scale
training-data operators (dedup, similarity search, text analysis,
multimodal column plumbing) a 100 TB Spark deployment needs.

Everything is declarative DataFrame/SQL (Catalyst-optimizable built-ins);
Pandas UDFs only where built-ins genuinely cannot express the semantics.

Layout:
  session    — SparkSession builder with scale-aware defaults
  sources    — readers (csv/parquet/table/jdbc) and sinks (append /
               dynamic-partition-overwrite / replace, jdbc)
  functions  — column-level building blocks (conform, scalar, text)
  operators  — dataframe-level operators (relational, windows, dedup,
               similarity, multimodal)
  plans      — the covid medallion pipeline (raw/ods/dds/mart/alerts)
  streaming  — Structured Streaming variants of the incremental layer
"""

__version__ = "0.1.0"
