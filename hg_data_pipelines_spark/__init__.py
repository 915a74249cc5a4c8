"""hg_data_pipelines_spark — a PySpark-native analytics/ETL engine.

A from-scratch rebuild of the data-processing capabilities of the
HeritageGuard/hg-data-pipelines reference (a single-machine Dagster +
pandas pipeline), re-expressed as idiomatic, 100-TB-scale PySpark:

- explicit schemas + Parquet warehouse (``schemas``, ``io``)
- relational/window/nested operators declared as lazy DataFrame plans
  (``queries`` — every one oracle-checked against DuckDB)
- geometry / projection math as vectorized pandas UDFs (``functions.geometry``)
- the three reference pipelines as Spark jobs (``pipelines``)
- LLM-data-pipeline extensions: dedup, similarity search, text analysis,
  multimodal binary columns (``operators``, ``functions.text``, ``multimodal``)
- Structured Streaming jobs over the events stream (``streaming``)
"""

__version__ = "0.1.0"
