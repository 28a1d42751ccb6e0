"""serverless_datalake_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference
serverless data lake (``fernandogoncalves-me/serverless-datalake``,
surveyed in SURVEY.md): event ingestion into a partitioned lake,
cataloging, range-query replay, per-source fan-out — plus the full
relational query surface (joins, aggregations, windows, set ops,
scalar functions) and LLM-data-pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing), all built on the public
PySpark DataFrame/SQL API so Catalyst/Tungsten pick the physical
strategy.

Layout:
  session.py    SparkSession factory (AQE on, scale-tuned defaults)
  tables.py     fixture-table loading + temp-view registration
  queries/      the oracle-verified query registry (driver contract)
  operators/    composed operators Spark lacks natively (as-of join,
                MinHash-LSH, SimHash, cosine top-k, text analysis)
  sources/      lake read/write, ingest pipeline, catalog, replay
  streaming/    Structured Streaming jobs (watermarks, fan-out, dedup)
"""

__version__ = "0.1.0"
