"""job_market_research_spark — a PySpark-native analytics engine.

Re-implements, Spark-first, the query and data-processing capabilities
of the reference ETL+analytics pipeline (TacticalNuze/Job_market_research,
surveyed in /root/repo/SURVEY.md): schema'd multi-source ingest, cleaning
and normalization operators, deduplication, dimensional (star-schema)
ETL, the Superset analytical query surface, plus the large-scale
training-data-pipeline operators (near-dup detection, similarity search,
text analysis, multimodal column plumbing) the reference lacks.

Design principles (SURVEY §4, §7):
- DataFrame/SQL declarative plans; Catalyst does pushdown/pruning/join
  selection. No custom Catalyst rules are needed.
- Native `pyspark.sql.functions` in the hot path; Arrow-vectorized
  pandas UDFs only for genuinely non-relational operators (NER/LLM
  enrichment, multimodal decode).
- Every operator is a composable `DataFrame -> DataFrame` function and
  is also exposed as a named query with a DuckDB oracle twin in
  `job_market_research_spark.registry`.
"""

__version__ = "0.1.0"
