"""carrot-transform-spark: a PySpark-native analytics/ETL engine.

A from-scratch engine with the query and data-processing capabilities of
Health-Informatics-UoN/carrot-transform (streaming health-data ETL to OMOP
CDM), re-expressed Spark-first: declarative DataFrame plans optimized by
Catalyst, broadcast dictionary joins, grouping-set metric rollups, and
scale-oriented LLM-data-pipeline operators (dedup, similarity search, text
analysis, multimodal columns) on top of the same planner.

Layout:
    omop/       OMOP CDM DDL -> StructType schemas + field-role config
    rules/      mapping-rules JSON (v1/v2) -> canonical IR
    plans/      IR -> DataFrame plan compiler (the "query engine")
    operators/  reusable Spark operator library (fanout, combos, ids, dedup...)
    functions/  scalar Column expression builders (dates, text)
    sources/    CSV dir / JDBC / S3-MinIO readers
    sinks/      TSV dir / JDBC writers
    metrics/    multi-level count rollup (grouping sets)
    streaming/  Structured Streaming surface over the same plans
    queries/    registered analytics queries + DuckDB oracle SQL (test gate)
"""

__version__ = "0.1.0"
