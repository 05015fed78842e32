"""project_etl_spark — a PySpark-native analytics engine.

Brand-new engine with the query/data-processing capabilities of the
reference system (CeliaFernandez/Project-ETL, a CMS ETL detector DAQ +
processing pipeline — see SURVEY.md). Everything is expressed Spark-first:
DataFrame/SQL logical plans optimized by Catalyst, Structured Streaming for
the streaming surface, Arrow-vectorized pandas UDFs only where built-in
operators cannot express the semantics.

Layout:
- ``session``    SparkSession factory with scale-oriented defaults
- ``io``         fixture-table loaders (explicit schemas, pruned scans)
- ``registry``   the declared-query registry (name -> builder + DuckDB oracle)
- ``operators/`` one module per SURVEY.md §2 operator family
- ``streaming/`` Structured Streaming pipelines (ingest + watchdog analogs)
- ``decode``     binary frame decode kernel (Arrow-vectorized)
"""

__version__ = "0.1.0"
