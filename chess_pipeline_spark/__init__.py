"""chess_pipeline_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query / data-processing
capabilities of the reference pipeline (guidopetri/chess-pipeline) as
an idiomatic Spark DataFrame library, extended with large-scale
training-data-pipeline operators (dedup, similarity search, text
analysis, multimodal plumbing) and Structured-Streaming variants.

Layout
------
- ``session``     : SparkSession builder tuned for local[32] + cluster-ready confs
- ``sources``     : parquet / CSV / JDBC / JSON source adapters (incl. ns-timestamp fix)
- ``schemas``     : canonical table StructTypes + normalize-to-schema
- ``functions``   : scalar column-expression library (SURVEY §2.9)
- ``operators``   : relational operators — explode/join/aggregate/window (SURVEY §2.2-2.8)
- ``plans``       : the query catalog: named (Spark plan, DuckDB oracle SQL) pairs
- ``streaming``   : Structured Streaming variants (windows, watermark, dedup, upsert)

Design stance (SURVEY §7.1): every operator is a pure
``DataFrame -> DataFrame`` function; no custom Catalyst rules; UDFs
only where the built-ins genuinely cannot express the semantics
(PGN parsing; multimodal decode).
"""

__version__ = "0.1.0"
