"""employee_activity_etl_poc_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first rebuild of the data-processing capabilities of
the reference repo ``Florian-Biggio/employee-activity-etl-poc`` (a pandas +
delta-rs + kafka-python medallion ETL POC), re-expressed as declarative
DataFrame / SQL plans so Catalyst + Tungsten pick the physical strategy.

Layout
------
- ``session``    SparkSession factory (AQE, UTC, Arrow, local tuning).
- ``schemas``    canonical StructTypes + FR->EN rename maps (SURVEY §1.3).
- ``sources``    readers/sinks (parquet, csv-with-sniffing, excel-via-driver,
                 jdbc, delta behind import-try).
- ``functions``  scalar column-expression builders (SURVEY §2.7 F1-F17).
- ``operators``  relational ops, dedup (exact/minhash/simhash/jaccard),
                 similarity search, text analysis, multimodal plumbing.
- ``quality``    data-quality rule engine -> violations DataFrame.
- ``plans``      named query registry consumed by ``__spark_entry__``.
- ``streaming``  CDC envelope parse, watermark dedup, foreachBatch sinks.
"""

__version__ = "0.1.0"
