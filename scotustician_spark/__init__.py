"""scotustician_spark — a PySpark-native analytics engine.

Re-expresses the query and data-processing semantics of the reference
system (reedmarkham/scotustician: batch ETL + SQL analytics + vector
clustering over oral-argument transcripts) as idiomatic Spark
DataFrame/SQL pipelines, designed for 100 TB-scale execution:

- ``session``    — tuned SparkSession factory (AQE, Arrow, UTC).
- ``sources``    — readers/sinks incl. quarantine ("junk") routing.
- ``documents``  — nested-JSON flatten / chunk pipeline (the reference's
                   transformers service re-done with posexplode).
- ``plans``      — the medallion (bronze/silver/gold) SQL layer and the
                   relational query library used for oracle testing.
- ``functions``  — scalar/vector/text function library.
- ``operators``  — dedup (exact/MinHash-LSH/SimHash), similarity search,
                   top-k per group, sessionization, as-of join.
- ``streaming``  — incremental (AvailableNow) pipelines.
- ``ml``         — clustering + 2-D projection (distributed + driver
                   escape hatch mirroring the reference).
"""

__version__ = "0.1.0"
