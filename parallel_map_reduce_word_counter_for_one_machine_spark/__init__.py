"""PySpark-native analytics engine with the capabilities of the reference
``MohdFawaz/parallel-map-reduce-word-counter-for-one-machine`` (see SURVEY.md),
re-expressed Spark-first: DataFrame/SQL logical plans, Catalyst/Tungsten
physical execution, Structured Streaming for unbounded sources.

The reference is a single-machine multi-threaded MapReduce word counter
(reference src/main.cpp:78-281). This package generalizes that surface to a
full relational + LLM-data-pipeline engine designed for 1000-executor /
100 TB scale while remaining testable on local[32].

Layout
------
- ``session``    : tuned SparkSession builders (local test + scale notes)
- ``sources``    : table loaders / schemas for the driver's parquet tables
- ``operators``  : query surface (wordcount, relational, dedup, similarity,
                   text analysis, multimodal)
- ``functions``  : scalar/expression helpers kept JVM-side
- ``plans``      : physical-plan inspection helpers (broadcast/pushdown
                   assertions used by tests)
- ``streaming``  : Structured Streaming operators (watermark + windows,
                   stateful ops) and their batch-mode equivalents
- ``registry``   : the queries()/oracle_sql() registration decorator
"""

__version__ = "0.1.0"
