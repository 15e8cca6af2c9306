"""PySpark-native analytics engine with the capability surface of
KevinJoerg/MBFBigDataRandomForest (see SURVEY.md), re-expressed Spark-first.

Layout
------
- ``session``    : SparkSession factory tuned for large-scale batch analytics.
- ``sources``    : typed readers/sinks (CSV with imposed schemas, Parquet) and
                   the test-data catalog.
- ``functions``  : scalar column helpers (string extraction, ratios, scaling).
- ``operators``  : composable DataFrame operators (cleaning, rollups, dedup,
                   similarity search, text analysis, geospatial join).
- ``plans``      : end-to-end query plans — the reference-parity election
                   pipeline and the driver-facing operator-coverage queries.
- ``ml``         : pyspark.ml feature pipeline + regressors (RandomForest
                   headline, GBT, OLS) and metrics.
- ``streaming``  : Structured Streaming variants of the batch aggregations.
- ``registry``   : name -> (query fn, oracle SQL) registration used by
                   ``__spark_entry__.py``.
"""

__version__ = "0.1.0"
