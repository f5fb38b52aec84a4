"""parallel_dbms_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of
the reference hybrid CPU/GPU DBMS (MostafaMagdyy/Parallel-DBMS), built
Spark-first: the DataFrame/SQL API declares logical plans and Catalyst +
Tungsten pick the physical strategy. The reference's CUDA machinery
(warp-shuffle reductions, block-nested-loop join, 4-way LSD radix sort)
is replaced wholesale by Spark's HashAggregateExec / broadcast +
sort-merge joins / range-partitioned sort.

Layout
------
- ``session``   SparkSession factory (AQE on, UTC, Arrow)
- ``catalog``   directory -> temp-view registration (parquet + typed CSV)
- ``sources``   typed-header CSV dialect of the reference, parquet helpers
- ``operators`` relational operator library (filter/project/agg/join/sort/...)
- ``functions`` text analysis, dedup, similarity-search, multimodal columns
- ``streaming`` Structured Streaming windows/watermarks over the events table
- ``plans``     plan-inspection helpers (pushdown / broadcast assertions)
- ``queries``   the registered query surface exposed via __spark_entry__
"""

__version__ = "0.1.0"
