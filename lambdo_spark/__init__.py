"""lambdo_spark — a from-scratch PySpark-native analytics engine.

A re-imagination (NOT a port) of asavinov/lambdo's column-oriented
workflow engine (reference at /root/reference) as a distributed
time-series rollup + downsample + retention pipeline over
Common-Crawl-style web pages, plus the full relational operator
surface of the reference expressed as idiomatic DataFrame plans.

Layout
------
- ``session``   : SparkSession factory (AQE, Arrow, shuffle tuning)
- ``sources``   : deterministic pages generator, parquet/CSV IO,
                  Iceberg-layout checkpointed tier writer
- ``operators`` : table ops (project/join/aggregate/filters/product)
                  and column ops (calculate/roll/shift/link/compose/
                  aggregate) — SURVEY.md §2 inventory
- ``functions`` : vectorized kernel registry, compression codecs
                  (delta-of-delta, Gorilla XOR), text analysis,
                  dedup, similarity search
- ``plans``     : JSON workflow spec -> topo-sorted DataFrame stages
- ``rollup``    : 1h/1d/30d continuous aggregates, gap-fill, salting,
                  timeseries toolkit (sessions/delta/rate/fill/
                  order-stat/distinct/heavy-hitters), incremental
                  refresh, Gorilla compression stage + read path
- ``streaming`` : Structured Streaming 1h tier, punctuation-based
                  stateful finalizer, streaming sessionization
"""

__version__ = "0.1.0"
