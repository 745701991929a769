"""PySpark-native analytics engine with the capabilities of the
``Hrafbh/github-issues-lakehouse`` reference (pandas medallion
lakehouse over GitHub issues), rebuilt Spark-first and extended with
large-scale training-data pipeline operators.

Layout:
    session    -- tuned SparkSession factory
    sources    -- readers + table registry over the testdata layout
    functions  -- pure Column-expression libraries
    operators  -- DataFrame -> DataFrame operators (silver/gold/
                  dedup/similarity/text/relational/multimodal)
    plans      -- explain-plan introspection helpers
    streaming  -- Structured Streaming operators
    sinks      -- partitioned / merge-upsert writers
"""

__version__ = "0.1.0"
