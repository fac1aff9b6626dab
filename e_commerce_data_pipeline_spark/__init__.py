"""PySpark-native analytics engine with the query and data-processing
capabilities of the rishabh2727/E-Commerce-Data-Pipeline reference
(see SURVEY.md), rebuilt Spark-first.

Layout
------
- ``session``    : tuned SparkSession builder (AQE, Arrow, shuffle sizing)
- ``catalog``    : typed loaders for the test star schema + event tables
- ``schemas``    : StructTypes for the 4 reference event streams
- ``functions``  : reusable column expressions (money math, time, text)
- ``operators``  : validation, quality suite, CDC apply, sessionization,
                   dedup (exact/minhash/simhash), similarity search,
                   text analysis, multimodal plumbing
- ``sources``    : bronze JSONL lake reader/writer, Kafka wrappers,
                   synthetic event generator
- ``plans``      : the analytic query suite (each query paired with a
                   DuckDB oracle for differential testing)
- ``streaming``  : the structured-streaming bronze ingest job
"""

__version__ = "0.1.0"
