"""inde1_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference platform (syacef/INDE1).

The reference is a distributed parking-event platform (Kafka -> S3 ->
scheduled Spark batch -> Redis; see SURVEY.md). This package re-expresses
every operator it computes as idiomatic Spark DataFrame / SQL / Structured
Streaming plans, designed for 100 TB scale:

- declarative plans only (Catalyst does pushdown/pruning/join selection)
- no driver-side collects in any operator (the reference aggregates on the
  driver after ``collect()`` — an anti-pattern we do not replicate)
- built-in JVM expressions in the hot path; no row-at-a-time Python UDFs
- event-time semantics with watermarks instead of cron/path time

Layout:
    session     SparkSession factory with scale-oriented defaults
    schemas     explicit StructTypes (never infer on the hot path)
    sources     parquet/JSONL-gz/Kafka readers, testdata loader
    operators   batch operators: parking parity + analytics + LLM-data ops
    functions   reusable column expression helpers
    streaming   streaming transforms (shared with batch) + sinks
    datagen     deterministic parking-event fixture generator (seed 42)
"""

__version__ = "0.1.0"
