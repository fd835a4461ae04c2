"""ts_data_pipeline_spark — a PySpark-native analytics engine.

A brand-new, idiomatic PySpark implementation of the query and
data-processing capabilities of the reference system
``macanderson/ts-data-pipeline`` (a Quix-Streams/Kafka financial
market-data pipeline), re-expressed Spark-first:

- per-record transforms/enrichment  -> pure ``pyspark.sql.Column``
  expression libraries (``functions/``)
- stateful 1-minute keyed tumbling-window aggregation -> declarative
  ``groupBy(window(...), key).agg(conditional sums)`` (``operators/``)
- the Telemetry Query API contract (tag-filtered, time-bucketed,
  interpolated, multi-aggregate time-series queries) -> a QuerySpec
  evaluator that compiles to a single Catalyst plan (``plans/``)
- streaming -> Structured Streaming veneer over the same expressions
  (``streaming/``)
- LLM-training-data operators (dedup, similarity search, text
  analysis, multimodal plumbing) designed for 100 TB scale
  (``operators/dedup.py``, ``operators/similarity.py``,
  ``functions/text.py``)

Everything is built on public Spark APIs only; no RDDs, no
driver-side loops, no row-at-a-time Python UDFs in hot paths.
"""

__version__ = "0.1.0"
