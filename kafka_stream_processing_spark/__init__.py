"""kafka_stream_processing_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference system isidorakandic/kafka-stream-processing (a Kafka Streams
app computing unique users per 1-minute tumbling window; see
`/root/reference/src/main/java/com/isidora/kafka/UniqueUsersCounter.java`),
widened to a full relational + streaming + LLM-data-pipeline engine:

- batch DataFrame queries over a TPC-H-ish star schema (Catalyst-optimized),
- Structured Streaming parity for the reference's windowed topology,
- dedup / similarity-search / text-analysis / multimodal operators for
  large-scale training-data pipelines.

Design rules (see SURVEY.md §7):
- DataFrame/SQL first; Catalyst untouched; UDFs only where built-ins
  genuinely cannot express the semantics (then Arrow-batched pandas UDFs).
- Every operator registered in the driver contract (`__spark_entry__.py`)
  with a DuckDB oracle where SQL-expressible.
- Bounded per-key state everywhere — the direct lesson of the reference's
  RecordTooLargeException failure (reference README.md:27-31).
"""

__version__ = "0.1.0"
