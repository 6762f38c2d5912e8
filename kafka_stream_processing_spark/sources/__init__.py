from kafka_stream_processing_spark.sources.tables import TABLES, load_all, table

__all__ = ["TABLES", "table", "load_all"]
