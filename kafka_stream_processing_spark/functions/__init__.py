from kafka_stream_processing_spark.functions.exact import dec, dec_avg, dec_sum

__all__ = ["dec", "dec_sum", "dec_avg"]
