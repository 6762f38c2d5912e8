from kafka_stream_processing_spark.plans.explain import (
    explain_str,
    plan_asserts,
    plan_report,
)

__all__ = ["explain_str", "plan_report", "plan_asserts"]
