"""Engine CLI — the spark-submit entry point, mirroring the reference's
``main(args)`` contract (UniqueUsersCounter.java:47-50: input topic,
output topic) and extending it to the batch engine:

    python -m kafka_stream_processing_spark.jobs list
    python -m kafka_stream_processing_spark.jobs run <query> [--sf-dir DIR] [--limit N]
    python -m kafka_stream_processing_spark.jobs explain <query> [--sf-dir DIR]
    python -m kafka_stream_processing_spark.jobs stream <input_topic> <output_topic>
        [--bootstrap HOST:PORT] [--mode update|append]   # needs a Kafka cluster
"""

from __future__ import annotations

import argparse
import sys

from kafka_stream_processing_spark import registry
from kafka_stream_processing_spark.session import get_spark

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="kafka_stream_processing_spark")
    sub = parser.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list registered queries")

    p_run = sub.add_parser("run", help="run a query and print rows")
    p_run.add_argument("query")
    p_run.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    p_run.add_argument("--limit", type=int, default=20)

    p_exp = sub.add_parser("explain", help="print a query's physical plan")
    p_exp.add_argument("query")
    p_exp.add_argument("--sf-dir", default=DEFAULT_SF_DIR)

    p_stream = sub.add_parser(
        "stream", help="run the reference streaming job against Kafka"
    )
    p_stream.add_argument("input_topic")
    p_stream.add_argument("output_topic")
    p_stream.add_argument("--bootstrap", default="localhost:9092")
    p_stream.add_argument("--mode", choices=["update", "append"], default="update")

    args = parser.parse_args(argv)
    specs = registry.all_specs()

    if args.cmd == "list":
        width = max(len(n) for n in specs)
        for name, spec in sorted(specs.items()):
            oracle = "oracle" if spec.oracle else "rows-only"
            head = " headline" if spec.headline else ""
            print(f"{name:<{width}}  [{oracle}{head}]  {spec.doc.splitlines()[0] if spec.doc else ''}")
        return 0

    if args.cmd in ("run", "explain"):
        if args.query not in specs:
            print(f"unknown query {args.query!r}; `list` shows all", file=sys.stderr)
            return 2
        spark = get_spark(f"kssp-{args.cmd}")
        spark.sparkContext.setLogLevel("ERROR")
        df = specs[args.query].fn(spark, args.sf_dir)
        if args.cmd == "explain":
            from kafka_stream_processing_spark.plans.explain import explain_str

            print(explain_str(df, "formatted"))
        else:
            df.show(args.limit, truncate=False)
        return 0

    if args.cmd == "stream":
        from kafka_stream_processing_spark.sources.kafka import run_reference_job

        spark = get_spark("kssp-stream")
        run_reference_job(
            spark,
            args.input_topic,
            args.output_topic,
            bootstrap_servers=args.bootstrap,
            output_mode=args.mode,
        )
        return 0

    return 2  # pragma: no cover


if __name__ == "__main__":
    raise SystemExit(main())
