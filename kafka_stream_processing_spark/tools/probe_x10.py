"""Run the SCALE.md ×10 probe for named registered queries.

Protocol (unchanged since round 2): wall-clock each query at sf0.1 and
at the ×10 staging (see stage_x10.py), best of 2 warm runs per side,
quiet box.  Committed so the probe harness survives /tmp wipes.

Usage:
    python -m kafka_stream_processing_spark.tools.probe_x10 \
        op_name [op_name ...] [--x10-dir /tmp/kssp_x10/data]
"""

from __future__ import annotations

import sys
import time

SF01 = "/root/testdata/sf0.1"


def force(df) -> None:
    """Execute a query to completion.  NOT count(): Catalyst statically
    knows a global aggregate emits exactly one row and a unique-key
    left join preserves left cardinality, so under count() it PRUNES
    those branches — dedup_semdedup_k_sweep measured 3 s by count()
    vs 100 s honestly (r10).  The noop sink consumes every output row
    with all columns and cannot be cardinality-shortcut."""
    df.write.format("noop").mode("overwrite").save()


def main(names: list[str], x10_dir: str) -> None:
    from kafka_stream_processing_spark.registry import all_specs
    from kafka_stream_processing_spark.session import get_spark

    spark = get_spark("kssp-x10-probe", cpus=32, shuffle_partitions=32)
    specs = all_specs()
    for name in names:
        fn = specs[name].fn
        out = {}
        for label, sf in (("sf0.1", SF01), ("x10", x10_dir)):
            force(fn(spark, sf))  # warm: plan + scan caches
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                force(fn(spark, sf))
                best = min(best, time.time() - t0)
            out[label] = best
        ratio = out["x10"] / out["sf0.1"]
        print(
            f"{name}: sf0.1 {out['sf0.1']:.2f} s | x10 {out['x10']:.2f} s"
            f" | ratio {ratio:.1f}x",
            flush=True,
        )


def parse_argv(argv: list[str]) -> tuple[list[str], str]:
    """Split op names from flags.  The token AFTER --x10-dir is the
    flag's VALUE, not an op name — consume it (ADVICE r10: the old
    startswith('--') filter collected the value into the name list and
    crashed the specs lookup)."""
    names: list[str] = []
    x10 = "/tmp/kssp_x10/data"
    it = iter(argv)
    for a in it:
        if a == "--x10-dir":
            x10 = next(it, None)
            if x10 is None:
                raise SystemExit("--x10-dir requires a value")
        elif a.startswith("--"):
            raise SystemExit(f"unknown flag {a!r}")
        else:
            names.append(a)
    return names, x10


if __name__ == "__main__":
    names, x10 = parse_argv(sys.argv[1:])
    main(names, x10)
