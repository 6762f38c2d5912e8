"""Audit: which registered queries under-measure when forced by count().

count() lets Catalyst prune work a human assumes is being timed:
- a global aggregate is statically exactly-1-row, so under count() its
  aggregate EXPRESSIONS (and any branch feeding only them) are dropped;
- a unique-key LEFT JOIN preserves left cardinality, so its right side
  is eliminated entirely;
- groupBy aggregates keep their shuffle but drop non-key aggregate
  expressions (q1's decimal sums: 0.53 s by count() vs 2.02 s honest).

Measured instance (r10): dedup_semdedup_k_sweep timed 3 s by count()
vs 100 s by the noop sink.  This tool times every (or the named)
registered batch query both ways at a given SF dir and flags ops where
noop > 1.5 x count + 0.3 s — those ops' historical count()-based probe
rows under-state their true cost.

bench.py deliberately KEEPS count() forcing: the frozen BASELINE.json
was measured with the same forcing, so the 2x gate compares
like-for-like; this audit exists so SCALE.md claims use honest numbers.

Usage:
    python -m kafka_stream_processing_spark.tools.audit_forcing \
        [--sf /root/testdata/sf0.1] [op_name ...]
Prints one line per op; summary lines start with FLAGGED.
"""

from __future__ import annotations

import sys
import time


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main(names: list[str], sf: str) -> None:
    from kafka_stream_processing_spark.registry import all_specs
    from kafka_stream_processing_spark.session import get_spark

    spark = get_spark("kssp-forcing-audit", cpus=32,
                      shuffle_partitions=32)
    specs = all_specs()
    todo = names or [
        n for n, s in specs.items() if not n.startswith("stream_")
    ]
    flagged = []
    for name in todo:
        fn = specs[name].fn
        try:
            # 2-run protocol: the count() run doubles as the warm pass
            # (JVM and parquet footers stay warm across ops) — a slow
            # exact twin then costs 2 runs, not 3.  The flag criterion
            # is a large RATIO, robust to the residual warm-up bias.
            t0 = time.time()
            fn(spark, sf).count()
            tc = time.time() - t0
            t0 = time.time()
            _noop(fn(spark, sf))
            tn = time.time() - t0
        except Exception as ex:  # streaming-only paths, env blocks
            print(f"{name}: SKIP ({type(ex).__name__})", flush=True)
            continue
        mark = ""
        if tn > tc * 1.5 + 0.3:
            mark = "  <-- FLAGGED"
            flagged.append((name, tc, tn))
        print(f"{name}: count {tc:.2f}s noop {tn:.2f}s{mark}", flush=True)
    print(f"\nFLAGGED {len(flagged)} ops:", flush=True)
    for name, tc, tn in sorted(flagged, key=lambda x: -x[2] / max(x[1], 0.01)):
        print(f"FLAGGED {name}: count {tc:.2f}s vs honest {tn:.2f}s "
              f"({tn / max(tc, 0.01):.1f}x)", flush=True)


if __name__ == "__main__":
    sf = "/root/testdata/sf0.1"
    args = []
    it = iter(sys.argv[1:])
    for a in it:
        if a == "--sf":
            sf = next(it)
        else:
            args.append(a)
    main(args, sf)
