"""Stage the ×10 scale-probe replica of a testdata SF directory.

Recreates the staging every SCALE.md probe section references (facts
×10 with key offsets, dims unchanged) — committed here so a /tmp wipe
no longer erases the protocol (it did before r10 session 2; the
snippet previously lived only in /tmp/kssp_x10/stage.py).

Protocol (unchanged since the round-2 probe):
- facts (orders, lineitem, events, documents, embeddings) are written
  as 10 replicas; replica 0 keeps original keys, replica r offsets the
  PRIMARY key family by r × (max_key + 1) so keys stay unique.
- lineitem's l_orderkey is offset CONSISTENTLY with orders so the
  orders⋈lineitem join degree profile is preserved.
- events keep user_id/ts unchanged (user count fixed at 10× density —
  the documented journey-pair artifact, SCALE.md round-7 note).
- documents keep text; embeddings keep vectors — every doc gains 10
  EXACT copies, the documented worst-case dup-clique pathology.
- dims (region, nation, customer, supplier, part) are copied as-is.
- parquet written with ROW_GROUP_SIZE 65536 so one file still yields
  multiple scan splits.

Usage:  python -m kafka_stream_processing_spark.tools.stage_x10 \
            [src_sf_dir] [dst_dir]
Defaults: /root/testdata/sf0.1 → /tmp/kssp_x10/data
"""

from __future__ import annotations

import os
import sys

import duckdb

REPLICAS = 10
ROW_GROUP = 65536

#: fact table → (key columns offset per replica, shared offset base
#: column).  The base is max(base_col)+1 of the ORIGINAL table so
#: foreign keys shift in lockstep.
FACTS = {
    "orders": (("o_orderkey",), "o_orderkey"),
    "lineitem": (("l_orderkey",), "l_orderkey"),
    "events": (("event_id",), "event_id"),
    "documents": (("doc_id",), "doc_id"),
    "embeddings": (("vec_id",), "vec_id"),
}
DIMS = ("region", "nation", "customer", "supplier", "part")

#: lineitem must reuse ORDERS' key base, not its own max(l_orderkey)
#: (they are equal in TPC-H data, but the protocol is "consistent
#: offsets", so derive both from orders).
SHARED_BASE = {"lineitem": "orders", "orders": "orders"}


def stage(src: str, dst: str) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    bases: dict[str, int] = {}
    for t in FACTS:
        anchor = SHARED_BASE.get(t, t)
        if anchor not in bases:
            key = FACTS[anchor][1]
            bases[anchor] = (
                con.execute(
                    f"SELECT max({key}) + 1 FROM "
                    f"'{src}/{anchor}.parquet'"
                ).fetchone()[0]
            )
        base = bases[anchor]
        keys, _ = FACTS[t]
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'"
            ).fetchall()
        ]
        sel = ", ".join(
            f"{c} + r.r * {base} AS {c}" if c in keys else c
            for c in cols
        )
        con.execute(
            f"""
            COPY (
                SELECT {sel}
                FROM '{src}/{t}.parquet', range({REPLICAS}) r(r)
            ) TO '{dst}/{t}.parquet'
            (FORMAT PARQUET, ROW_GROUP_SIZE {ROW_GROUP})
            """
        )
        n = con.execute(
            f"SELECT count(*) FROM '{dst}/{t}.parquet'"
        ).fetchone()[0]
        print(f"staged {t}: {n} rows (base {base})")
    for t in DIMS:
        con.execute(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') "
            f"TO '{dst}/{t}.parquet' "
            f"(FORMAT PARQUET, ROW_GROUP_SIZE {ROW_GROUP})"
        )
        print(f"copied {t}")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/kssp_x10/data"
    stage(src, dst)
