"""Reproduce the driver-coverage ledger from CORRECTNESS_r*.json.

VERDICT r09 item 3: the rotation math must be computed from TWO explicit
counters, not one —

- ``driver-checked``: names with at least one driver row that ran without
  an engine error (hash-green rows PLUS rows-only ``err == "no_oracle"``
  rows, which are the by-design non-SQL-expressible queries);
- ``driver-hash-green``: names with at least one ``hash_match: true``
  row.  THIS is the currency the rotation targets — the backlog is
  "registered with an oracle, never hash-green".

Run from the repo root::

    python -m kafka_stream_processing_spark.tools.coverage_ledger

Prints both counters, the rows-only set, and the ordered backlog
(current ``all_specs()`` iteration order), so HANDOFF.md numbers can be
checked against it verbatim.
"""

from __future__ import annotations

import glob
import json
import os


def compute(repo_root: str = ".") -> dict:
    hash_green: set[str] = set()
    rows_only: set[str] = set()
    errored: dict[str, str] = {}
    last_green: dict[str, int] = {}
    files = sorted(glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json")))
    for f in files:
        base = os.path.basename(f)
        rnd = int(base.replace("CORRECTNESS_r", "").replace(".json", ""))
        with open(f) as fh:
            rows = json.load(fh)
        for name, row in rows.items():
            if row.get("hash_match") is True:
                hash_green.add(name)
                last_green[name] = max(last_green.get(name, 0), rnd)
            elif row.get("err") == "no_oracle" and row.get("spark_rows") is not None:
                rows_only.add(name)
            elif row.get("err"):
                errored[name] = f"{base}: {row['err']}"
    rows_only -= hash_green
    return {
        "files": [os.path.basename(f) for f in files],
        "hash_green": sorted(hash_green),
        "rows_only": sorted(rows_only),
        "checked": len(hash_green) + len(rows_only),
        "errored": errored,
        "last_green": last_green,
    }


def main(argv: list[str] | None = None) -> None:
    import sys

    from kafka_stream_processing_spark import registry

    argv = sys.argv[1:] if argv is None else argv
    project_next = "--next" in argv
    # --current: emit the slice for THIS round from the live ledger
    # (no first-50 green projection) — used when a registry change
    # mid-round (e.g. an op gaining an oracle) invalidates the slice
    # emitted at round start (r14: embedding_top_pc_power_iteration
    # left the rows-only set and must displace one re-confirm, the
    # markov r13 precedent).
    current = "--current" in argv
    if current:
        project_next = True

    ledger = compute()
    specs = registry.all_specs()
    with_oracle = [n for n, s in specs.items() if s.oracle is not None]
    green = set(ledger["hash_green"])
    backlog = [n for n in with_oracle if n not in green]
    print(f"correctness files: {len(ledger['files'])} "
          f"({ledger['files'][0]} .. {ledger['files'][-1]})")
    print(f"registered: {len(specs)}  with-oracle: {len(with_oracle)}")
    print(f"driver-checked:    {ledger['checked']}/{len(with_oracle)} "
          f"(incl {len(ledger['rows_only'])} rows-only: "
          f"{', '.join(ledger['rows_only'])})")
    print(f"driver-hash-green: {len(green)}/{len(with_oracle)}")
    if ledger["errored"]:
        print(f"ERRORED rows (should be empty): {ledger['errored']}")
    print(f"backlog (never hash-green, rotation order): {len(backlog)}")
    for n in backlog:
        print(f"  {n}")

    if project_next:
        # Project the NEXT round's rotation slice, assuming the current
        # first-50 window's oracle rows land green (VERDICT r11 item 7:
        # the slice is emitted by this tool, never hand-written).
        first50 = [] if current else list(specs)[:50]
        projected = green | {n for n in first50 if n in set(with_oracle)}
        nxt = [n for n in with_oracle if n not in projected]
        pins = list(registry.REFERENCE_PARITY_PINS)
        slice_rows = pins + [n for n in nxt if n not in pins]
        free = 50 - len(slice_rows)
        # Fill the free slots with the OLDEST hash-green rows (smallest
        # last-green round; ties broken by current all_specs() order) —
        # the rotation policy's re-confirm rule, emitted here so the
        # slice is never hand-written (VERDICT r13 item 1).  Names whose
        # last green row will be refreshed by the CURRENT first-50
        # window are treated as this-round fresh.
        last_green = dict(ledger["last_green"])
        cur_round = len(ledger["files"])
        for n in first50:
            if n in last_green:
                last_green[n] = max(last_green[n], cur_round + 1)
        taken = set(slice_rows)
        reconfirm_pool = [n for n in with_oracle
                          if n in last_green and n not in taken]
        order = {n: i for i, n in enumerate(specs)}
        reconfirm_pool.sort(key=lambda n: (last_green[n], order[n]))
        reconfirms = reconfirm_pool[:max(free, 0)]
        slice_rows = slice_rows + reconfirms
        print()
        print(f"projected hash-green after this round: "
              f"{len(projected)}/{len(with_oracle)}")
        print(f"next-round slice: {len(pins)} §2 pins + {len(nxt)} backlog "
              f"+ {len(reconfirms)} oldest-green re-confirms "
              f"(free slots: {free})")
        for n in slice_rows:
            tag = ""
            if n in reconfirms:
                tag = f"   # re-confirm (last green r{ledger['last_green'][n]:02d})"
            print(f"  {n}{tag}")
        if free < 0:
            print(f"  WARNING: slice OVERFLOWS the 50-row window by "
                  f"{-free} — slim the pins (the r11 arithmetic lesson)")


if __name__ == "__main__":
    main()
