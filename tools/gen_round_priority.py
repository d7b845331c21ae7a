#!/usr/bin/env python
"""Generate the next round's `_ROUND_PRIORITY` list.

Diffs the current registry (`queries()` keys, in registry order) against
the union of green driver rows in every CORRECTNESS_r*.json, then emits a
ready-to-paste python list: still-unverified queries first (they need
their first driver row), then regression re-checks ordered by the round
of their last green row (oldest first) up to the driver's ~50-slot
window.

With `drain_until` set (r10, VERDICT r9 #1: two rounds running, new
registrations displaced the planned stale-cohort re-checks because
unverified-first put them at the top), re-checks whose last green row
is ≤ that round are pinned to the FRONT of the window — ahead of new
registrations — so a staleness drain cannot be displaced by the
round's own additions. Everything green in the committed PARITY_SWEEP
stays verified either way; this only orders the driver rotation.

Usage:  python tools/gen_round_priority.py [window] [drain_until]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    window = int(sys.argv[1]) if len(sys.argv) > 1 else 50

    from xeloader_spark.queries import all_queries

    registry = list(all_queries())

    last_green: dict[str, int] = {}
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", os.path.basename(path))
        rnd = int(m.group(1)) if m else 0
        rows = json.load(open(path))
        for name, row in rows.items():
            if not (isinstance(row, dict) and row.get("rows_match") and not row.get("err")):
                continue
            # A row only counts as verified-green when the value hash
            # matched too; rows-only checks (oracle-less queries) have no
            # hash_match key and fall back to the row count.
            if "hash_match" in row and not row.get("hash_match"):
                continue
            if name in registry:
                last_green[name] = max(last_green.get(name, 0), rnd)

    drain_until = int(sys.argv[2]) if len(sys.argv) > 2 else 0

    unverified = [q for q in registry if q not in last_green]
    rechecks = sorted(
        (q for q in registry if q in last_green),
        key=lambda q: (last_green[q], registry.index(q)),
    )
    drain = [q for q in rechecks if last_green[q] <= drain_until]
    rest = [q for q in rechecks if last_green[q] > drain_until]
    chosen = (drain + unverified + rest)[:window]

    overflow = max(0, len(drain) + len(unverified) - window)
    print(
        f"# {len(registry)} registered; {len(unverified)} unverified; "
        f"{len(drain)} stale (≤r{drain_until}) pinned first; "
        f"window {window} → {len(chosen)} slots "
        f"({overflow} unverified/stale beyond the window)"
    )
    if overflow:
        print(
            f"# WARNING: {overflow} unverified queries will NOT get a driver "
            f"row this round. Stop adding new queries (or raise the window) "
            f"until the backlog drains.",
            file=sys.stderr,
        )
    print("_ROUND_PRIORITY = [")
    for q in chosen:
        tag = "" if q in unverified else f"  # recheck (last green r{last_green[q]})"
        print(f'    "{q}",{tag}')
    print("]")


if __name__ == "__main__":
    main()
