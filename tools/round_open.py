"""Round-open checklist: one command to run at the start of every round.

Performs, in order (VERDICT r4 "Next round" #1 and #3 asked for these to
be a single documented step):

1. ``tools/gen_round_priority.py`` — prints the rotation list. The
   operator still pastes it into ``_ROUND_PRIORITY`` in
   ``xeloader_spark/queries/__init__.py`` (a deliberate manual step so
   the diff is reviewed), but this script *verifies* the installed list
   matches the tool's current output and fails loudly if it is stale.
2. ``tools/gen_coverage_ledger.py`` — regenerates COVERAGE.md's
   driver-verification ledger from the CORRECTNESS_r*.json artifacts so
   the document can never disagree with them at round open.

Exit code 0 = rotation installed & ledger fresh; 1 = something stale.
"""
from __future__ import annotations

import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def tool_priority() -> list[str]:
    out = subprocess.run(
        [sys.executable, str(REPO / "tools" / "gen_round_priority.py")],
        capture_output=True, text=True, check=True,
    ).stdout
    return re.findall(r'^\s+"(q_\w+)",', out, flags=re.M)


def installed_priority() -> list[str]:
    src = (REPO / "xeloader_spark" / "queries" / "__init__.py").read_text()
    body = re.search(r"_ROUND_PRIORITY = \[(.*?)\]", src, flags=re.S).group(1)
    return re.findall(r'"(q_\w+)"', body)


def main() -> int:
    want, have = tool_priority(), installed_priority()
    ok = True
    if want != have:
        missing = [q for q in want if q not in have]
        print(f"STALE rotation: installed _ROUND_PRIORITY differs from "
              f"tool output ({len(missing)} tool entries not installed). "
              f"Re-run tools/gen_round_priority.py and paste its list.")
        ok = False
    else:
        print(f"rotation OK: {len(have)} slots match tool output")
    ledger = subprocess.run(
        [sys.executable, str(REPO / "tools" / "gen_coverage_ledger.py")],
        capture_output=True, text=True,
    )
    print(ledger.stdout.strip())
    if ledger.returncode != 0:
        print(ledger.stderr.strip())
        ok = False
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
