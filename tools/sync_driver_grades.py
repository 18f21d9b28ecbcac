"""Record driver-grade-time content hashes (VERDICT r7 item 3).

Run at ROUND START, before any source edit: reads every committed
CORRECTNESS_r*.json, and for each query the driver graded fully green
(rows+schema+hash all true) records

    tools/driver_grades.json: {name: {"round": N, "hash": <content hash>}}

where the hash is __spark_entry__._query_hash over the CURRENT tree.
Because the driver grades the end-of-round tree and each round starts
from exactly that tree, "current hash at round start" == "hash of the
code the driver actually graded".  __spark_entry__._ordered rotates a
query out of the ~50-row grading window only while its current hash
still matches this file — so any later edit to the query, its oracle,
or its module closure moves it back toward the window for re-grading,
and a local `check_correctness.py --record` sweep can no longer rotate
an edited-but-locally-green row out (the stale-driver-evidence window
named in VERDICT r7 "What's wrong" #2).

Existing entries are only overwritten when a NEWER round graded the
query green (the recorded hash then reflects the newer grade).  Names
green in history but no longer registered (de-registrations) are
dropped.  Seeding note (round 8): rounds 1-7 predate this file, so the
initial seed necessarily uses round-8-start hashes for all of them;
the r7-end tree is the same tree rounds graded against for every row
not edited since its last grade, and the few historically-edited rows
start from the same trust baseline the old graded_green.json gave them.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, "/root/repo")

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
PATH = os.path.join(HERE, "driver_grades.json")


def main() -> int:
    import __spark_entry__ as entry_mod

    current = entry_mod.query_content_hashes()

    try:
        with open(PATH) as fh:
            grades: dict[str, dict] = json.load(fh)
    except (OSError, ValueError):
        grades = {}

    # name -> newest round in which the driver graded it fully green
    green_round: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        with open(path) as fh:
            rec = json.load(fh)
        for name, row in rec.items():
            if isinstance(row, dict) and row.get("rows_match") \
                    and row.get("schema_match") and row.get("hash_match"):
                green_round[name] = max(green_round.get(name, 0), rnd)

    n_new = n_upd = n_drop = 0
    for name, rnd in green_round.items():
        if name not in current:
            continue  # de-registered since its grade
        prev = grades.get(name)
        if prev is None:
            grades[name] = {"round": rnd, "hash": current[name]}
            n_new += 1
        elif rnd > int(prev.get("round", 0)):
            grades[name] = {"round": rnd, "hash": current[name]}
            n_upd += 1
    for name in [n for n in grades if n not in current]:
        del grades[name]
        n_drop += 1

    with open(PATH, "w") as fh:
        json.dump({n: grades[n] for n in sorted(grades)}, fh, indent=1)
    print(f"driver_grades.json: {len(grades)} entries "
          f"({n_new} new, {n_upd} updated to newer round, {n_drop} dropped)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
