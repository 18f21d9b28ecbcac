"""Mechanize the staged-family flip (plans/staged.py flip procedure).

Selects the longest whole-family prefix of staged.FLIP_ORDER that fits
the round's free-slot budget, then (with --apply) performs the two
textual edits the procedure describes:

  1. append the chosen module names to the _load_catalog tuple in
     __spark_entry__.py (right before its closing parenthesis), and
  2. remove them from STAGED_MODULES in plans/staged.py.

Dry-run by default — prints the plan and the remaining checklist.
After --apply, the flip is NOT done until:

  - tools/check_correctness.py --record /root/testdata/sf0.01 passes
    (full registered sweep, re-pins green hashes; the flipped rows
    enter the grading window as never-graded),
  - bench.py auto-activates one headline row per flipped family (it
    pre-lists every FLIP_ORDER headline, guarded by `name not in qs`;
    no bench.py edit is needed — verify the rows appear in the next
    bench run),
  - tools/make_query_index.py regenerates QUERIES.md, and
  - the EXPECT_STAGED entries for flipped rows still audit green
    (explain_audit.py runs them whether staged or registered).

Usage: python tools/flip_staged.py [budget] [--apply]
       budget defaults to 50 (the driver's grading-window size).
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

ENTRY = "/root/repo/__spark_entry__.py"
STAGED = "/root/repo/predictor_spark/plans/staged.py"


def plan(budget: int):
    from predictor_spark.plans.staged import FLIP_ORDER, STAGED_MODULES

    chosen, used = [], 0
    for mod, n, bench in FLIP_ORDER:
        if mod not in STAGED_MODULES:
            continue  # already flipped in an earlier round
        if used + n > budget:
            break  # whole families only, in order — never a partial
        chosen.append((mod, n, bench))
        used += n
    return chosen, used


def apply(chosen) -> None:
    mods = [m for m, _, _ in chosen]
    entry = open(ENTRY).read()
    # the tuple close is followed by the shadow-guard prologue lines
    # before the try: — match any number of simple statements between
    m = re.search(
        r'(for mod in \((?:[^()]|\([^()]*\))*?)'
        r'(\):\n(?:[ \t]+\w[^\n]*\n)*?[ \t]+try:)', entry)
    if not m:
        raise SystemExit("could not locate the _load_catalog tuple")
    inject = "".join(f'                "{name}",\n' for name in mods)
    # after a previous --apply the tuple body already ends with a trailing
    # comma + newline + indent; blindly appending ",\n" there produced
    # ",\n    ," — a SyntaxError in the entry module. Strip trailing
    # whitespace and add a separator comma only when one isn't already
    # the last non-whitespace character.
    head = entry[:m.end(1)].rstrip()
    sep = "" if head.endswith(",") else ","
    entry = head + sep + "\n" + inject + "    " + entry[m.start(2):]

    # validate the staged-list removals BEFORE writing either file: a
    # silent replace no-op would leave the family both registered and
    # staged (load_staged() double-imports and misreports staged names)
    staged = open(STAGED).read()
    for name in mods:
        before = staged
        staged = staged.replace(f'    "{name}",\n', "", 1)
        if staged == before:
            raise SystemExit(
                f"STAGED_MODULES entry for {name!r} not found in the "
                f"expected '    \"{name}\",' form — fix plans/staged.py "
                "formatting and re-run (no edits written)")

    open(ENTRY, "w").write(entry)
    open(STAGED, "w").write(staged)


def main() -> int:
    argv = sys.argv[1:]
    do_apply = "--apply" in argv
    nums = [a for a in argv if a.isdigit()]
    budget = int(nums[0]) if nums else 50
    chosen, used = plan(budget)
    if not chosen:
        print("nothing to flip (all staged families flipped or budget 0)")
        return 0
    print(f"budget {budget}: flipping {len(chosen)} families / {used} rows")
    for mod, n, bench in chosen:
        print(f"  {mod:<28} {n:>2} rows   bench headline: {bench}")
    from predictor_spark.plans.staged import STAGED_MODULES

    left = [m for m in STAGED_MODULES if m not in {c[0] for c in chosen}]
    print(f"left staged: {len(left)} modules: {' '.join(left)}")
    if not do_apply:
        print("\nDRY RUN — pass --apply to edit __spark_entry__.py "
              "and plans/staged.py, then:")
    else:
        apply(chosen)
        print("\nAPPLIED — now finish the procedure:")
    print("  1. python tools/check_correctness.py --record "
          "/root/testdata/sf0.01    (must be all-PASS)")
    print("  2. bench.py auto-activates the headline rows above — verify "
          "they appear in the next bench run")
    print("  3. python tools/make_query_index.py")
    print("  4. python tools/explain_audit.py --staged   (exit 0)")
    print("  5. python -m pytest tests/ -x -q")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
