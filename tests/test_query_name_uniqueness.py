"""Every @query name must be defined EXACTLY once across all catalog
modules — registered and staged together.

The `query` decorator writes into a shared dict, so a duplicate name
silently OVERWRITES the earlier query for whoever imports the second
module (round 7: three staged r10/r11 rows shadowed already-registered
rows — nelson_aalen_hazard, degree_assortativity, benford_first_digit —
and broke the originals' tests under --staged loads while the driver,
which never imports staged modules, kept seeing the originals).  This
scan is STATIC (source regex, import-order independent) so the
collision is caught no matter which harness imports what.
"""

from __future__ import annotations

import glob
import re
from collections import Counter

#: both decorator spellings used in the codebase:
#:   @query("name", ...)   and   @query(\n    "name",\n    oracle=...
_PATTERNS = (
    re.compile(r'@query\(\s*\n?\s*"([a-z0-9_]+)"'),
    re.compile(r'@query\("([a-z0-9_]+)"'),
)


def test_query_names_are_globally_unique():
    counts: Counter[str] = Counter()
    where: dict[str, list[str]] = {}
    for path in glob.glob("/root/repo/predictor_spark/plans/*.py"):
        src = open(path).read()
        names = set()
        for pat in _PATTERNS:
            names.update(pat.findall(src))
        for n in names:
            counts[n] += 1
            where.setdefault(n, []).append(path.rsplit("/", 1)[-1])
    dupes = {n: where[n] for n, c in counts.items() if c > 1}
    assert not dupes, f"duplicate @query names: {dupes}"
    # sanity: the scan actually sees the catalog (registered + staged;
    # a handful of rows register programmatically and are invisible to
    # the literal scan, so the floor sits slightly below the registry)
    assert len(counts) >= 340
