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


def test_intra_module_duplicate_guard():
    """ADVICE r10: the import-time snapshot guard cannot see a name
    registered twice WITHIN one module (the snapshot predates both
    registrations).  _load_catalog closes that with a static per-file
    scan; exercise its core on synthetic sources, both decorator and
    programmatic registration forms."""
    import sys

    sys.path.insert(0, "/root/repo")
    from __spark_entry__ import _intra_module_duplicates

    clean = '@query("a", oracle="SELECT 1")\ndef a(): ...\n' \
            '@query(\n    "b",\n    oracle="SELECT 2")\ndef b(): ...\n' \
            'query("c", oracle=sql)(fn)\n'
    assert _intra_module_duplicates(clean) == []
    dup_deco = clean + '@query("a")\ndef a2(): ...\n'
    assert _intra_module_duplicates(dup_deco) == ["a"]
    dup_prog = clean + 'query("c", oracle=other)(fn2)\n'
    assert _intra_module_duplicates(dup_prog) == ["c"]
    # attribute access named query( must NOT count as a registration
    assert _intra_module_duplicates('df.query("a")\n' + clean) == []
    # a docstring or comment that MENTIONS query("a") must not count
    # either (ADVICE r11: the raw-source regex counted it and hard-
    # failed every _load_catalog on a documentation edit)
    mention = ('"""swap plan: paste over query("a") next round."""\n'
               "# see query(\"a\") for the live row\n" + clean)
    assert _intra_module_duplicates(mention) == []


def test_registry_scan_recovers_every_registered_name():
    """The guard's regex must see every registration form in use: the
    combined pattern recovers the FULL registry (436 names), including
    the programmatic query(...)(fn) rows the decorator-only scan above
    misses — if a new registration style appears, this fails first."""
    import re
    import sys
    from collections import Counter

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e

    pat = re.compile(r'(?<![\w.])query\(\s*\n?\s*(["\'])([^"\']+)\1')
    names: Counter[str] = Counter()
    for path in glob.glob("/root/repo/predictor_spark/plans/*.py"):
        names.update(m[1] for m in pat.findall(open(path).read()))
    cat = e._load_catalog()
    missing = set(cat.QUERIES) - set(names)
    assert not missing, f"registered names invisible to the static scan: {missing}"
