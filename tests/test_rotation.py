"""The grading-window rotation (__spark_entry__._ordered) is load-bearing
for the driver contract: it decides which queries land in the driver's
~50-query grading window.  Pin its priority law:

  0. never-driver-graded, oracle-backed   (need their FIRST grade)
  1. driver-green but content-hash moved  (re-grades)
  2/3. same classes without oracle
  4/5. verified (driver-green + hash-match) — rotated to the back

and stability (registration order preserved within a class)."""

from __future__ import annotations

import __spark_entry__ as entry


def _fake_fn(name):
    def fn(spark, sf_dir):  # pragma: no cover - never called
        raise AssertionError
    fn.__name__ = name
    return fn


def test_rotation_priority_and_stability(monkeypatch):
    queries = {n: _fake_fn(n) for n in
               ["old_green_moved", "new_a", "old_green_ok",
                "new_b", "old_green_moved2", "new_rows_only"]}
    oracle = {n: f"SELECT 1 -- {n}" for n in queries if n != "new_rows_only"}

    hashes = {n: entry._query_hash(queries[n], oracle.get(n))
              for n in queries}
    monkeypatch.setattr(entry, "_green_hashes", lambda: {
        "old_green_ok": hashes["old_green_ok"],
        "old_green_moved": "stale", "old_green_moved2": "stale",
    })
    monkeypatch.setattr(entry, "_driver_green", lambda: frozenset(
        {"old_green_ok", "old_green_moved", "old_green_moved2"}))

    got = entry._ordered(queries, oracle)
    assert got == [
        "new_a", "new_b",                       # first grades, oracle-backed
        "old_green_moved", "old_green_moved2",  # re-grades (stable order)
        "new_rows_only",                        # first grade, no oracle
        "old_green_ok",                         # verified -> back
    ]


def test_rotation_treats_unknown_hash_as_unverified(monkeypatch):
    queries = {"q": _fake_fn("q")}
    oracle = {"q": "SELECT 1"}
    monkeypatch.setattr(entry, "_green_hashes", lambda: {})
    monkeypatch.setattr(entry, "_driver_green", lambda: frozenset({"q"}))
    # driver-green but never locally recorded -> must stay in the window
    assert entry._ordered(queries, oracle) == ["q"]


def test_every_catalog_module_imports_cleanly():
    """_load_catalog swallows ImportError so a partial tree still
    serves its working queries — but on a COMPLETE tree every module in
    its list must import, or queries silently vanish from the driver's
    grading window (a coverage loss nothing else would catch)."""
    import ast
    import importlib
    import inspect

    import __spark_entry__ as entry

    src = inspect.getsource(entry._load_catalog)
    names = [c.value for c in ast.walk(ast.parse(src))
             if isinstance(c, ast.Constant) and isinstance(c.value, str)
             and c.value.startswith("catalog") or
             (isinstance(c, ast.Constant) and c.value == "champion")]
    assert len(names) >= 25
    for mod in names:
        importlib.import_module(f"predictor_spark.plans.{mod}")
