"""tools/sync_driver_grades.py is the rotation's source of truth
(VERDICT r7 #3): it must record each driver-green query at its NEWEST
green round with the CURRENT content hash, never downgrade an entry to
an older round, and drop de-registered names."""

from __future__ import annotations

import importlib.util
import json


def _load(tmp_path, correctness: dict, existing=None, current=None):
    spec = importlib.util.spec_from_file_location(
        "sync_driver_grades", "/root/repo/tools/sync_driver_grades.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    m.REPO = str(tmp_path)
    m.PATH = str(tmp_path / "driver_grades.json")
    for rnd, rec in correctness.items():
        (tmp_path / f"CORRECTNESS_r{rnd:02d}.json").write_text(
            json.dumps(rec))
    if existing is not None:
        (tmp_path / "driver_grades.json").write_text(json.dumps(existing))

    class FakeEntry:
        @staticmethod
        def query_content_hashes():
            return dict(current or {})

    import sys
    sys.modules["__spark_entry__"] = FakeEntry
    try:
        m.main()
    finally:
        del sys.modules["__spark_entry__"]
    return json.loads((tmp_path / "driver_grades.json").read_text())


GREEN = {"rows_match": True, "schema_match": True, "hash_match": True,
         "spark_rows": 1, "oracle_rows": 1, "err": None}
RED = {**GREEN, "hash_match": False}


def test_records_newest_round_with_current_hash(tmp_path):
    got = _load(
        tmp_path,
        correctness={7: {"q": GREEN}, 8: {"q": GREEN, "p": GREEN}},
        current={"q": "hq", "p": "hp"})
    assert got == {"q": {"round": 8, "hash": "hq"},
                   "p": {"round": 8, "hash": "hp"}}


def test_never_downgrades_and_keeps_grade_time_hash(tmp_path):
    """An entry recorded at round 8 must NOT be overwritten by replaying
    round 7's file, and re-running after local edits must not refresh
    the hash (the whole point: the recorded hash is the GRADE-time
    one)."""
    got = _load(
        tmp_path,
        correctness={7: {"q": GREEN}, 8: {"q": GREEN}},
        existing={"q": {"round": 8, "hash": "hash_at_grade_time"}},
        current={"q": "hash_after_edits"})
    assert got == {"q": {"round": 8, "hash": "hash_at_grade_time"}}


def test_red_rows_and_deregistered_names_excluded(tmp_path):
    got = _load(
        tmp_path,
        correctness={8: {"red": RED, "gone": GREEN, "ok": GREEN}},
        existing={"stale": {"round": 3, "hash": "x"}},
        current={"ok": "h"})  # 'gone' and 'stale' are not registered
    assert got == {"ok": {"round": 8, "hash": "h"}}
