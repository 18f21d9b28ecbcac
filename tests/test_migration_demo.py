"""MIGRATION.md rot-guard: the runnable migration demo must execute all
reference entry-point mappings end-to-end on the smallest test data."""

from __future__ import annotations

import sys


def test_migration_demo_runs(tmp_path):
    sys.path.insert(0, "/root/repo/examples")
    from migration_demo import run

    out = run("/root/testdata/sf0.001", str(tmp_path / "work"))
    assert out["metrics_rows"] > 0
    assert out["predictions_written"] is True
    assert out["config_overlay"]["epochs"] == 6  # file overrode defaults
    assert out["ga_champion_rows"] == 1
    assert out["inference_rows"] > 0
    assert out["trading_summary_rows"] > 0
    assert out["warehouse_facts"] == out["metrics_rows"]
