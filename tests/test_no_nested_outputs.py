"""No registered query may emit a nested output type (Array/Map/Struct).

The driver's correctness harness canonicalizes results by sorting raw
pandas columns; a list/dict cell raises `unhashable type: 'list'` and the
row ERRs regardless of Spark-side correctness (round 5:
inverted_index_postings, the FOURTH local-pass/driver-fail divergence).
tools/check_correctness.py now hard-FAILs nested schemas before
execution; this test pins the same invariant at pytest time so an array
column can never reach a driver round again.  Plan-only: each callable is
invoked to build its DataFrame and the SCHEMA is inspected — results are
not materialized (streaming/rows-only queries do run their bounded
micro-batch, which is why this is marked slow).
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR


@pytest.mark.slow
def test_no_registered_query_emits_nested_types(spark):
    """Covers the registered surface AND the staged next-round rows —
    a staged row must already satisfy the driver's canonicalizer
    contract BEFORE the flip, or the flip re-introduces the class."""
    import __spark_entry__ as entry
    import predictor_spark.plans.catalog as catalog
    from predictor_spark.plans.staged import load_staged
    from tools.check_correctness import nested_output_columns

    offenders: dict[str, list[str]] = {}
    errors: dict[str, str] = {}
    qs = dict(entry.queries())
    assert len(qs) >= 200
    staged_names = load_staged()
    # one row per staged module at minimum — the count shrinks at every
    # flip (6 after the r8 flip), so pin consistency, not a magnitude
    from predictor_spark.plans.staged import STAGED_MODULES
    if STAGED_MODULES:
        assert staged_names, "STAGED_MODULES non-empty but no rows loaded"
    qs.update({n: catalog.QUERIES[n] for n in staged_names})
    for name, fn in qs.items():
        try:
            df = fn(spark, SF_DIR)
        except Exception as e:  # noqa: BLE001 - report, don't abort scan
            errors[name] = repr(e)[:120]
            continue
        finally:
            spark.catalog.clearCache()
        nested = nested_output_columns(df)
        if nested:
            offenders[name] = nested
    assert not errors, f"queries failed to plan: {errors}"
    assert not offenders, (
        "nested output types are forbidden (driver canonicalizer cannot "
        f"sort list/dict cells) — use array_join/to_json: {offenders}")
