"""CLI surface (python -m predictor_spark): list/run/explain round-trip
through the real catalog in-process."""

from __future__ import annotations

import json

from tests.conftest import SF_DIR


def test_cli_list_run_explain(spark, capsys):
    from predictor_spark.__main__ import main

    assert main(["list", "q1"]) == 0
    assert "q1_pricing_summary" in capsys.readouterr().out

    assert main(["run", "q1_pricing_summary", "--sf", SF_DIR, "--json"]) == 0
    rows = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert rows and {"l_returnflag", "sum_qty"} <= set(rows[0])

    assert main(["explain", "q1_pricing_summary", "--sf", SF_DIR]) == 0
    assert "Physical Plan" in capsys.readouterr().out

    assert main(["run", "definitely_not_a_query"]) == 2
