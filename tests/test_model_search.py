"""Optimizer-over-predictor composition (VERDICT r3 #5): GA search
driving the distributed N-BEATS estimator with the reference fitness
law, crash isolation, and checkpoint/resume.
"""

from __future__ import annotations

import math


def test_nbeats_ga_search_end_to_end(spark, tmp_path):
    from predictor_spark.plans.model_search import (
        nbeats_ga_search,
        nbeats_ga_search_report,
    )

    ck = str(tmp_path / "search.json")
    res = nbeats_ga_search(
        spark, "/root/testdata/sf0.001", pop_size=3, n_generations=2,
        epochs=4, max_series=None, seed=0, checkpoint_path=ck,
        meta_log_path=str(tmp_path / "meta.csv"),
    )
    assert len(res.history) == 2
    assert math.isfinite(res.best_fitness)
    # fitness < 0 means the champion beats naive on the weighted deltas
    n_evals = sum(1 for e in res.history for f in e["fitnesses"]
                  if f is not None and math.isfinite(f))
    assert n_evals >= 3
    assert (tmp_path / "search.json").exists()
    assert (tmp_path / "meta.csv").read_text().count("\n") >= n_evals

    # a finished search resumes to its champion without re-running
    again = nbeats_ga_search(
        spark, "/root/testdata/sf0.001", pop_size=3, n_generations=2,
        epochs=4, max_series=None, seed=0, checkpoint_path=ck,
    )
    assert again.best_params == res.best_params
    assert again.best_fitness == res.best_fitness

    rep = nbeats_ga_search_report(
        spark, "/root/testdata/sf0.001", pop_size=3, n_generations=2,
        epochs=4, max_series=None, seed=0, checkpoint_path=ck,
    ).collect()[0]
    assert rep["generations"] == 2
    assert rep["best_fitness"] == res.best_fitness


def test_emit_train_flags_rows(spark):
    """emit_train adds in-sample rows flagged is_train; the test rows
    equal the emit_train=False output."""
    from pyspark.sql import functions as F

    from predictor_spark.models.estimator import nbeats_fit_predict_per_series
    from predictor_spark.sources.tables import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events") \
        .filter(F.col("user_id") < 5)
    kw = dict(window=8, horizons=(1,), epochs=3, seed=0)
    plain = nbeats_fit_predict_per_series(ev, **kw).toPandas() \
        .sort_values(["user_id", "ts"]).reset_index(drop=True)
    both = nbeats_fit_predict_per_series(ev, emit_train=True, **kw).toPandas()
    te = both[~both["is_train"]].drop(columns="is_train") \
        .sort_values(["user_id", "ts"]).reset_index(drop=True)
    tr = both[both["is_train"]]
    assert len(tr) > 0 and len(te) == len(plain)
    assert (te["pred_h1"].to_numpy() == plain["pred_h1"].to_numpy()).all()
    assert (tr["unc_h1"] == 0.0).all()
