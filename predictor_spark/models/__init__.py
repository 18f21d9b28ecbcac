"""Deep forecasting models (numpy cores + Spark distribution shells).

The reference's predictor_plugins train Keras models on one series per
process (predictor_plugins/common/base.py:260-322). The engine re-expresses
that family Spark-first: a deterministic pure-numpy core (no TF in the
image) whose training is distributed either per-series (applyInPandas —
N series = N independent models, the reference's actual workload shape) or
data-parallel (mapInPandas gradient aggregation for one global model).
"""
