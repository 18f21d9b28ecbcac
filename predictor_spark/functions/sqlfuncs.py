"""SQL-callable engine functions — the `spark.sql` face of the operator
library (reference analog: the scalar helpers every plugin imports,
e.g. the normalization/guard functions of stl_norm.py, exposed here as
session-registered SQL functions instead of Python-only call sites).

Registration is idempotent per session. Spark has no SQL-macro API, so
these are Arrow-vectorized pandas UDFs with semantics pinned to the
Column-expression forms in operators/*.py by parity tests.

| SQL name | semantics | implementation |
|---|---|---|
| ps_portable_hash(s) | 28-bit md5-prefix int (text.portable_hash) | pandas UDF (hashlib, vectorized) |
| ps_log_return(cur, prev) | guarded log-return (W9: 0 unless both > 0) | pandas UDF |
| ps_quality_score(text) | Gopher-style [0,1] quality score | pandas UDF |
| ps_sym_log1p(x) | sign(x) * log1p(abs(x)) (W13) | pandas UDF |

Scalar pandas UDFs are the SLOW path relative to the Column expressions
in operators/*.py — the engine's own plans never call them; they exist
so ad-hoc ``spark.sql`` users get the same semantics. Parity with the
expression forms is pytest-enforced.
"""

from __future__ import annotations

import hashlib
import math

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf


@pandas_udf("bigint")
def _ps_portable_hash(s: pd.Series) -> pd.Series:
    return s.map(
        lambda x: int(hashlib.md5(x.encode()).hexdigest()[:7], 16)
        if x is not None else None
    ).astype("Int64")


@pandas_udf("double")
def _ps_log_return(cur: pd.Series, prev: pd.Series) -> pd.Series:
    import numpy as np

    c = cur.to_numpy(dtype=float)
    p = prev.to_numpy(dtype=float)
    with pd.option_context("mode.chained_assignment", None):
        ok = (c > 0) & (p > 0) & ~pd.isna(c) & ~pd.isna(p)
    out = pd.Series(0.0, index=cur.index)
    out[ok] = pd.Series(np.log(c[ok] / p[ok]), index=cur.index[ok])
    return out


@pandas_udf("double")
def _ps_sym_log1p(x: pd.Series) -> pd.Series:
    return x.map(
        lambda v: math.copysign(math.log1p(abs(v)), v) if v is not None else None
    )


@pandas_udf("double")
def _ps_quality_score(text: pd.Series) -> pd.Series:
    from predictor_spark.operators.text import EN_STOPWORDS

    stop = set(EN_STOPWORDS)
    punct = set(".!?,;:")

    def score(t):
        if t is None:
            return None
        toks = t.strip().split()
        n_tok = len(toks)
        n_chars = len(t)
        if n_tok == 0 or n_chars == 0:
            return 0.0
        punct_ratio = sum(ch in punct for ch in t) / n_chars
        stop_ratio = sum(w.lower() in stop for w in toks) / n_tok
        mean_wl = (n_chars - (n_tok - 1)) / n_tok
        len_ok = 1.0 if 10 <= n_tok <= 100000 else 0.0
        wl_ok = 1.0 if 2.0 <= mean_wl <= 12.0 else 0.0
        stop_ok = 1.0 if stop_ratio > 0 else 0.0
        return (len_ok + wl_ok + stop_ok + min(punct_ratio * 10.0, 1.0)) / 4.0

    return text.map(score)


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Register every ps_* function on the session; returns the names."""
    from predictor_spark.shiplib import ensure_workers_can_import

    ensure_workers_can_import(spark)
    funcs = {
        "ps_portable_hash": _ps_portable_hash,
        "ps_log_return": _ps_log_return,
        "ps_sym_log1p": _ps_sym_log1p,
        "ps_quality_score": _ps_quality_score,
    }
    for name, fn in funcs.items():
        spark.udf.register(name, fn)
    return sorted(funcs)
