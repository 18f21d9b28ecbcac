"""Catalog part — matrix profile / motif / discord (STAGED for r8).

The matrix profile (Yeh et al., ICDM 2016, "Matrix Profile I") is the
all-pairs-similarity-search primitive for time series: for every
length-m subsequence, the distance to its nearest non-trivial
neighbor.  Its two classic read-outs come free:

- matrix_profile_4h   the profile itself per series (nearest-neighbor
                      distance + index for every subsequence)
- motif_top_pair      the top MOTIF (Mueen et al. 2009): the closest
                      admissible subsequence pair
- discord_top         the top DISCORD (Keogh et al. 2005, HOT SAX):
                      the subsequence farthest from its nearest
                      neighbor — the anomaly read-out

Series grain: 4-hour activity bars per event type (bar = total value
CENTS in the slot, tick-indexed over observed slots), window m = 12
bars (two days), trivial-match exclusion zone |i − j| >= m/2 = 6
(the standard convention).  Distances are UN-normalized squared
Euclidean on exact integer cents, so every d² is an exact int64 on
both engines — no float enters until never; ties break on the
smallest index, mirrored by numpy's first-argmin and the oracle's
ORDER BY.

Reference analog: the per-window similarity scans of the strategy
layer (heuristic_strategy.py pattern searches); re-expressed as the
published MP primitive instead of its ad-hoc loops.

Scale: series are the parallel axis — one applyInPandas task per
series computes its O(n²·m) profile in vectorized int64 numpy (n =
|4h slots| ≈ 180, constant per month regardless of fact rows; at
100 TB the fact scan reduces to |series|×|slots| bars map-side, and
N series = N independent tasks).  For long series swap the kernel
for MASS/STOMP (O(n²) with FFT dot products) inside the same UDF
boundary — the plan shape does not change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from predictor_spark.plans.catalog import query, _t

_M = 12        # subsequence length (4h bars: two days)
_EXCL = 6      # trivial-match exclusion: |i - j| >= m/2

#: shared oracle prelude: per-series int-cent 4h bars as an ordered
#: list, plus the admissible directed pair grid with exact d²
_ORACLE_PAIRS = f"""
    bars AS MATERIALIZED (
        SELECT event_type AS sid, epoch_ms(ts) // 14400000 AS slot,
               sum(CAST(round(value * 100) AS BIGINT)) AS bar
        FROM events GROUP BY 1, 2
    ),
    series AS MATERIALIZED (
        SELECT sid, list(bar ORDER BY slot) AS xs,
               count(*) - {_M} + 1 AS nsub
        FROM bars GROUP BY sid HAVING count(*) >= {_M + 2 * _EXCL}
    ),
    pairs AS MATERIALIZED (
        SELECT sid, i, j,
               list_sum(list_transform(range(0, {_M}),
                   k -> (xs[CAST(i + k AS INTEGER)]
                         - xs[CAST(j + k AS INTEGER)])
                        * (xs[CAST(i + k AS INTEGER)]
                           - xs[CAST(j + k AS INTEGER)]))) AS d2
        FROM series,
             LATERAL (SELECT unnest(range(1, nsub + 1)) AS i),
             LATERAL (SELECT unnest(range(1, nsub + 1)) AS j)
        WHERE abs(i - j) >= {_EXCL}
    )
"""


def _profile_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark side of all three queries: the full matrix profile
    (event_type, i, mp_d2, nn_idx) via one applyInPandas task per
    series over the 4h-bar reduction of ONE events scan."""
    import numpy as np
    import pandas as pd

    ev = _t(spark, sf_dir, "events")
    bars = (ev.select(
        F.col("event_type"),
        F.expr("unix_millis(ts) div 14400000").alias("slot"),
        F.round(F.col("value") * 100).cast("long").alias("cents"))
        .groupBy("event_type", "slot")
        .agg(F.sum("cents").alias("bar")))

    schema = StructType([
        StructField("event_type", StringType()),
        StructField("i", LongType()),
        StructField("mp_d2", LongType()),
        StructField("nn_idx", LongType()),
    ])

    def profile(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("slot")
        x = pdf["bar"].to_numpy(dtype=np.int64)
        n = len(x)
        nsub = n - _M + 1
        # nsub >= 2*excl + 1 guarantees EVERY i has an admissible j
        # (the middle subsequence can reach past the exclusion zone)
        if n < _M + 2 * _EXCL:
            return pd.DataFrame(
                {"event_type": pd.Series(dtype=object),
                 "i": pd.Series(dtype=np.int64),
                 "mp_d2": pd.Series(dtype=np.int64),
                 "nn_idx": pd.Series(dtype=np.int64)})
        # subsequence matrix (nsub x m), exact int64 throughout.
        # Overflow guard (ADVICE r6): numpy's int64 einsum wraps silently
        # while the DuckDB oracle's BIGINT multiply raises loudly — keep
        # the failure modes symmetric. m * (2*max|x|)^2 <= int64 max
        # requires max|x| < sqrt(int64max / m) / 2 ~ 4.4e8 cents at m=12.
        assert np.abs(x).max(initial=0) < int(
            (np.iinfo(np.int64).max // _M) ** 0.5) // 2, \
            "matrix_profile_4h: |cents bar| too large for exact int64 d2"
        subs = np.lib.stride_tricks.sliding_window_view(x, _M).astype(np.int64)
        diff = subs[:, None, :] - subs[None, :, :]
        d2 = np.einsum("ijk,ijk->ij", diff, diff)
        ii, jj = np.indices((nsub, nsub))
        d2[np.abs(ii - jj) < _EXCL] = np.iinfo(np.int64).max
        nn = d2.argmin(axis=1)           # first (smallest j) on ties
        mp = d2[np.arange(nsub), nn]
        return pd.DataFrame({
            "event_type": pdf["event_type"].iloc[0],
            "i": np.arange(1, nsub + 1, dtype=np.int64),
            "mp_d2": mp, "nn_idx": nn + 1})

    return bars.groupBy("event_type").applyInPandas(profile, schema)


@query(
    "matrix_profile_4h",
    oracle=f"""
    WITH {_ORACLE_PAIRS},
    ranked AS (
        SELECT sid, i, j, d2,
               row_number() OVER (PARTITION BY sid, i ORDER BY d2, j) AS rn
        FROM pairs
    )
    SELECT sid AS event_type, CAST(i AS BIGINT) AS i,
           CAST(d2 AS BIGINT) AS mp_d2, CAST(j AS BIGINT) AS nn_idx
    FROM ranked WHERE rn = 1
    ORDER BY event_type, i
    """,
)
def matrix_profile_4h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The matrix profile per series: for every subsequence start i,
    the exact-integer squared distance to its nearest admissible
    neighbor and that neighbor's start index.

    Scale: see module docstring — the quadratic kernel is inside one
    per-series task; the oracle replays it as an explicit pair grid."""
    return _profile_frame(spark, sf_dir).orderBy("event_type", "i")


@query(
    "motif_top_pair",
    oracle=f"""
    WITH {_ORACLE_PAIRS},
    ranked AS (
        SELECT sid, i, j, d2,
               row_number() OVER (PARTITION BY sid ORDER BY d2, i, j) AS rn
        FROM pairs WHERE j > i
    )
    SELECT sid AS event_type, CAST(i AS BIGINT) AS motif_a,
           CAST(j AS BIGINT) AS motif_b, CAST(d2 AS BIGINT) AS motif_d2
    FROM ranked WHERE rn = 1
    ORDER BY event_type
    """,
)
def motif_top_pair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top motif per series: the minimal-distance admissible pair —
    the matrix profile's global minimum, read as (i, nn) with i < nn.

    On the profile frame the motif is min over (mp_d2, i, min(i,nn),
    max(i,nn)); since d(i,j) = d(j,i) the row with the smaller start
    always exists, so filtering i < nn_idx before the min is exact."""
    prof = _profile_frame(spark, sf_dir)
    both = prof.select(
        "event_type",
        F.least("i", "nn_idx").alias("motif_a"),
        F.greatest("i", "nn_idx").alias("motif_b"),
        F.col("mp_d2").alias("motif_d2"))
    from pyspark.sql import Window
    w = Window.partitionBy("event_type").orderBy(
        "motif_d2", "motif_a", "motif_b")
    return (both.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .drop("rn").orderBy("event_type"))


@query(
    "discord_top",
    oracle=f"""
    WITH {_ORACLE_PAIRS},
    prof AS (
        SELECT sid, i, min(d2) AS mp_d2
        FROM pairs GROUP BY sid, i
    ),
    ranked AS (
        SELECT sid, i, mp_d2,
               row_number() OVER (PARTITION BY sid
                                  ORDER BY mp_d2 DESC, i) AS rn
        FROM prof
    )
    SELECT sid AS event_type, CAST(i AS BIGINT) AS discord_idx,
           CAST(mp_d2 AS BIGINT) AS discord_d2
    FROM ranked WHERE rn = 1
    ORDER BY event_type
    """,
)
def discord_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top discord per series: the subsequence whose NEAREST neighbor
    is farthest — the matrix profile's maximum (the anomaly that has
    no rehearsal anywhere else in the series)."""
    from pyspark.sql import Window

    prof = _profile_frame(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy(F.desc("mp_d2"), "i")
    return (prof.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("event_type", F.col("i").alias("discord_idx"),
                    F.col("mp_d2").alias("discord_d2"))
            .orderBy("event_type"))
