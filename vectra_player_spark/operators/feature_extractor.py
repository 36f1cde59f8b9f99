"""Stateful per-episode feature extraction (SURVEY §2.9 M3) and the
theta-Bayesian estimator (M11).

M3 is the reference's 14-feature sidebet vector
(src/ml/feature_extractor.py:36-314): statistical position of the current
tick vs the historical duration distribution, volatility evolution, spike
pattern (frequency / spacing / death-spike score), and strategic context
(bet feasibility / cooldown). The pass is genuinely sequential (spike
history and cooldown are running state), so it runs as `applyInPandas`
per episode with the historical stats broadcast — episodes parallelize,
state stays inside a group.

M11 (recording_ui/services/monte_carlo.py:176-257): Beta posterior with
theta-accelerated pseudo-counts — pure arithmetic, used inside simulations
and exposed for the profile producer.
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURES_SCHEMA = (
    "game_id string, tick long, "
    "duration_percentile double, duration_zscore double, duration_iqr_pos double, "
    "vol_ratio double, vol_momentum double, vol_intensity double, vol_accel double, "
    "spike_freq double, spike_spacing double, death_spike_score double, "
    "ticks_since_spike long, bet_feasible boolean, cooldown_remaining long, "
    "theta double"
)


@dataclass(frozen=True)
class HistoricalStats:
    """Broadcastable duration-distribution stats (the 'stats' argument of
    FeatureExtractor.extract_features).

    The empirical CDF is held as a (distinct duration → cumulative count)
    histogram, NOT the raw duration list: distinct episode lengths are
    bounded by the max game length (a few thousand ticks) regardless of
    how many episodes exist, so the broadcast stays a few KB at any scale
    while `pct_at` stays EXACT — bisect over distinct values with
    cumulative counts gives the same fraction as bisect over the full
    sorted multiset."""

    mean: float
    std: float
    p25: float
    p50: float
    p75: float
    cdf_durations: tuple  # sorted distinct duration values
    cdf_cum_counts: tuple  # cumulative row counts aligned with cdf_durations
    n: int

    def pct_at(self, value: float) -> float:
        """Fraction of historical durations <= value (empirical CDF)."""
        import bisect

        if not self.n:
            return 0.0
        i = bisect.bisect_right(self.cdf_durations, value)
        return self.cdf_cum_counts[i - 1] / self.n if i else 0.0

    @classmethod
    def fit(cls, durations: DataFrame, duration_col: str = "duration") -> "HistoricalStats":
        """Fully distributed fit: scalar aggregates (exact percentile is
        executor-side, its state bounded by distinct values) plus one
        distinct-duration histogram — no full-column collect anywhere
        (the previous sort_array(collect_list) form was a driver OOM at
        100× episode counts)."""
        row = durations.agg(
            F.avg(duration_col).alias("mean"),
            F.stddev(duration_col).alias("std"),
            F.expr(f"percentile({duration_col}, 0.25)").alias("p25"),
            F.expr(f"percentile({duration_col}, 0.5)").alias("p50"),
            F.expr(f"percentile({duration_col}, 0.75)").alias("p75"),
        ).collect()[0]
        hist = (
            durations.groupBy(F.col(duration_col).alias("d"))
            .agg(F.count(F.lit(1)).alias("c"))
            .orderBy("d")
            .collect()
        )
        values = tuple(r["d"] for r in hist)
        cum = []
        total = 0
        for r in hist:
            total += int(r["c"])
            cum.append(total)
        if row["mean"] is None:
            # Empty corpus (fresh lake, empty partition): zeroed stats
            # keep the extractor runnable — downstream features degrade
            # to 0/percentile-0 rather than crashing the job.
            return cls(0.0, 0.0, 0.0, 0.0, 0.0, (), (), 0)
        return cls(
            float(row["mean"]),
            float(row["std"] or 0.0),
            float(row["p25"]),
            float(row["p50"]),
            float(row["p75"]),
            values,
            tuple(cum),
            total,
        )


def extract_episode_features(
    episodes: DataFrame,
    stats: HistoricalStats,
    episode_key: str = "game_id",
    order_key: str = "seq",
    price_col: str = "value",
    spike_threshold: float = 2.0,
    cooldown_ticks: int = 5,
    theta_base: float = 1.0,
    theta_max: float = 3.0,
) -> DataFrame:
    """M3: one feature row per tick per episode (sequential state pass)."""
    spark = episodes.sparkSession
    bc = spark.sparkContext.broadcast(stats)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        st = bc.value
        pdf = pdf.sort_values(order_key)
        gid = pdf[episode_key].iloc[0]
        prices = pdf[price_col].astype(float).tolist()
        n = len(prices)
        iqr = st.p75 - st.p25
        out = []
        spikes: list[int] = []  # tick indices of abs-return spikes
        cooldown = 0
        rets: list[float] = []
        for tick in range(n):
            if tick > 0:
                rets.append(prices[tick] - prices[tick - 1])
            # statistical position of the current age vs history
            pct = st.pct_at(tick)
            z = (tick - st.mean) / st.std if st.std > 0 else 0.0
            iqr_pos = (tick - st.p50) / iqr if iqr > 0 else 0.0
            # volatility evolution over trailing windows
            v5 = float(np.std(rets[-5:])) if len(rets) >= 2 else 0.0
            v10 = float(np.std(rets[-10:])) if len(rets) >= 2 else 0.0
            vol_ratio = v5 / v10 if v10 > 0 else 1.0
            vol_momentum = v5 - v10
            med_abs = float(np.median(np.abs(rets))) if rets else 0.0
            vol_intensity = (abs(rets[-1]) / med_abs) if rets and med_abs > 0 else 0.0
            prev_v5 = float(np.std(rets[-6:-1])) if len(rets) >= 3 else 0.0
            vol_accel = v5 - prev_v5
            # spike pattern
            if rets and med_abs > 0 and abs(rets[-1]) > spike_threshold * med_abs:
                spikes.append(tick)
            spike_freq = len(spikes) / (tick + 1)
            spike_spacing = (
                float(np.mean(np.diff(spikes))) if len(spikes) >= 2 else 0.0
            )
            ticks_since_spike = tick - spikes[-1] if spikes else tick
            death_spike = (
                vol_intensity * (1.0 if rets and rets[-1] < 0 else 0.3)
                if rets
                else 0.0
            )
            # strategic context
            if cooldown > 0:
                cooldown -= 1
            feasible = cooldown == 0 and pct < 0.95
            theta = min(theta_max, theta_base * (1.0 + pct))
            out.append(
                (
                    gid,
                    tick,
                    round(pct, 6),
                    round(z, 6),
                    round(iqr_pos, 6),
                    round(vol_ratio, 6),
                    round(vol_momentum, 6),
                    round(vol_intensity, 6),
                    round(vol_accel, 6),
                    round(spike_freq, 6),
                    round(spike_spacing, 6),
                    round(death_spike, 6),
                    ticks_since_spike,
                    feasible,
                    cooldown,
                    round(theta, 6),
                )
            )
        return pd.DataFrame(
            out,
            columns=[f.split()[0] for f in FEATURES_SCHEMA.split(", ")],
        )

    return episodes.groupBy(episode_key).applyInPandas(run, FEATURES_SCHEMA)


def theta_bayesian_posterior(
    wins: int,
    losses: int,
    theta: float = 1.0,
    prior_alpha: float = 1.0,
    prior_beta: float = 5.0,
) -> dict:
    """M11: Beta posterior with theta-accelerated pseudo-counts — theta > 1
    weights recent evidence harder (pseudo-count amplification). Returns
    mean, variance, a 95% credible interval and the Kelly fraction at 5:1."""
    import math

    a = prior_alpha + theta * wins
    b = prior_beta + theta * losses
    mean = a / (a + b)
    var = a * b / ((a + b) ** 2 * (a + b + 1))
    sd = math.sqrt(var)
    kelly = max(0.0, (mean * 5.0 - (1 - mean)) / 5.0)
    return {
        "alpha": a,
        "beta": b,
        "mean": mean,
        "variance": var,
        "credible_low": max(0.0, mean - 1.96 * sd),
        "credible_high": min(1.0, mean + 1.96 * sd),
        "kelly_fraction": kelly,
    }
