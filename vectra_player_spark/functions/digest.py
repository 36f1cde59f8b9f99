"""Per-group trace digests — compact, hash-checkable projections of large
deterministic replay outputs.

The sequential replay operators (M3 stateful feature extraction, M18
decision-pipeline replay) emit one row per (episode, tick) — 10k+ rows at
sf0.01 — with NO independent SQL oracle (the state machines are genuinely
non-SQL). Their values ARE deterministic, so the driver-checkable form is
a REGRESSION PIN: collapse each episode's trace to (key, n_rows, md5) and
freeze the engine's own sf0.01 output as a VALUES-literal oracle
(tools/freeze_replay_pins.py). The same per-game-md5 idea as
tests/golden_harness.py, expressed JVM-side so the digest itself is a
distributed single-shuffle plan.

Scale shape: ONE hash exchange on the group key; collect_list buffers one
episode's rendered rows per group (bounded by max episode length — the
same bound every applyInPandas replay already holds per group).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def per_group_digest(
    df: DataFrame,
    key: str = "game_id",
    order: str = "tick",
    n_alias: str = "n_ticks",
    digest_alias: str = "trace_md5",
) -> DataFrame:
    """Collapse a per-tick trace to one (key, n_rows, md5) row per group.

    Row rendering is pure JVM: every non-key column (the order column
    first, so the hash covers ordering) is CAST to string with NULLs made
    explicit (concat_ws would silently drop them, aliasing NULL against
    empty string), '|'-joined, sorted within the group by the order column
    via array_sort over (order, row) structs, then newline-joined and
    md5'd. Deterministic for any partitioning as long as ``order`` is
    unique within a group.
    """
    cols = [order] + [c for c in df.columns if c not in (key, order)]
    row_str = F.concat_ws(
        "|", *[F.coalesce(F.col(c).cast("string"), F.lit("NULL")) for c in cols]
    )
    packed = F.struct(F.col(order).alias("_o"), row_str.alias("_s"))
    return df.groupBy(key).agg(
        F.count(F.lit(1)).alias(n_alias),
        F.md5(
            F.array_join(
                F.transform(F.array_sort(F.collect_list(packed)), lambda s: s["_s"]),
                "\n",
            )
        ).alias(digest_alias),
    )
