"""Stratified-sample lake for 100×-parity of the oracle-blocked tail.

At the d=100 duplicated lake, a handful of queries' CHECKING SQL — not
the engine — is the bottleneck: DuckDB's recursive transitive closure
(canonicalization oracles) and all-pairs enumeration (n-gram Jaccard)
OOM at 100× clique volume (SCALE.md §"Parity at 100×"). The fix that
keeps the check honest is stratified GROUP sampling: keep a deterministic
~5% of base-document groups but keep EVERY one of a sampled group's d
copies — cliques stay intact at full duplication (the property those
queries exist to handle), total volume drops 20×, and the oracle fits.

Copies in the scale lakes are id-shifted by k·SHIFT (tools/make_scale10),
so group identity is `id % SHIFT`; membership is crc32(base)%%20==0 —
deterministic, so the sample is reproducible without storing it.

Usage: python tools/make_sample_lake.py [src_lake] [out_dir] [mod]
Writes sampled documents/embeddings parquet; the remaining tables are
symlinked from the source lake (the blocked queries never read them, but
the harness's table loader expects the files to exist).
"""

from __future__ import annotations

import os
import sys

SHIFT = 100_000_000


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale100"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale100_sample"
    mod = int(sys.argv[3]) if len(sys.argv) > 3 else 20

    sys.path.insert(0, "/root/repo")
    from pyspark.sql import functions as F

    from vectra_player_spark.session import get_spark
    from vectra_player_spark.tables import TABLES, t

    spark = get_spark()
    os.makedirs(out, exist_ok=True)

    for name, id_col in (("documents", "doc_id"), ("embeddings", "vec_id")):
        df = t(spark, src, name)
        kept = df.where(
            F.crc32((F.col(id_col) % SHIFT).cast("string")) % mod == 0
        )
        kept.write.mode("overwrite").parquet(os.path.join(out, f"{name}.parquet"))
        print(f"{name}: {df.count()} -> {kept.count()} rows", flush=True)

    for name in TABLES:
        dst = os.path.join(out, f"{name}.parquet")
        if os.path.exists(dst):
            continue
        os.symlink(os.path.join(src, f"{name}.parquet"), dst)
    print(f"sample lake at {out} (1/{mod} of groups, full duplication)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
