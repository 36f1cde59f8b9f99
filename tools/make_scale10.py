"""Build the 10× scale dataset used by SCALE.md: each fact table from
sf0.1 unioned FACTOR times with key columns shifted per copy so joins and
windows keep their per-key row counts (users gain no extra events; orders
gain no extra lineitems) while totals grow linearly. Documents and
embeddings are duplicated VERBATIM (only ids shift), making the corpus a
worst-case duplication-heavy input for the dedup families — mirroring the
reference corpus's documented ~12.5× duplication.

Dimension tables (region, nation) are copied once: they are broadcast
sides whose size must stay O(dim).

Usage: python tools/make_scale10.py [src_sf_dir] [out_dir] [factor]
"""

from __future__ import annotations

import sys

SHIFT = 100_000_000  # far above any sf0.1 key

# table -> columns shifted by copy_index * SHIFT (PKs and the FKs that
# reference another shifted table; nation/region FKs stay).
SHIFTED: dict[str, list[str]] = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_ONCE = ("region", "nation")


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale10"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    sys.path.insert(0, "/root/repo")
    from vectra_player_spark.session import prep_session
    from vectra_player_spark.tables import load

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    prep_session(spark)

    for name in COPY_ONCE:
        load(spark, src, name).write.mode("overwrite").parquet(f"{out}/{name}.parquet")
        print(f"{name}: copied once")

    for name, keys in SHIFTED.items():
        df = load(spark, src, name)
        copies = []
        for i in range(factor):
            c = df
            for k in keys:
                c = c.withColumn(k, (F.col(k) + F.lit(i * SHIFT)).cast("bigint"))
            copies.append(c)
        union = copies[0]
        for c in copies[1:]:
            union = union.unionByName(c)
        union.write.mode("overwrite").parquet(f"{out}/{name}.parquet")
        n = spark.read.parquet(f"{out}/{name}.parquet").count()
        print(f"{name}: {n} rows ({factor}x, keys {keys})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
