"""Z-order layout: the Morton key actually buys 2-D file locality."""

from __future__ import annotations

import glob
import math

from pyspark.sql import functions as F

from bigdata_covid19_real_time_spark.operators.zorder import (
    morton_key,
    zorder_keys,
    zorder_write,
)


def test_morton_key_interleaves_bits(spark):
    df = spark.range(1).select(
        morton_key(F.lit(0b101).cast("long"), F.lit(0b011).cast("long"), bits=3).alias("z")
    )
    # x=101 -> bits at positions 5,3,1 = 100010_; y=011 -> positions 2,0
    # z = x1<<5 | x0<<3? spelled out: x bits (1,0,1) at odd pos (5,3,1): 100010
    #     y bits (0,1,1) at even pos (4,2,0): 000101 -> union 100111 = 39
    assert df.collect()[0]["z"] == 0b100111


def test_zorder_keys_cover_full_bucket_range(spark):
    df = spark.range(1000).select(
        F.col("id").alias("k"),
        (F.col("id") % 100).cast("double").alias("x"),
        (F.col("id") % 7).cast("double").alias("y"),
    )
    out = zorder_keys(df, "x", "y", bits=4)
    stats = out.agg(
        F.min("__zx"), F.max("__zx"), F.min("__zy"), F.max("__zy"),
        F.count_distinct("zkey"),
    ).collect()[0]
    assert stats[0] == 0 and stats[1] == 15
    assert stats[2] == 0 and stats[3] == 15


def test_zorder_write_gives_two_dimensional_file_locality(spark, tmp_path):
    """After the z-ordered write, each file's (x, y) span is a narrow
    tile: the average per-file span of BOTH columns is far below the
    global span — the property that makes row-group stats prune filters
    on either column."""
    import random

    rng = random.Random(7)
    rows = [(i, rng.random() * 1000.0, float(rng.randrange(10_000))) for i in range(20_000)]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    path = str(tmp_path / "zordered")
    zorder_write(df, path, "x", "y", bits=16, num_files=16)

    spans = []
    for f in glob.glob(f"{path}/part-*.parquet"):
        part = spark.read.parquet(f)
        s = part.agg(
            (F.max("x") - F.min("x")).alias("xs"),
            (F.max("y") - F.min("y")).alias("ys"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        spans.append((s["xs"], s["ys"], s["n"]))
    assert sum(n for _, _, n in spans) == 20_000
    mean_xs = sum(x for x, _, _ in spans) / len(spans)
    mean_ys = sum(y for _, y, _ in spans) / len(spans)
    # 16 files over a 2-D key: each tile should cover well under half of
    # each dimension (a 1-D sort on x would leave y spans ~= full range)
    assert mean_xs < 1000.0 * 0.5, f"x spans too wide: {mean_xs}"
    assert mean_ys < 10_000.0 * 0.5, f"y spans too wide: {mean_ys}"
    # and the product (tile area) must beat the unclustered baseline by
    # a lot: 16 contiguous zkey ranges cover ~1/16 of the space each,
    # but a range can straddle two Z-curve tiles, so bound at ~2/16
    assert mean_xs * mean_ys < (1000.0 * 10_000.0) * 0.15
