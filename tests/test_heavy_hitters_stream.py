"""Streaming Misra-Gries heavy hitters (streaming/stateful.py)."""

from __future__ import annotations

import json
from collections import Counter

from pyspark.sql.types import StringType, StructField, StructType

from bigdata_covid19_real_time_spark.streaming.sources import read_jsonl_stream
from bigdata_covid19_real_time_spark.streaming.stateful import (
    streaming_heavy_hitters,
)

SCHEMA = StructType([StructField("user_id", StringType())])

# skew: user 1 dominates, user 2 is moderate, a tail of singletons
BATCH1 = [1] * 18 + [2] * 6 + list(range(100, 112))
BATCH2 = [1] * 12 + [2] * 4 + list(range(200, 208))


def _write(path, ids):
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text("\n".join(json.dumps({"user_id": str(i)}) for i in ids))


def test_mg_guarantees_and_cross_batch_state(spark, tmp_path):
    _write(tmp_path / "in" / "b1.jsonl", BATCH1)
    _write(tmp_path / "in" / "b2.jsonl", BATCH2)

    stream = read_jsonl_stream(spark, str(tmp_path / "in"), schema=SCHEMA)
    out = streaming_heavy_hitters(stream, capacity=4, n_shards=2)
    emitted: list = []
    q = (
        out.writeStream.foreachBatch(
            lambda df, eid: emitted.extend((eid, r) for r in df.collect())
        )
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    last_epoch = max(e for e, _ in emitted)
    final = {r["item"]: r for e, r in emitted if e == last_epoch}
    true = Counter(BATCH1 + BATCH2)

    # per-shard totals account for every processed row
    shard_totals = {r["shard"]: r["processed_in_shard"] for r in final.values()}
    assert sum(shard_totals.values()) == len(BATCH1) + len(BATCH2)

    for item, r in final.items():
        # MG contract: never overcounts, undercounts by at most the bound
        assert r["est_count"] <= true[item]
        assert true[item] - r["est_count"] <= r["max_undercount"]

    # the dominant item must be present (true count 30 far exceeds any
    # shard's processed/(capacity+1) bound) and its cumulative estimate
    # must exceed what batch 1 alone could justify under the bound
    assert 1 in final
    assert final[1]["est_count"] >= true[1] - final[1]["max_undercount"]
    assert final[1]["est_count"] > Counter(BATCH1)[1] - final[1]["max_undercount"]

    # state persisted across the two epochs: epoch-0 estimate for item 1
    # is strictly below the final cumulative estimate
    first = {r["item"]: r for e, r in emitted if e == 0}
    assert first[1]["est_count"] < final[1]["est_count"]
