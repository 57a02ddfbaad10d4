"""Bucketed join must be exchange-free at query time (the write-once,
join-many co-location contract)."""

from __future__ import annotations

from biggie_spark.ops.bucketing import write_bucketed

from tests.test_plans import plan_of


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    o_name, l_name = write_bucketed(spark, sf_dir)
    o = spark.table(o_name)
    li = spark.table(l_name)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force SMJ so the assertion is about bucketing, not broadcast
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = li.join(o, li.l_orderkey == o.o_orderkey).select(
            "o_orderkey", "l_quantity", "o_totalprice"
        )
        plan = plan_of(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join still shuffles"
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
