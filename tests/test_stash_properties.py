"""Property-based kv-semantics tests (hypothesis): the reference's Stash
invariants hold for our DataFrame rewrite —
put -> get is identity, delete -> exists is false, keys() reflects
put/delete, upsert replaces rather than duplicates (SURVEY.md §5.2.4)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import Row

from biggie_spark.stash import Stash

KEYS = st.lists(
    st.integers(min_value=0, max_value=10_000), min_size=1, max_size=8, unique=True
)


def _mk_stash(spark, rows):
    df = spark.createDataFrame([Row(doc_id=k, text=v) for k, v in rows])
    return Stash(spark, df, key="doc_id")


BASE = [(1, "one"), (2, "two"), (3, "three"), (10, "ten")]


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(keys=KEYS, payload=st.text(min_size=0, max_size=20))
def test_put_get_identity(spark, keys, payload):
    s = _mk_stash(spark, BASE)
    incoming = spark.createDataFrame([Row(doc_id=k, text=payload) for k in keys])
    s2 = s.add(incoming)
    got = {r.doc_id: r.text for r in s2.mget(keys).collect()}
    assert got == {k: payload for k in keys}
    # upsert never duplicates a key
    assert s2.keys().count() == len(set(k for k, _ in BASE) | set(keys))


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(keys=KEYS)
def test_delete_exists_false(spark, keys):
    s = _mk_stash(spark, BASE)
    s2 = s.remove(keys)
    for k in keys:
        assert k not in s2
    surviving = {k for k, _ in BASE} - set(keys)
    assert {r.doc_id for r in s2.keys().collect()} == surviving


def test_contains_and_len(spark):
    s = _mk_stash(spark, BASE)
    assert len(s) == 4
    assert 1 in s and 99 not in s
    assert s.get_fields(1, ["text"]).collect()[0].text == "one"


def test_scan_range_and_fields(spark):
    s = _mk_stash(spark, BASE)
    assert {r.doc_id for r in s.scan_range(2, 10).collect()} == {2, 3, 10}
    assert s.fields() == ["text"]


def test_update_field(spark):
    s = _mk_stash(spark, BASE)
    s2 = s.update_field(2, "text", "TWO!")
    assert s2.get(2).collect()[0].text == "TWO!"
    assert s2.get(1).collect()[0].text == "one"  # others untouched
    assert len(s2) == len(s)


def test_merge_newest_wins_and_unions_fields(spark):
    """merge(): conflicts resolve to the newer stash, disjoint keys union,
    and a field only one side has becomes null on the other's rows."""
    from pyspark.sql import Row

    from biggie_spark.stash import Stash

    a = Stash(
        spark,
        spark.createDataFrame(
            [Row(k=1, v="old1"), Row(k=2, v="old2"), Row(k=3, v="old3")]
        ),
        "k",
    )
    b = Stash(
        spark,
        spark.createDataFrame([Row(k=2, v="new2", extra=9), Row(k=4, v="new4", extra=7)]),
        "k",
    )
    m = {r.k: (r.v, r.extra) for r in a.merge(b).df.collect()}
    assert m == {
        1: ("old1", None),
        2: ("new2", 9),
        3: ("old3", None),
        4: ("new4", 7),
    }
    import pytest as _pytest

    with _pytest.raises(ValueError):
        a.merge(Stash(spark, b.df.withColumnRenamed("k", "kk"), "kk"))
