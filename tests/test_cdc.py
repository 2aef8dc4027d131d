"""CDC apply-changelog semantics beyond the oracle gate."""

from __future__ import annotations


def test_apply_changelog_insert_update_delete_and_idempotent_reapply(spark):
    from hiss_cube_spark.operators.cdc import apply_changelog

    snap = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "key long, bal double"
    )
    ch = spark.createDataFrame(
        [
            (100, 2, "U", 21.0),   # update existing
            (101, 3, "D", None),   # delete existing
            (102, 4, "I", 40.0),   # insert new key
            (103, 4, "U", 41.0),   # later change to same key wins
            (104, 5, "D", None),   # delete of absent key: no-op
        ],
        "seq long, key long, op string, bal double",
    )
    out = {r["key"]: r["bal"] for r in apply_changelog(snap, ch).collect()}
    assert out == {1: 10.0, 2: 21.0, 4: 41.0}
    # applying an empty changelog is the identity
    empty = ch.where("seq < 0")
    again = {r["key"]: r["bal"] for r in apply_changelog(
        spark.createDataFrame(list(out.items()), "key long, bal double"), empty
    ).collect()}
    assert again == out


def test_table_diff_roundtrip_property(spark):
    """apply_changelog(old, table_diff(old, new)) == new, on randomized
    snapshot pairs (brute-force oracle style)."""
    import random

    from pyspark.sql import functions as F

    from hiss_cube_spark.operators.cdc import apply_changelog, table_diff

    rng = random.Random(7)
    for trial in range(3):
        old_rows = [(k, float(rng.randint(0, 5))) for k in rng.sample(range(20), 12)]
        new_rows = [(k, float(rng.randint(0, 5))) for k in rng.sample(range(20), 12)]
        old = spark.createDataFrame(old_rows, "key long, bal double")
        new = spark.createDataFrame(new_rows, "key long, bal double")
        diff = table_diff(old, new).withColumn(
            "seq", F.monotonically_increasing_id()
        )
        got = {(r["key"], r["bal"]) for r in apply_changelog(old, diff).collect()}
        assert got == set(new_rows), f"trial {trial}"
        # ops partition correctly
        ops = {r["key"]: r["op"] for r in diff.collect()}
        ok, nk = dict(old_rows), dict(new_rows)
        for k in set(ok) | set(nk):
            if k not in ok:
                assert ops[k] == "I"
            elif k not in nk:
                assert ops[k] == "D"
            elif ok[k] != nk[k]:
                assert ops[k] == "U"
            else:
                assert k not in ops


def test_scd2_history_intervals(spark):
    from hiss_cube_spark.operators.cdc import scd2_history

    ch = spark.createDataFrame(
        [
            (1, 7, "I", 10.0),
            (2, 7, "U", 11.0),
            (3, 7, "D", None),
            (4, 7, "I", 12.0),   # key re-inserted after delete
            (1, 8, "I", 50.0),   # still-current single version
        ],
        "seq long, key long, op string, bal double",
    )
    rows = {(r["key"], r["valid_from"]): r for r in scd2_history(ch).collect()}
    assert set(rows) == {(7, 1), (7, 2), (7, 4), (8, 1)}
    assert rows[(7, 1)]["valid_to"] == 2 and not rows[(7, 1)]["is_current"]
    # the delete at seq 3 closes version 2 without emitting a row
    assert rows[(7, 2)]["valid_to"] == 3 and not rows[(7, 2)]["is_current"]
    assert rows[(7, 4)]["valid_to"] is None and rows[(7, 4)]["is_current"]
    assert rows[(8, 1)]["is_current"] and rows[(8, 1)]["bal"] == 50.0
