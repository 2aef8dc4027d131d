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
