package graft.operators

import graft.SparkSpec

/** MERGE semantics matrix for [[Cdc.applyChangeset]]. */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  test("applyChangeset: D/U/I matched and unmatched semantics") {
    val base = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("k", "s", "v")
    val changes = Seq(
      (2L, "D", "", 0L),     // matched delete
      (9L, "D", "", 0L),     // unmatched delete -> no-op
      (3L, "U", "c2", 33L),  // matched update
      (4L, "U", "d", 40L),   // unmatched update -> upsert
      (5L, "I", "e", 50L),   // plain insert
      (1L, "I", "a2", 11L))  // insert on existing key -> replace (replay)
      .toDF("k", "op", "s", "v")
    val got = Cdc.applyChangeset(base, changes, "k", "op")
      .as[(Long, String, Long)].collect().toSet
    assert(got == Set(
      (1L, "a2", 11L), (3L, "c2", 33L), (4L, "d", 40L), (5L, "e", 50L)))
  }

  test("applyChangeset: empty changeset is identity; payload check fires") {
    val base = Seq((1L, "a")).toDF("k", "s")
    val empty = Seq.empty[(Long, String, String)].toDF("k", "op", "s")
    val got = Cdc.applyChangeset(base, empty, "k", "op")
      .as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a")))
    val bad = Seq.empty[(Long, String)].toDF("k", "op") // missing payload col
    intercept[IllegalArgumentException] {
      Cdc.applyChangeset(base, bad, "k", "op")
    }
  }

  test("snapshotDiff: A/R/C classification, null-safe payload compare") {
    val v1 = Seq(
      (1L, Option("a"), 10L),  // unchanged
      (2L, Option("b"), 20L),  // removed
      (3L, Option("c"), 30L),  // value change
      (4L, None, 40L),         // null -> value change
      (5L, Option("e"), 50L))  // value -> null change
      .toDF("k", "s", "v")
    val v2 = Seq(
      (1L, Option("a"), 10L),
      (3L, Option("c"), 31L),
      (4L, Option("d"), 40L),
      (5L, None, 50L),
      (6L, Option("f"), 60L))  // added
      .toDF("k", "s", "v")
    val got = Cdc.snapshotDiff(v1, v2, "k")
      .as[(Long, String)].collect().toSet
    assert(got == Set((2L, "R"), (3L, "C"), (4L, "C"), (5L, "C"), (6L, "A")))
    // identical snapshots diff to empty
    assert(Cdc.snapshotDiff(v1, v1, "k").count() == 0)
  }
}
