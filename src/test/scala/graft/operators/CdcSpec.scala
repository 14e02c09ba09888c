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
}
