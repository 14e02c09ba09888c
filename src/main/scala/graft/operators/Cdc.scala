package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-capture apply — the MERGE INTO kernel of every
  * lakehouse table format, expressed engine-side: a snapshot plus a
  * changeset of (key, op, payload) rows produces the next snapshot.
  *
  * Semantics (op column values):
  *   - 'D': matched base row is dropped (an unmatched 'D' is a no-op);
  *   - 'U': matched base row's payload is replaced; an unmatched 'U'
  *          inserts (upsert semantics — the CDC stream may compact an
  *          insert+update into one row);
  *   - 'I': inserted; an 'I' matching an existing key replaces it
  *          (idempotent re-apply of a replayed batch).
  *
  * One full-outer shuffle join on the key is the whole cost; when the
  * changeset is small (the common incremental case) AQE demotes it to
  * a broadcast join with no code change. The changeset must be
  * key-unique — enforce upstream (e.g. keep the latest op per key via
  * `latestByKey`), because MERGE on duplicate keys is ill-defined in
  * every engine.
  */
object Cdc {

  /** @param base     current snapshot
    * @param changes  (key, op, payload…) — same payload columns as base
    * @param keyCol   join key column name (present in both)
    * @param opCol    op column name in `changes` ('D' | 'U' | 'I')
    */
  def applyChangeset(base: DataFrame, changes: DataFrame,
      keyCol: String, opCol: String): DataFrame = {
    val payload = base.columns.filter(_ != keyCol)
    require(payload.forall(changes.columns.contains),
      s"changeset must carry the snapshot payload columns: ${payload.mkString(",")}")
    val b = payload.foldLeft(base)((d, c) => d.withColumnRenamed(c, s"_b_$c"))
    val c = payload.foldLeft(changes)((d, ch) => d.withColumnRenamed(ch, s"_c_$ch"))
    val joined = b.join(c, Seq(keyCol), "full_outer")
    val applied = joined.where(col(opCol).isNull || col(opCol) =!= "D")
    val takeChange = col(opCol).isin("U", "I")
    payload.foldLeft(applied) { (d, p) =>
      d.withColumn(p, when(takeChange, col(s"_c_$p")).otherwise(col(s"_b_$p")))
    }.select(keyCol, payload: _*)
  }

  /** Snapshot diff — the inverse of [[applyChangeset]]: given two
    * keyed snapshots, classify every key as added ('A', in v2 only),
    * removed ('R', in v1 only), or changed ('C', in both with any
    * payload column differing). Unchanged keys are not emitted — on a
    * 100 TB table the diff output is proportional to the CHURN, not
    * the table.
    *
    * Payload comparison is null-safe equality over all non-key
    * columns (via a single struct `<=>`), so a NULL→value transition
    * counts as a change. One full-outer shuffle join on the key is
    * the whole cost; both sides' scans prune to key + compared
    * columns.
    */
  def snapshotDiff(v1: DataFrame, v2: DataFrame, keyCol: String): DataFrame = {
    val payload = v1.columns.filter(_ != keyCol)
    // Exact column-set equality (implies v2 carries keyCol) — a renamed
    // key plus an extra column would otherwise pass a subset check and
    // surface later as an opaque unresolved-column error.
    require(v1.columns.toSet == v2.columns.toSet,
      s"snapshots must share the same columns: v1=${v1.columns.sorted.mkString(",")} " +
        s"v2=${v2.columns.sorted.mkString(",")}")
    val a = v1.select(col(keyCol),
      struct(payload.map(col).toIndexedSeq: _*).as("_p1"), lit(1).as("_in1"))
    val b = v2.select(col(keyCol).as("_k2"),
      struct(payload.map(col).toIndexedSeq: _*).as("_p2"), lit(1).as("_in2"))
    a.join(b, col(keyCol) === col("_k2"), "full_outer")
      .select(coalesce(col(keyCol), col("_k2")).as(keyCol),
        when(col("_in1").isNull, "A")
          .when(col("_in2").isNull, "R")
          .when(!(col("_p1") <=> col("_p2")), "C").as("change"))
      .where(col("change").isNotNull)
  }
}
