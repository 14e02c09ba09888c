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
}
