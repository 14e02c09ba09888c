package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join strategies for skewed / co-located data at cluster scale. */
object Joins {

  /** Salted equi-join for skewed build sides: the left (large, skewed)
    * side gets a uniform salt in [0, buckets), the right side is
    * replicated once per salt value, and the join key becomes
    * (key, salt) — a single hot key now spreads over `buckets`
    * reducers. Result set is identical to the unsalted join (the salt
    * only re-partitions work); cost is a buckets× replication of the
    * right side, so use it large⋈small where broadcast is too big but
    * skew kills the shuffle join.
    *
    * The salt is deterministic per row content (xxhash64 of the whole
    * row), not `rand()` — retries and speculative tasks recompute the
    * same salt.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      buckets: Int): DataFrame = {
    require(buckets > 0)
    val salted = left.withColumn("_salt",
      pmod(xxhash64(left.columns.map(col).toIndexedSeq: _*), lit(buckets)).cast("int"))
    val replicated = right.withColumn("_salt",
      explode(lit((0 until buckets).toArray)))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Write `df` as a bucketed+sorted catalog table: co-locates and
    * pre-sorts by the join key so subsequent equi-joins between tables
    * bucketed the same way need NO shuffle (and no sort) — the pattern
    * for repeatedly-joined 100 TB fact tables. Requires a catalog
    * (`saveAsTable`); bucket files land under `path`.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int, path: String): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .option("path", path)
      .saveAsTable(table)
}
