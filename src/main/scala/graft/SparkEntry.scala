package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY §2 (plus the large-scale
  * pipeline extensions: dedup, similarity, text analysis, streaming) is
  * exposed as a named query over `/root/testdata/<sf>/`; each query's
  * DuckDB-equivalent oracle SQL lives in the paired `oracleSql` entry.
  * See `graft.queries.QueryDef` for the oracle-parity ground rules.
  */
object SparkEntry {

  private def modules: Seq[QueryDef] =
    EtlQueries.defs ++ RelationalQueries.defs ++ TpchDeepQueries.defs ++
      EventQueries.defs ++
      TextQueries.defs ++ SimilarityQueries.defs ++
      StreamMultimodalQueries.defs ++ ExtraQueries.defs ++ Olap2Queries.defs ++
      CorpusQueries.defs ++ GraphQueries.defs ++ BizQueries.defs ++
      SignatureQueries.defs ++ StatQueries.defs

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    EtlQueries.weatherJoinPipeline(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(q => q.name -> q.spark).toMap

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops (seeded
    * generator, streaming internals) → driver records a rows-only check.
    */
  def oracleSql: Map[String, String] =
    modules.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
