package graft.tmp
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
object TriProbe {
  def t[A](tag: String)(f: => A): A = { val s = System.nanoTime; val r = f; println(f"[probe] $tag: ${(System.nanoTime - s) / 1e9}%.2f s"); r }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val a = li.select(col("ok"), col("pk").as("a")); val b = li.select(col("ok"), col("pk").as("b"))
    val pairs = a.join(b, "ok").where(col("a") < col("b")).select("a", "b").distinct().persist()
    t("pairs")(println("edges=" + pairs.count()))
    val deg = pairs.select(col("a").as("v")).unionAll(pairs.select(col("b").as("v"))).groupBy(col("v")).agg(count(lit(1)).as("deg"))
    t("deg")(println("nodes=" + deg.count()))
    val da = deg.select(col("v").as("a"), col("deg").as("deg_a")); val db = deg.select(col("v").as("b"), col("deg").as("deg_b"))
    val oriented = pairs.join(da, "a").join(db, "b").select(when(col("deg_a") < col("deg_b") || (col("deg_a") === col("deg_b") && col("a") < col("b")), struct(col("a").as("u"), col("b").as("t"))).otherwise(struct(col("b").as("u"), col("a").as("t"))).as("e")).select(col("e.u").as("u"), col("e.t").as("t")).persist()
    t("orient")(println("oriented=" + oriented.count()))
    val o1 = oriented.select(col("u"), col("t").as("x")); val o2 = oriented.select(col("u"), col("t").as("y"))
    val wp = o1.join(o2, "u").where(col("x") < col("y"))
    t("wedges")(println("wedges=" + wp.count()))
    val closing = pairs.select(col("a").as("x"), col("b").as("y"))
    t("triangles")(println("tri=" + wp.join(closing, Seq("x", "y"), "left_semi").count()))
    spark.stop()
  }
}
