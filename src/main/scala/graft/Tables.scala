package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Loaders for the driver-generated TPC-H-ish tables (TESTDATA.md).
  *
  * Each table is a single parquet file under `sfDir`. At cluster scale the
  * same paths would be directories of many part-files — `spark.read.parquet`
  * handles both identically, and every query in [[Queries]] reaches the scan
  * through here, so filter pushdown / column pruning apply at any scale.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def df(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val raw = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events")
      // ts is parquet TIMESTAMP(NANOS) → read as epoch-nano long
      // (spark.sql.legacy.parquet.nanosAsLong, set in Session) and
      // truncate to microseconds, matching DuckDB's CAST(ts AS TIMESTAMP).
      raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else raw
  }

  /** Register all tables as temp views named after the table (idempotent).
    * Lets catalog queries use `spark.table("lineitem")` / `spark.sql`.
    */
  def registerViews(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => df(spark, sfDir, n).createOrReplaceTempView(n))
}
