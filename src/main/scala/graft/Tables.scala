package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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

  /** Canonicalize the events `ts` column to [[TimestampType]] regardless of
    * how the producer encoded it. On a 100 TB lake upstream writers change
    * encodings without notice; a loader pinned to one physical type silently
    * severs every downstream query when they do (that exact failure took out
    * 15 queries in round 7 when testdata switched NANOS→micros). Observed
    * encodings, each pinned by TsEncodingSpec:
    *   - epoch-nano INT64 (legacy TIMESTAMP(NANOS) surfaced as long via
    *     spark.sql.legacy.parquet.nanosAsLong, or a raw long column)
    *     → truncate to micros;
    *   - TIMESTAMP(isAdjustedToUTC=false) → Spark TimestampNTZType → cast;
    *     with the session timezone fixed to UTC (Session.scala) the cast is
    *     wall-clock-preserving, matching DuckDB's naive CAST(ts AS TIMESTAMP);
    *   - TIMESTAMP(isAdjustedToUTC=true) → already TimestampType → pass.
    * Anything else fails loudly rather than producing silently-shifted times.
    */
  private[graft] def canonicalTs(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampType => raw
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case other =>
        sys.error(s"events.ts has unsupported type $other; expected " +
          "epoch-nano long, timestamp, or timestamp_ntz")
    }

  def df(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val raw = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") canonicalTs(raw) else raw
  }

  /** TPC-H money columns, per table, for the exact-decimal read path. */
  val moneyCols: Map[String, Seq[String]] = Map(
    "lineitem" -> Seq("l_extendedprice", "l_discount", "l_tax"),
    "orders" -> Seq("o_totalprice"),
    "customer" -> Seq("c_acctbal"),
    "supplier" -> Seq("s_acctbal"),
    "part" -> Seq("p_retailprice"))

  /** Like [[df]], with money columns cast to DECIMAL(12,2) at the scan —
    * the exact-money option for 100 TB accounting jobs where double
    * summation error and cross-engine rounding ties (the q35 class of
    * bug) are unacceptable. TESTDATA stores these as double with 2-digit
    * values, so the cast is lossless; a production table would carry the
    * decimal type in the parquet schema and skip it. */
  def dfDecimal(spark: SparkSession, sfDir: String, name: String): DataFrame =
    moneyCols.getOrElse(name, Nil).foldLeft(df(spark, sfDir, name)) {
      (d, c) => d.withColumn(c, d(c).cast("decimal(12,2)"))
    }

  /** Register all tables as temp views named after the table (idempotent).
    * Lets catalog queries use `spark.table("lineitem")` / `spark.sql`.
    */
  def registerViews(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => df(spark, sfDir, n).createOrReplaceTempView(n))
}
