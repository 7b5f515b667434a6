package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the claim the dedup/sessionize scaladocs lean on: AQE detects a
  * skewed shuffle partition at runtime and splits it, so a hot key does
  * not serialize a sort-merge join onto one task. (Where AQE can't apply
  * — e.g. the hot key must still meet in a single aggregate task —
  * SkewOps.saltedJoin is the explicit rewrite.) */
class AqeSkewSpec extends AnyFunSuite {

  lazy val spark = Session.builder("graft-test").master("local[4]")
    .config("spark.sql.shuffle.partitions", "4").getOrCreate()

  test("AQE marks the skewed sort-merge join as skew-handled") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")

      // 200k of 203k left rows share key 1 → one hot shuffle partition.
      // Payload is an incompressible digest so the partition's shuffle
      // BYTES (what AQE measures) are as skewed as its row count; no
      // aggregate downstream, so the skew rewrite is distribution-legal.
      val left = spark.range(0, 200000)
        .select(lit(1L).as("k"), md5(col("id").cast("string")).as("payload"))
        .union(spark.range(0, 3000).select((col("id") % 99 + 2).as("k"),
          md5(col("id").cast("string"))))
      val right = spark.range(1, 101).select(col("id").as("k"),
        concat(lit("dim"), col("id")).as("name"))

      val joined = left.join(right, "k")
      assert(joined.count() == 203000) // AQE re-plans at runtime — must execute
      joined.collect()
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"no skew-split in final AQE plan:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
