package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Partitioned layout + partition pruning: the storage-side half of the
  * 100 TB design. A corpus written `partitionBy(key)` lets a key-filtered
  * query skip whole directories at planning time — the scan must show a
  * PartitionFilters entry and touch only the matching partition's files,
  * not filter rows after reading everything. */
class PartitionPruningSpec extends AnyFunSuite {

  lazy val spark = Session.builder("graft-test").master("local[4]")
    .config("spark.sql.shuffle.partitions", "4").getOrCreate()

  test("event_type-partitioned write is pruned to one directory on read") {
    val dir = Files.createTempDirectory("graft-part").toString
    val src = Tables.df(spark, "/root/testdata/sf0.001", "events")
    src.write.mode("overwrite").partitionBy("event_type")
      .parquet(s"$dir/events_by_type")

    val back = spark.read.parquet(s"$dir/events_by_type")
      .filter(col("event_type") === "click")

    val scan = back.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") &&
      scan.contains("event_type"), s"no partition filter in plan:\n$scan")
    assert(back.count() ==
      src.filter(col("event_type") === "click").count())
    // pruning is planning-time: the executed scan reads only the 'click'
    // directory's files, a strict subset of the unfiltered scan's
    def filesRead(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      df.queryExecution.executedPlan.collectLeaves().collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.metrics("numFiles").value
      }.get
    }
    val prunedFiles = filesRead(back)
    val allFiles =
      filesRead(spark.read.parquet(s"$dir/events_by_type"))
    assert(prunedFiles > 0 && prunedFiles < allFiles,
      s"pruned=$prunedFiles all=$allFiles")
  }
}
