package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins Tables.canonicalTs against every events.ts encoding the lake has
  * shipped (or could ship). Round 7's board regression — testdata switched
  * from TIMESTAMP(NANOS) to TIMESTAMP(MICROS) and a loader pinned to the
  * long path severed 15 queries — is exactly the failure this spec makes
  * impossible to reintroduce silently: each encoding is written as a real
  * parquet fixture, read through the same `spark.read.parquet` path the
  * production loader uses, and must canonicalize to the identical
  * TimestampType wall-clock values.
  */
class TsEncodingSpec extends AnyFunSuite {
  private lazy val spark = Session.get("ts-encoding-spec")

  // Fixed instants (UTC): 2024-03-01 12:34:56.789012 and one an hour later.
  private val micros = Seq(1709296496789012L, 1709300096789012L)
  private val expectStrings = Seq(
    "2024-03-01 12:34:56.789012", "2024-03-01 13:34:56.789012")

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"ts-enc-$tag").resolve("events.parquet").toString

  /** Read back through the production loader path and render to strings. */
  private def roundTrip(path: String): Seq[String] = {
    val dir = new java.io.File(path).getParent
    val df = Tables.df(spark, dir, "events")
    assert(df.schema("ts").dataType === TimestampType,
      s"canonicalTs must yield TimestampType, got ${df.schema("ts").dataType}")
    df.orderBy("event_id")
      .select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS"))
      .collect().map(_.getString(0)).toSeq
  }

  private def writeRows(path: String, tsType: DataType, tsVal: Long => Any): Unit = {
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", tsType)))
    val rows = micros.zipWithIndex.map { case (us, i) =>
      Row(i.toLong, tsVal(us))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
      .write.mode("overwrite").parquet(path)
  }

  test("epoch-nano long encoding (legacy NANOS read via nanosAsLong)") {
    val path = tmp("long")
    writeRows(path, LongType, us => us * 1000L)
    assert(roundTrip(path) === expectStrings)
  }

  test("TIMESTAMP_NTZ encoding (isAdjustedToUTC=false, current testdata)") {
    val path = tmp("ntz")
    writeRows(path, TimestampNTZType,
      us => java.time.LocalDateTime.ofEpochSecond(
        us / 1000000L, (us % 1000000L).toInt * 1000, java.time.ZoneOffset.UTC))
    // confirm the fixture really is NTZ on disk, not silently LTZ
    assert(spark.read.parquet(path).schema("ts").dataType === TimestampNTZType)
    assert(roundTrip(path) === expectStrings)
  }

  test("TIMESTAMP_LTZ encoding (isAdjustedToUTC=true)") {
    val path = tmp("ltz")
    writeRows(path, TimestampType,
      us => java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
        us / 1000000L, (us % 1000000L) * 1000L)))
    assert(roundTrip(path) === expectStrings)
  }

  test("an unsupported ts type fails loudly, not silently") {
    val path = tmp("bad")
    writeRows(path, StringType, us => us.toString)
    val err = intercept[RuntimeException] {
      Tables.df(spark, new java.io.File(path).getParent, "events").collect()
    }
    assert(err.getMessage.contains("unsupported"))
  }

  test("current driver testdata reads green through the canonical loader") {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val df = Tables.df(spark, sfDir, "events")
    assert(df.schema("ts").dataType === TimestampType)
    assert(df.limit(1).count() === 1L)
  }
}
