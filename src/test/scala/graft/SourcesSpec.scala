package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Source-format coverage: the engine ingests CSV, JSON-lines, and raw
  * text with schema enforcement, losslessly round-tripping the graft
  * tables. The reference's only on-disk format is line-oriented text on
  * its DFS (store_file/retrieve_file, SURVEY §2.1); Spark's
  * DataFrameReader subsumes it — these tests pin that the schema'd
  * read-back is exact, not approximately parsed. */
class SourcesSpec extends AnyFunSuite {

  lazy val spark = Session.builder("graft-test").master("local[4]")
    .config("spark.sql.shuffle.partitions", "4").getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("supplier round-trips through CSV with schema enforcement") {
    val dir = Files.createTempDirectory("graft-csv").toString
    val src = Tables.df(spark, sf, "supplier")
    src.write.mode("overwrite").option("header", "true").csv(s"$dir/supplier")
    val back = spark.read.option("header", "true").schema(src.schema)
      .csv(s"$dir/supplier")
    assert(back.schema == src.schema)
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
  }

  test("events round-trip through JSON lines, timestamps included") {
    val dir = Files.createTempDirectory("graft-json").toString
    val src = Tables.df(spark, sf, "events")
    // default JSON timestampFormat carries millis only; pin micros
    val fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
    src.write.mode("overwrite").option("timestampFormat", fmt).json(s"$dir/events")
    val back = spark.read.schema(src.schema).option("timestampFormat", fmt)
      .json(s"$dir/events")
    assert(back.count() == src.count())
    // value-exact on a deterministic sample incl. the timestamp column
    val key = col("event_id") % 97 === 0
    assert(back.filter(key).exceptAll(src.filter(key)).isEmpty)
  }

  test("lineitem round-trips through ORC, types preserved") {
    val dir = Files.createTempDirectory("graft-orc").toString
    val src = Tables.df(spark, sf, "lineitem")
    src.write.mode("overwrite").orc(s"$dir/lineitem")
    val back = spark.read.orc(s"$dir/lineitem")
    assert(back.schema == src.schema) // ORC keeps the full type fidelity
    val key = Seq("l_orderkey", "l_linenumber")
    assert(back.orderBy(key.map(col): _*).collect().toSeq ==
      src.orderBy(key.map(col): _*).collect().toSeq)
  }

  test("documents round-trip through raw text (the reference's format)") {
    val dir = Files.createTempDirectory("graft-text").toString
    val src = Tables.df(spark, sf, "documents").select("text")
    src.write.mode("overwrite").text(s"$dir/docs")
    val back = spark.read.text(s"$dir/docs").withColumnRenamed("value", "text")
    assert(back.count() == src.count())
    // same multiset of lines ⇒ same wordcount over them
    def counts(df: org.apache.spark.sql.DataFrame) =
      df.select(explode(split(col("text"), " ")).as("w"))
        .filter(col("w") =!= "").groupBy("w").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts(back) == counts(src))
  }
}
