package graft

import graft.core.{JobSpec, MiniJob, Sinks, SortOpt}
import graft.examples.WordCount
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** MiniJob end-to-end: map → shuffle → reduce → sort → both sinks,
  * including byte-format checks of the JSON-object and TSV-count sinks
  * (reference formats: job_runner.ex:242-323). */
class CoreJobSpec extends AnyFunSuite {

  lazy val spark = Session.builder("graft-test").master("local[4]")
    .config("spark.sql.shuffle.partitions", "4").getOrCreate()

  test("wordcount job end-to-end with sinks") {
    import spark.implicits._
    val lines = Seq("the cat and the hat", "the cat").toDS()
    val out = Files.createTempDirectory("graftjob").toString
    val res = MiniJob.runOn(spark, WordCount.spec(Some(SortOpt.Default)), lines, out)

    assert(res.entries == 4) // the, cat, and, hat
    assert(res.sorted)

    val json = Files.readString(Paths.get(res.jsonPath))
    assert(json.startsWith("{\n"))
    assert(json.endsWith("\n}"))
    assert(json.contains("\"the\": 3"))
    assert(json.contains("\"cat\": 2"))

    val txt = Files.readString(Paths.get(res.txtPath))
    val lines2 = txt.split("\n")
    // 50-char padded, back-patched count header
    assert(lines2.head.startsWith("# sorted by default - Total: 4 entries"))
    assert(lines2.head.length == 50)
    // default sort: value desc, key asc tiebreak
    assert(lines2.drop(1).toSeq == Seq("the\t3", "and\t1", "cat\t2", "hat\t1")
      .sortBy(s => (-s.split("\t")(1).toLong, s.split("\t")(0))))
  }

  test("unsorted job writes unsorted header") {
    import spark.implicits._
    val lines = Seq("foo bar").toDS()
    val out = Files.createTempDirectory("graftjob").toString
    val res = MiniJob.runOn(spark, WordCount.spec(None), lines, out)
    val txt = Files.readString(Paths.get(res.txtPath))
    assert(txt.startsWith("# unsorted - Total: 2 entries"))
    assert(res.txtPath.endsWith("_unsorted.txt"))
  }

  test("key sorts order by key with value tiebreak") {
    import spark.implicits._
    val spec = JobSpec[String, Long]("t",
      line => line.split(" ").map(_ -> 1L),
      (k, vs) => Iterator.single(k -> vs.sum),
      Some(SortOpt.KeyDesc))
    val got = MiniJob.transform(spark, spec, Seq("b a c").toDS()).collect()
    assert(got.map(_._1).toSeq == Seq("c", "b", "a"))
  }

  test("null keys raise the invalid-result error") {
    import spark.implicits._
    val spec = JobSpec[String, Long]("bad",
      _ => Seq((null: String) -> 1L),
      (k, vs) => Iterator.single(k -> vs.sum))
    val ex = intercept[org.apache.spark.SparkException] {
      MiniJob.transform(spark, spec, Seq("x").toDS()).collect()
    }
    assert(ex.getMessage.contains("invalid_result_format") ||
      ex.getCause != null)
  }

  test("context-threading form binds contexts") {
    import spark.implicits._
    val spec = JobSpec.withContexts[String, Long, Int, Long](
      "ctx",
      (line, mult) => line.split(" ").map(_ -> mult.toLong), 5,
      (k, vs, add) => Iterator.single(k -> (vs.sum + add)), 100L)
    val got = MiniJob.transform(spark, spec, Seq("w w").toDS()).collect().toMap
    assert(got("w") == 110L) // 5 + 5 + 100
  }

  test("json sink escapes control characters and quotes") {
    val path = Files.createTempFile("sink", ".json").toString
    Sinks.writeJsonObject(path, Iterator("a\"b" -> "x\ny"))
    val s = Files.readString(Paths.get(path))
    assert(s == "{\n  \"a\\\"b\": \"x\\ny\"\n}")
  }
}
