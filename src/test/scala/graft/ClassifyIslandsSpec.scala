package graft

import org.scalatest.funsuite.AnyFunSuite

/** Constructed-data and invariant pins for the round-8 third batch:
  * gaps-and-islands (e16), the linear quality classifier (t23), kNN label
  * classification (s11), and the co-moment regression aggregates (q44).
  */
class ClassifyIslandsSpec extends AnyFunSuite {

  lazy val spark = Session.builder("graft-test").master("local[4]")
    .config("spark.sql.shuffle.partitions", "4").getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private val base = 1704067200L * 1000000000L // 2024-01-01T00:00:00Z nanos
  private def dayNs(d: Int, h: Int = 12): Long =
    base + (d.toLong * 24 + h) * 3600L * 1000000000L

  private def eventsDir(rows: Seq[(Long, Long, Long, String, Double, String)]): String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-e16").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$d/events.parquet")
    d
  }

  private def docsDir(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-t23").toString
    rows.map { case (id, text) => (id, text, "en", "src0", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    d
  }

  // ------------------------------------------------------------- e16
  test("e16 islands are maximal runs: 1-3, 5, 7-8 with multi-event days collapsed") {
    val dir = eventsDir(Seq(
      (1L, dayNs(1, 1), 42L, "view", 1.0, "{}"),
      (2L, dayNs(1, 23), 42L, "click", 1.0, "{}"), // same day twice
      (3L, dayNs(2), 42L, "view", 1.0, "{}"),
      (4L, dayNs(3), 42L, "view", 1.0, "{}"),
      (5L, dayNs(5), 42L, "view", 1.0, "{}"),
      (6L, dayNs(7), 42L, "view", 1.0, "{}"),
      (7L, dayNs(8), 42L, "view", 1.0, "{}"),
      (8L, dayNs(2), 7L, "view", 1.0, "{}"))) // second user, single day
    val out = Queries.byName("e16_activity_islands").build(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(out.toSeq === Seq(
      (7L, "2024-01-03", "2024-01-03", 1L),
      (42L, "2024-01-02", "2024-01-04", 3L),
      (42L, "2024-01-06", "2024-01-06", 1L),
      (42L, "2024-01-08", "2024-01-09", 2L)))
  }

  test("e16 island lengths sum to the distinct active-day count (real data)") {
    import org.apache.spark.sql.functions._
    val islands = Queries.byName("e16_activity_islands").build(spark, sf)
    val totalLen = islands.agg(sum("len")).collect()(0).getLong(0)
    val activeDays = Tables.df(spark, sf, "events")
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct().count()
    assert(totalLen === activeDays)
  }

  // ------------------------------------------------------------- t23
  test("t23 scores: bias-only doc < 0.5, positive tokens push above, monotone in evidence") {
    val dir = docsDir(Seq(
      (1L, "zzz yyy xxx"),                 // nothing in vocabulary → sigmoid(-0.2)
      (2L, "spark query data join"),       // strongly positive
      (3L, "spark query data join spark"), // same + one more positive token
      (4L, "slow noise small slow")))      // strongly negative
    val out = Queries.byName("t23_quality_classifier").build(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
    assert(math.abs(out(1L)._1 - 1.0 / (1.0 + math.exp(0.2))) < 1e-6)
    assert(!out(1L)._2 && out(2L)._2 && !out(4L)._2)
    assert(out(3L)._1 > out(2L)._1, "one more positive occurrence must raise the score")
    assert(out(4L)._1 < out(1L)._1)
  }

  // ------------------------------------------------------------- s11
  test("s11 kNN vote recovers labels exactly on a 3-cluster synthetic fixture") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 60 vectors in 3 tight clusters around orthogonal axes; label = cluster.
    // Any sane kNN must classify all 20 probes with a 10/10 vote.
    val rnd = new scala.util.Random(42)
    val rows = (0 until 60).map { id =>
      val c = id % 3
      val v = Array.tabulate(8)(i =>
        (if (i == c) 10f else 0f) + rnd.nextFloat() * 0.1f)
      (id.toLong, v.toSeq, c)
    }
    val d = java.nio.file.Files.createTempDirectory("graft-s11").toString
    rows.toDF("vec_id", "embedding", "label")
      .withColumn("label", col("label").cast("int"))
      .coalesce(1).write.parquet(s"$d/embeddings.parquet")
    val pred = Queries.byName("s11_knn_classify").build(spark, d)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(pred.length === 20)
    pred.foreach { case (qid, label, votes) =>
      assert(label === (qid % 3).toInt, s"probe $qid misclassified")
      assert(votes === 10L, s"probe $qid vote not unanimous: $votes")
    }
  }

  // ------------------------------------------------------------- e21
  test("e21 EWMA fold equals a driver-side replay of the recurrence") {
    import org.apache.spark.sql.functions._
    val got = Queries.byName("e21_hourly_ewma").build(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val hourly = Tables.df(spark, sf, "events")
      .groupBy(col("event_type"),
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm").as("h"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val want = hourly.groupBy(_._1).toSeq.flatMap { case (et, rows) =>
      var s = Double.NaN
      rows.sortBy(_._2).toSeq.map { case (_, h, n) =>
        s = if (s.isNaN) n.toDouble else 0.3d * n + 0.7d * s
        (et, h) -> BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    }.toMap
    assert(got === want)
  }

  // ------------------------------------------------------------- q44
  test("q44 co-moment identities: r2 = corr^2 and intercept = avg(y) - slope*avg(x)") {
    import org.apache.spark.sql.functions._
    val li = Tables.df(spark, sf, "lineitem")
    val raw = li.groupBy("l_returnflag").agg(
      corr("l_quantity", "l_extendedprice").as("c"),
      regr_slope(col("l_extendedprice"), col("l_quantity")).as("m"),
      regr_intercept(col("l_extendedprice"), col("l_quantity")).as("b"),
      regr_r2(col("l_extendedprice"), col("l_quantity")).as("r2"),
      avg("l_quantity").as("ax"), avg("l_extendedprice").as("ay"))
    raw.collect().foreach { r =>
      val (c, m, b, r2, ax, ay) = (r.getDouble(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6))
      assert(math.abs(r2 - c * c) < 1e-9)
      assert(math.abs(b - (ay - m * ax)) < 1e-6 * math.abs(ay).max(1.0))
    }
  }
}
