package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Constructed-data pins for event operators where the real-corpus
  * oracle may never exercise the boundary. */
class EventOpsSpec extends AnyFunSuite {

  lazy val spark = Session.builder("graft-test").master("local[4]")
    .config("spark.sql.shuffle.partitions", "4").getOrCreate()

  test("e09 native session windows: an EXACT 30:00 gap still merges; 30:01 splits") {
    import spark.implicits._
    val base = 1704067200L * 1000000000L // 2024-01-01T00:00:00Z, nanos
    def ns(sec: Long): Long = base + sec * 1000000000L
    // Empirically pinned convention (this test originally asserted the
    // opposite and FAILED): session_window merges an event exactly
    // gap-after its predecessor; only a STRICTLY larger gap splits.
    val rows = Seq(
      (1L, ns(0), 1L, "click", 1.0, "{}"),
      (2L, ns(1800), 1L, "click", 1.0, "{}"), // exactly 30:00 → merges
      (3L, ns(0), 2L, "click", 1.0, "{}"),
      (4L, ns(1801), 2L, "click", 1.0, "{}")) // 30:01 → splits
    val d = java.nio.file.Files.createTempDirectory("graft-e09").toString
    // ts as INT64 nanos — the shape Tables.df("events") expects under
    // spark.sql.legacy.parquet.nanosAsLong
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$d/events.parquet")

    val got = Queries.byName("e09_session_window_native").build(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(3)))
    assert(got.count(_._1 == 1L) == 1, "exact-gap user must have 1 merged session")
    assert(got.filter(_._1 == 1L).head._2 == 2L)
    assert(got.count(_._1 == 2L) == 2, "over-gap user must have 2 sessions")

    // and the DuckDB-oracle formulation agrees on the same data
    val viaSql = Queries.byName("e02_sessionize").build(spark, d)
    assert(viaSql.collect().length == 3) // same 3 sessions
  }

  private def eventsDir(rows: Seq[(Long, Long, Long, String, Double, String)]): String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-ev").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$d/events.parquet")
    d
  }

  test("e12 attribution: first/last touch per purchase, direct when untouched") {
    val base = 1704067200L * 1000000000L
    def ns(sec: Long): Long = base + sec * 1000000000L
    val d = eventsDir(Seq(
      (1L, ns(0), 1L, "view", 0.0, "{}"),
      (2L, ns(10), 1L, "click", 0.0, "{}"),
      (3L, ns(20), 1L, "purchase", 10.0, "{}"), // view → … → click
      (4L, ns(30), 1L, "click", 0.0, "{}"),
      (5L, ns(40), 1L, "purchase", 5.0, "{}"), // first stays view
      (6L, ns(0), 2L, "purchase", 7.0, "{}"))) // no touch → direct
    val got = Queries.byName("e12_attribution").build(spark, d)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got == Set(("direct", "direct", 1L, 7.0), ("view", "click", 2L, 15.0)))
  }

  test("e13 rolling 7-day actives: windows span exactly [day-6, day]") {
    val dayNs = 86400L * 1000000000L
    val base = 1704067200L * 1000000000L // 2024-01-01
    val d = eventsDir(Seq(
      (1L, base, 1L, "click", 0.0, "{}"), // day 1: u1
      (2L, base + 2 * dayNs, 1L, "click", 0.0, "{}"), // day 3: u1
      (3L, base + 2 * dayNs, 2L, "click", 0.0, "{}"), // day 3: u2
      (4L, base + 8 * dayNs, 3L, "click", 0.0, "{}"))) // day 9: u3
    val got = Queries.byName("e13_rolling_active").build(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // day 9's window reaches back to day 3 (inclusive) → sees u1, u2, u3;
    // day 1 (from day 3's perspective) is inside [day3-6, day3] too
    assert(got == Seq(("2024-01-01", 1L), ("2024-01-03", 2L), ("2024-01-09", 3L)))
  }
}
