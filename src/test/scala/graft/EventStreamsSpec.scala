package graft

import graft.streaming.EventStreams
import graft.streaming.EventStreams.Event
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Streaming semantics: windowed counts under watermark must equal the
  * batch groupBy on the same data; the stateful sessionizer must close
  * sessions across micro-batches. */
class EventStreamsSpec extends AnyFunSuite {

  lazy val spark = Session.builder("graft-test").master("local[4]")
    .config("spark.sql.shuffle.partitions", "4").getOrCreate()

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  test("streaming windowed counts match the batch equivalent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(
      Event(1, ts(5), 1, "click", 1.0),
      Event(2, ts(20), 1, "click", 2.0),
      Event(3, ts(70), 2, "view", 3.0),
      Event(4, ts(130), 2, "click", 4.0))

    val stream = MemoryStream[Event]
    stream.addData(events: _*)
    val q = EventStreams.windowedCounts(stream.toDF(), "1 hour", "2 hours")
      .writeStream.outputMode("complete").format("memory")
      .queryName("win_counts").start()
    q.processAllAvailable(); q.stop()

    val got = spark.table("win_counts")
      .select("win_start", "event_type", "n", "total_value")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val want = events.toDF()
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
      .select(col("window.start"), col("event_type"), col("n"), col("total_value"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got == want)
    assert(got.size == 3) // hours 0, 1, 2
  }

  test("streaming daily distinct actives equal the batch dedup count") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def dayTs(day: Int, minute: Int): Timestamp =
      Timestamp.valueOf(f"2024-01-$day%02d ${minute / 60}%02d:${minute % 60}%02d:00")
    val events = Seq(
      Event(1, dayTs(1, 10), 1, "click", 1.0),
      Event(2, dayTs(1, 50), 1, "view", 1.0), // same user+day → 1 presence
      Event(3, dayTs(1, 70), 2, "click", 1.0),
      Event(4, dayTs(2, 10), 1, "click", 1.0), // new day → counts again
      Event(5, dayTs(2, 20), 3, "click", 1.0))

    val stream = MemoryStream[Event]
    stream.addData(events: _*)
    val q = EventStreams.dailyDistinctActives(stream.toDF(), "1 day")
      .writeStream.outputMode("append").format("memory")
      .queryName("daily_actives").start()
    q.processAllAvailable()
    // append mode flushes a window only once the watermark passes it:
    // a far-future sentinel closes days 1 and 2
    stream.addData(Event(99, dayTs(30, 0), 9, "click", 1.0))
    q.processAllAvailable(); q.stop()

    val got = spark.table("daily_actives")
      .collect().map(r => (r.getTimestamp(0), r.getLong(1))).toSet
    val want = events.toDF()
      .select(window(col("ts"), "1 day").as("w"), col("user_id")).distinct()
      .groupBy("w").agg(count(lit(1)).as("n"))
      .select(col("w.start"), col("n"))
      .collect().map(r => (r.getTimestamp(0), r.getLong(1))).toSet
    assert(got == want) // {day1 → 2, day2 → 2}; sentinel day never flushed
    assert(got.map(_._2) == Set(2L))
  }

  test("streaming HLL distinct sketch equals the batch sketch across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def dayTs(day: Int, minute: Int): Timestamp =
      Timestamp.valueOf(f"2024-01-$day%02d ${minute / 60}%02d:${minute % 60}%02d:00")
    // 60 users split across two micro-batches, some on both days
    val batch1 = (1 to 40).map(u => Event(u, dayTs(1, u), u, "click", 1.0))
    val batch2 = (20 to 60).map(u => Event(100 + u, dayTs(1, 400 + u), u, "view", 1.0)) ++
      (1 to 10).map(u => Event(200 + u, dayTs(2, u), u, "click", 1.0))

    val stream = MemoryStream[Event]
    val q = EventStreams.dailyDistinctSketch(stream.toDF(), "1 day")
      .writeStream.outputMode("append").format("memory")
      .queryName("daily_sketch").start()
    stream.addData(batch1: _*)
    q.processAllAvailable()
    stream.addData(batch2: _*)
    q.processAllAvailable()
    stream.addData(Event(999, dayTs(30, 0), 999, "click", 1.0)) // flush watermark
    q.processAllAvailable(); q.stop()

    val got = spark.table("daily_sketch")
      .collect().map(r => (r.getTimestamp(0), r.getLong(1))).toMap
    // union-by-register-max ⇒ the micro-batch split cannot change the
    // estimate: it must equal a batch sketch over the same rows exactly
    val want = (batch1 ++ batch2).toDF()
      .groupBy(window(col("ts"), "1 day").as("w"))
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id, 12))").as("n"))
      .select(col("w.start"), col("n"))
      .collect().map(r => (r.getTimestamp(0), r.getLong(1))).toMap
    assert(got == want.filter(_._1.toString.startsWith("2024-01-0")))
    // and at this cardinality the sketch is still in exact mode
    assert(got(Timestamp.valueOf("2024-01-01 00:00:00")) === 60L)
    assert(got(Timestamp.valueOf("2024-01-02 00:00:00")) === 10L)
  }

  test("streaming MG heavy-hitter candidates keep the guarantee across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def dayTs(day: Int, minute: Int): Timestamp =
      Timestamp.valueOf(f"2024-01-$day%02d ${minute / 60}%02d:${minute % 60}%02d:00")
    // Day 1: "click" (60) and "view" (30) are heavy among 6 types (n=102,
    // threshold with k=3 is 25.5); the tail types force MG decrements and
    // the micro-batch split exercises the merge recut.
    val day1 = (1 to 60).map(i => Event(i, dayTs(1, i), i, "click", 1.0)) ++
      (1 to 30).map(i => Event(100 + i, dayTs(1, 200 + i), i, "view", 1.0)) ++
      Seq("a", "b", "c", "d").zipWithIndex.flatMap { case (t, j) =>
        (1 to 3).map(i => Event(200L + j * 10 + i, dayTs(1, 400 + j * 10 + i), i, t, 1.0))
      }
    val (batch1, batch2) = day1.splitAt(55)

    val stream = MemoryStream[Event]
    val q = EventStreams.dailyHeavyHitterSketch(stream.toDF(), k = 3, "1 day")
      .writeStream.outputMode("append").format("memory")
      .queryName("daily_hh").start()
    stream.addData(batch1: _*)
    q.processAllAvailable()
    stream.addData(batch2: _*)
    q.processAllAvailable()
    stream.addData(Event(999, dayTs(30, 0), 999, "click", 1.0)) // flush watermark
    q.processAllAvailable(); q.stop()

    val rows = spark.table("daily_hh")
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getSeq[String](2)))
    val d1 = rows.find(_._1 == Timestamp.valueOf("2024-01-01 00:00:00")).get
    assert(d1._2 == day1.size.toLong) // total is exact under any split
    assert(d1._3.size <= 3)
    // the guarantee: true heavy hitters (count > n/(k+1)) must survive
    assert(Set("click", "view").subsetOf(d1._3.toSet), s"candidates=${d1._3}")
  }

  test("streaming KLL quantile sketch is exact below k and equals batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def dayTs(day: Int, minute: Int): Timestamp =
      Timestamp.valueOf(f"2024-01-$day%02d ${minute / 60}%02d:${minute % 60}%02d:00")
    // 150 values (< k=200 → exact mode) split across two micro-batches
    val day1 = (1 to 150).map(i => Event(i, dayTs(1, i), i, "click", i.toDouble))
    val (batch1, batch2) = day1.splitAt(70)

    val stream = MemoryStream[Event]
    val q = EventStreams.dailyQuantileSketch(stream.toDF(), k = 200, "1 day")
      .writeStream.outputMode("append").format("memory")
      .queryName("daily_kll").start()
    stream.addData(batch1: _*)
    q.processAllAvailable()
    stream.addData(batch2: _*)
    q.processAllAvailable()
    stream.addData(Event(999, dayTs(30, 0), 999, "click", 1.0)) // flush watermark
    q.processAllAvailable(); q.stop()

    val row = spark.table("daily_kll")
      .collect().find(_.getTimestamp(0) == Timestamp.valueOf("2024-01-01 00:00:00")).get
    // below k the sketch retains everything: INCLUSIVE p50 of 1..150 = 75
    assert(row.getDouble(1) == 75.0)
    assert(row.getDouble(2) == 143.0) // ceil(0.95 * 150)
  }

  test("streaming rollup view equals a batch recompute after several commits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def dayTs(day: Int, minute: Int): Timestamp =
      Timestamp.valueOf(f"2024-01-$day%02d ${minute / 60}%02d:${minute % 60}%02d:00")
    val all = (1 to 90).map { i =>
      Event(i, dayTs(1 + i % 3, i), i % 25, if (i % 2 == 0) "click" else "view", i * 0.5)
    }
    val dir = java.nio.file.Files.createTempDirectory("rollup-stream").toString

    val stream = MemoryStream[Event]
    val q = EventStreams.rollupStream(stream.toDF(),
      s"$dir/view.parquet", s"$dir/ckpt")
    all.grouped(35).foreach { chunk =>
      stream.addData(chunk: _*)
      q.processAllAvailable()
    }
    q.stop()

    val got = spark.read.parquet(s"$dir/view.parquet")
      .select(col("event_type"), col("day"), col("cnt"), round(col("total"), 6).as("total"),
        col("lo"), col("hi"), expr("hll_sketch_estimate(sk)").as("users"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getLong(6))).toSet

    val want = all.toDF()
      .select(col("event_type"), to_date(col("ts")).as("day"), col("value"), col("user_id"))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 6).as("total"),
        min("value").as("lo"), max("value").as("hi"),
        expr("hll_sketch_estimate(hll_sketch_agg(user_id, 12))").as("users"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getLong(6))).toSet

    assert(got == want)
  }

  test("stateful sessionizer closes sessions across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val q = EventStreams.sessionize(stream.toDS(), gapMinutes = 30)
      .writeStream.outputMode("append").format("memory")
      .queryName("sessions").start()

    // batch 1: two events 10 min apart (same session)
    stream.addData(Event(1, ts(0), 7, "click", 1.0), Event(2, ts(10), 7, "click", 1.0))
    q.processAllAvailable()
    assert(spark.table("sessions").count() == 0) // still open

    // batch 2: event 60 min later → closes the first session
    stream.addData(Event(3, ts(70), 7, "click", 1.0))
    q.processAllAvailable(); q.stop()

    val sessions = spark.table("sessions").as[EventStreams.Session].collect()
    assert(sessions.length == 1)
    val s = sessions.head
    assert(s.user_id == 7 && s.n_events == 2 && s.complete)
    assert(s.end_us - s.start_us == 10L * 60 * 1000000)
  }

  test("event-time timeout closes idle sessions via watermark, no successor needed") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val withWm = stream.toDS()
      .withWatermark("ts", "0 seconds")
      .as[Event]
    val q = EventStreams.sessionizeWithTimeout(withWm, gapMinutes = 30)
      .writeStream.outputMode("append").format("memory")
      .queryName("sessions_wm").start()

    // batch 1: user 9's only events
    stream.addData(Event(1, ts(0), 9, "click", 1.0), Event(2, ts(5), 9, "view", 1.0))
    q.processAllAvailable()
    assert(spark.table("sessions_wm").count() == 0)

    // batch 2: a DIFFERENT user far in the future advances the watermark
    // past user 9's gap deadline → their session closes by timeout
    stream.addData(Event(3, ts(600), 11, "click", 1.0))
    q.processAllAvailable()
    // timeouts fire on the next trigger after the watermark advances
    stream.addData(Event(4, ts(601), 11, "view", 1.0))
    q.processAllAvailable(); q.stop()

    val closed = spark.table("sessions_wm").as[EventStreams.Session].collect()
      .filter(_.user_id == 9)
    assert(closed.length == 1)
    assert(closed.head.n_events == 2 && closed.head.complete)
  }

  test("stream-stream click-purchase join matches the batch join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(
      Event(1, ts(0), 1, "click", 1.0),
      Event(2, ts(10), 1, "purchase", 5.0), // joins click 1 (10 min before)
      Event(3, ts(50), 1, "purchase", 6.0), // nothing within 30 min
      Event(4, ts(55), 2, "click", 1.0),
      Event(5, ts(60), 2, "click", 1.0),
      Event(6, ts(70), 2, "purchase", 7.0), // joins clicks 4 and 5
      Event(7, ts(80), 3, "purchase", 8.0)) // user with no clicks

    val stream = MemoryStream[Event]
    stream.addData(events: _*)
    val q = EventStreams.clickPurchaseJoin(stream.toDF(), windowMinutes = 30)
      .writeStream.outputMode("append").format("memory")
      .queryName("cp_join").start()
    q.processAllAvailable(); q.stop()

    val got = spark.table("cp_join")
      .select("purchase_id", "click_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((2L, 1L), (6L, 4L), (6L, 5L)))

    // batch equivalence: the same join on the same static data
    val want = EventStreams.clickPurchaseJoin(events.toDF(), windowMinutes = 30)
      .select("purchase_id", "click_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
  }

  test("streaming parquet sink writes exactly the streamed rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graftstream").toString
    val stream = MemoryStream[Event]
    val q = EventStreams.writeParquetStream(
      EventStreams.windowedCounts(stream.toDF(), "1 hour", "0 seconds"),
      s"$dir/out", s"$dir/ckpt")

    stream.addData(
      Event(1, ts(5), 1, "click", 1.0),
      Event(2, ts(20), 1, "click", 2.0))
    q.processAllAvailable()
    // a much later event advances the watermark so hour-0 finalizes;
    // one more trigger after that flushes the finalized window
    stream.addData(Event(3, ts(300), 2, "view", 3.0))
    q.processAllAvailable()
    stream.addData(Event(4, ts(301), 2, "view", 3.0))
    q.processAllAvailable(); q.stop()

    val back = spark.read.parquet(s"$dir/out")
      .select("win_start", "event_type", "n", "total_value")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(back == Set((ts(0), "click", 2L, 3.0)))
  }

  test("streaming upsert folds micro-batches into the parquet snapshot") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-upsert-stream").toString
    val stream = MemoryStream[(Long, String)]
    val q = EventStreams.upsertStream(stream.toDF().toDF("k", "v"),
      "k", s"$dir/table", s"$dir/ckpt")

    // key 2 duplicated within batch 1: must collapse to ONE snapshot row,
    // not two rows that would double every later correction
    stream.addData((1L, "a"), (2L, "b"), (2L, "b"))
    q.processAllAvailable()
    stream.addData((2L, "B2"), (3L, "c")) // correction for 2, insert 3
    q.processAllAvailable(); q.stop()

    val rows = spark.read.parquet(s"$dir/table").collect()
    assert(rows.length == 3)
    val got = rows.map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "a", 2L -> "B2", 3L -> "c"))
  }

  test("a replayed batchId is skipped: additive merges cannot double-count") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-replay").toString
    val path = s"$dir/view"
    def commit(id: Long): Unit =
      EventStreams.swapSnapshot(spark, path, Some(id)) {
        case Some(v) => v.union(Seq(1L).toDF("n"))
          .agg(org.apache.spark.sql.functions.sum("n").as("n"))
        case None => Seq(1L).toDF("n")
      }
    commit(0L) // n = 1
    commit(0L) // foreachBatch re-delivery after a torn checkpoint: skip
    commit(1L) // n = 2
    commit(1L) // replay again: skip
    val n = spark.read.parquet(path).head().getLong(0)
    assert(n == 2L, s"replays must not fold in twice, got n=$n")
  }

  test("a batchId below the committed marker fails loudly (checkpoint reset under a kept view)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-reset").toString
    val path = s"$dir/view"
    def commit(id: Long): Unit =
      EventStreams.swapSnapshot(spark, path, Some(id)) {
        case Some(v) => v
        case None => Seq(1L).toDF("n")
      }
    commit(5L)
    // wiping the checkpoint restarts batch ids at 0 while the view
    // parquet persists — silently skipping would drop every early
    // batch, so the anomaly must be a named failure
    val e = intercept[IllegalArgumentException] { commit(3L) }
    assert(e.getMessage.contains("reset"), e.getMessage)
    commit(5L) // a replay of the marker itself stays a silent skip
    assert(spark.read.parquet(path).head().getLong(0) == 1L)
  }

  test("snapshot commit recovers a crash between delete and rename") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-crash-recover").toString
    // simulate the torn state swapSnapshot can crash into: the previous
    // run wrote the complete merged snapshot to .staging, deleted the
    // target, and died before the rename — staging exists, target does not
    Seq((10L, "survivor")).toDF("k", "v")
      .write.parquet(s"$dir/table.staging")

    val stream = MemoryStream[(Long, String)]
    val q = EventStreams.upsertStream(stream.toDF().toDF("k", "v"),
      "k", s"$dir/table", s"$dir/ckpt")
    stream.addData((11L, "new"))
    q.processAllAvailable(); q.stop()

    // the orphaned staging snapshot must be adopted, not discarded: its
    // row survives alongside the new batch, and staging is gone
    val got = spark.read.parquet(s"$dir/table").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(10L -> "survivor", 11L -> "new"))
    assert(!new java.io.File(s"$dir/table.staging").exists())
  }

  test("streaming dedup suppresses same-content docs across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String, Timestamp)]
    val q = EventStreams.dedupStream(stream.toDF().toDF("doc_id", "text", "ts"))
      .writeStream.outputMode("append").format("memory")
      .queryName("dedup_stream").start()

    // batch 1: doc 2 repeats doc 1's content in the same batch
    stream.addData((1L, "aaa", ts(0)), (2L, "aaa", ts(5)), (3L, "bbb", ts(6)))
    q.processAllAvailable()
    // batch 2: doc 4 repeats "aaa" within the 1h watermark → suppressed;
    // doc 5 is new content → emitted
    stream.addData((4L, "aaa", ts(10)), (5L, "ccc", ts(12)))
    q.processAllAvailable(); q.stop()

    val got = spark.table("dedup_stream").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 3L, 5L))
  }

  test("streaming session_window equals the batch formulation on the same events") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // user 1: one 3-event session then a separate late-day session;
    // user 2: a single event. A final far-future event advances the
    // watermark so every earlier session closes and emits.
    val events = Seq(
      Event(1, ts(0), 1, "click", 1.0),
      Event(2, ts(10), 1, "click", 1.0),
      Event(3, ts(25), 1, "view", 1.0),
      Event(4, ts(120), 1, "click", 1.0),
      Event(5, ts(40), 2, "view", 1.0),
      Event(6, ts(24 * 60), 9, "tick", 0.0))
    val stream = MemoryStream[Event]
    stream.addData(events: _*)
    val q = EventStreams.sessionWindowCounts(stream.toDF())
      .writeStream.outputMode("append").format("memory")
      .queryName("sess_win").start()
    q.processAllAvailable()
    stream.addData(Event(7, ts(72 * 60), 9, "tick", 0.0)) // watermark push
    q.processAllAvailable(); q.stop()

    val got = spark.table("sess_win")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(3))).toSet
    val batch = EventStreams.sessionWindowCounts(events.toDF())
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(3))).toSet
    // every batch session whose end precedes the final watermark must
    // have been emitted by the stream identically
    val horizon = ts(72 * 60 - 2 * 60).getTime
    val closed = batch.filter(_._2.getTime < horizon)
    assert(closed.subsetOf(got))
    assert(got.exists { case (u, _, n) => u == 1L && n == 3L })
    assert(got.exists { case (u, _, n) => u == 1L && n == 1L })
    assert(got.exists { case (u, _, n) => u == 2L && n == 1L })
  }

  test("stream-static enrichment joins each event to its broadcast dim row") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "pro"), (2L, "free")).toDF("user_id", "tier")
    val stream = MemoryStream[Event]
    stream.addData(
      Event(1, ts(0), 1, "click", 1.0),
      Event(2, ts(1), 2, "click", 1.0),
      Event(3, ts(2), 9, "click", 1.0)) // user 9 has no dim row
    val q = EventStreams.enrichWithDim(stream.toDF(), dim, joinType = "left_outer")
      .select("event_id", "tier")
      .writeStream.outputMode("append").format("memory")
      .queryName("enriched").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("enriched")
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got == Map(1L -> Some("pro"), 2L -> Some("free"), 3L -> None))
  }

  test("streaming funnel hits across micro-batches equal the batch e14 fold") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(11)
    val types = Vector("signup", "view", "click", "purchase", "error")
    // second-granularity over 3 days → window misses AND completions
    val events = (1 to 600).map { i =>
      val sec = rnd.nextInt(3 * 86400)
      Event(i.toLong, new Timestamp(1704067200000L + sec * 1000L),
        1L + rnd.nextInt(25), types(rnd.nextInt(types.length)), 0.0)
    }.sortBy(e => (e.ts.getTime, e.event_id)) // in order ACROSS batches

    val stream = MemoryStream[Event]
    val q = EventStreams.funnelStream(stream.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("funnel_hits").start()
    events.grouped(200).foreach { batch =>
      stream.addData(batch: _*)
      q.processAllAvailable()
    }
    q.stop()

    val got = spark.table("funnel_hits")
      .groupBy("step_idx").agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap

    // batch e14 over the same rows written as a parquet events table
    val d = java.nio.file.Files.createTempDirectory("graft-fstream").toString
    events.toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", lit("{}"))
      .coalesce(1).write.parquet(s"$d/events.parquet")
    val want = Queries.byName("e14_strict_funnel").build(spark, d)
      .collect().map(r => r.getInt(0) -> r.getLong(2))
      .filter(_._2 > 0).toMap
    assert(got == want, s"stream $got vs batch $want")
    assert(got(1) > got.getOrElse(4, 0L), "fixture must discriminate")
  }

  test("rate-micro-batch source drives a bucketed aggregation, one deterministic batch") {
    // Spark's built-in synthetic load source — the streaming smoke/bench
    // harness shape. rate-micro-batch emits exactly rowsPerBatch rows per
    // micro-batch (deterministic, unlike wall-clock `rate`), and Once
    // bounds the run to batch 0 — no sleeps, no flake.
    val q = spark.readStream.format("rate-micro-batch")
      .option("rowsPerBatch", 64)
      .load() // (timestamp, value) schema
      .withColumn("bucket", pmod(col("value"), lit(8L)))
      .groupBy("bucket").count()
      .writeStream.outputMode("complete").format("memory")
      .queryName("rate_demo")
      .trigger(org.apache.spark.sql.streaming.Trigger.Once())
      .start()
    q.awaitTermination(120000)
    val got = spark.table("rate_demo")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet == (0L to 7L).toSet)
    assert(got.values.forall(_ == 8L)) // 64 values round-robin 8 buckets
  }
}
