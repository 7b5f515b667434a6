package graft

import org.scalatest.funsuite.AnyFunSuite

/** Constructed-data pins for the round-8 additions: the strict funnel's
  * greedy fold (e14), C4-style span dedup (d14), and the per-source
  * token-budget cap (t22) — boundary semantics the real-corpus oracle
  * may never exercise.
  */
class FunnelSpanBudgetSpec extends AnyFunSuite {

  lazy val spark = Session.builder("graft-test").master("local[4]")
    .config("spark.sql.shuffle.partitions", "4").getOrCreate()

  private val base = 1704067200L * 1000000000L // 2024-01-01T00:00:00Z nanos
  private def ns(sec: Long): Long = base + sec * 1000000000L

  private def eventsDir(rows: Seq[(Long, Long, Long, String, Double, String)]): String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-e14").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$d/events.parquet")
    d
  }

  private def docsDir(rows: Seq[(Long, String, String, String)]): String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-d14").toString
    rows.map { case (id, text, lang, src) => (id, text, lang, src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    d
  }

  private def funnelCounts(dir: String): Map[Int, Long] =
    Queries.byName("e14_strict_funnel").build(spark, dir)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap

  // ------------------------------------------------------------- e14
  test("e14 conversion window: exactly 24h advances, 24h+1s does not") {
    val day = 86400L
    val d = eventsDir(Seq(
      // user 1: view exactly 24h after signup → counts (<= boundary)
      (1L, ns(0), 1L, "signup", 0.0, "{}"),
      (2L, ns(day), 1L, "view", 0.0, "{}"),
      // user 2: view 24h+1s after signup → window expired at depth 1
      (3L, ns(0), 2L, "signup", 0.0, "{}"),
      (4L, ns(day + 1), 2L, "view", 0.0, "{}")))
    val got = funnelCounts(d)
    assert(got(1) == 2 && got(2) == 1 && got(3) == 0 && got(4) == 0)
  }

  test("e14 greedy binds the EARLIEST qualifying event even when a later one would go deeper") {
    val day = 86400L
    // signup@0, view@1h (greedy binds here), view@20h, click@1h+24h+1s:
    // the click is within 24h of the SECOND view but not the first —
    // greedy (product-analytics) semantics stop at depth 2.
    val d = eventsDir(Seq(
      (1L, ns(0), 1L, "signup", 0.0, "{}"),
      (2L, ns(3600), 1L, "view", 0.0, "{}"),
      (3L, ns(20 * 3600), 1L, "view", 0.0, "{}"),
      (4L, ns(3600 + day + 1), 1L, "click", 0.0, "{}")))
    val got = funnelCounts(d)
    assert(got(2) == 1 && got(3) == 0, s"greedy must not rebind: $got")
  }

  test("e14 order is strict: same-timestamp tie breaks by event_id in the fold") {
    // signup and view share a timestamp; view has the LARGER event_id so
    // it sorts after the signup and advances the funnel. The mirrored
    // user has the view id SMALLER → it sorts before the signup and is
    // consumed before depth 1 exists.
    val d = eventsDir(Seq(
      (1L, ns(0), 1L, "signup", 0.0, "{}"),
      (2L, ns(0), 1L, "view", 0.0, "{}"),
      (9L, ns(0), 2L, "signup", 0.0, "{}"),
      (3L, ns(0), 2L, "view", 0.0, "{}")))
    val got = funnelCounts(d)
    assert(got(1) == 2 && got(2) == 1)
  }

  test("e14 fold equals a driver-side greedy replay on random event streams") {
    val rnd = new scala.util.Random(42)
    val types = Vector("signup", "view", "click", "purchase", "error")
    val rows = (1 to 2000).map { i =>
      val user = 1L + rnd.nextInt(40)
      // second-granularity over 5 days → plenty of ties and window misses
      val t = ns(rnd.nextInt(5 * 86400).toLong)
      (i.toLong, t, user, types(rnd.nextInt(types.length)), 0.0, "{}")
    }
    val d = eventsDir(rows)
    // driver-side greedy replay (independent implementation)
    val steps = Vector("signup", "view", "click", "purchase")
    val wUs = 24L * 3600 * 1000000
    val depths = rows.groupBy(_._3).map { case (_, evs) =>
      val ordered = evs.filter(e => steps.contains(e._4))
        .sortBy(e => (e._2, e._1))
      var depth = 0
      var lastUs = 0L
      ordered.foreach { e =>
        val us = e._2 / 1000 // nanos → micros, matching the loader
        if (depth < 4 && e._4 == steps(depth) &&
            (depth == 0 || us - lastUs <= wUs)) {
          depth += 1; lastUs = us
        }
      }
      depth
    }.toSeq
    val want = (1 to 4).map(k => k -> depths.count(_ >= k).toLong).toMap
    assert(funnelCounts(d) == want)
    assert(want(1) > want(4), "fixture must discriminate across steps")
  }

  // ------------------------------------------------------------- d14
  test("d14 keeps a duplicated span only in its first (doc_id, span_idx) occurrence") {
    val span = "a b c d e f g h i j" // exactly one 10-word span
    val tail = "k l m n o p q r s t"
    val d = docsDir(Seq(
      (1L, s"$span $tail", "en", "s0"), // spans 0,1 — both original
      (2L, s"$tail $span", "en", "s0"), // both spans duplicated → doc 2 loses all
      (3L, span, "en", "s0"))) // duplicate of doc 1 span 0
    val got = Queries.byName("d14_span_dedup").build(spark, d)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    assert(got(1L) == ((2L, 2L, 0L, s"$span $tail")))
    assert(got(2L) == ((2L, 0L, 2L, "")))
    assert(got(3L) == ((1L, 0L, 1L, "")))
  }

  test("d14 is idempotent: a second pass over the cleaned corpus drops nothing") {
    val rnd = new scala.util.Random(7)
    val vocab = (0 until 40).map(i => s"w$i")
    val texts = (1 to 30).map { i =>
      (1 to 25).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
    }
    // inject duplicated spans by repeating whole docs
    val all = texts ++ texts.take(8)
    val d = docsDir(all.zipWithIndex.map { case (t, i) => (i.toLong, t, "en", "s0") })
    val first = Queries.byName("d14_span_dedup").build(spark, d).collect()
    assert(first.map(_.getLong(3)).sum > 0, "fixture must contain duplicate spans")
    val cleaned = first.filter(_.getString(4).nonEmpty)
      .map(r => (r.getLong(0), r.getString(4), "en", "s0"))
    val d2 = docsDir(cleaned.toSeq)
    val second = Queries.byName("d14_span_dedup").build(spark, d2).collect()
    assert(second.map(_.getLong(3)).sum == 0,
      "cleaned corpus must have no remaining duplicate spans")
  }

  // ------------------------------------------------------------- t22
  test("t22 keeps the budget-straddling document and stops after it") {
    // 4 docs of 300 tokens each, one source, budget 700:
    // cum_before = 0, 300, 600, 900 → first three kept (the third
    // straddles: 600 < 700 admits it), fourth dropped.
    val text300 = (1 to 300).map(i => "tok").mkString(" ")
    // descending n_chars order must follow doc_id here (equal lengths →
    // doc_id tiebreak), so admission order is deterministic
    val d = docsDir((1 to 4).map(i => (i.toLong, text300, "en", "s0")))
    val got = Queries.byName("t22_token_budget_cap").build(spark, d).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getLong(1) == 3L && r.getLong(2) == 1L && r.getLong(3) == 900L,
      s"got (${r.getLong(1)}, ${r.getLong(2)}, ${r.getLong(3)})")
  }
}
