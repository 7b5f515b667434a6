package graft

/** Ad-hoc timer for individual catalog queries:
  * `tools/run.sh graft.BenchOne q1 q2 ...` runs the named queries against
  * `SPARK_GRAFT_SF_DIR` (default sf0.1) through the noop sink — one warm-up
  * each, then 3 interleaved timed rounds (same anti-stall discipline as
  * [[Bench]]) — and prints per-query samples + min. Not part of the driver
  * contract; a developer loop for plan work between full Bench runs.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: BenchOne <query-name> [<query-name> ...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Session.get("graft-bench-one")
    val qs = args.toSeq.map {
      // the fixed-size kernel drift probe rides along as a pseudo-query
      // (same interleaved discipline; ignores sfDir by construction)
      case "canary_kernel" =>
        Q("canary_kernel", (s, _) => tools.KernelCanary.build(s), None)
      case n => Queries.byName.getOrElse(n,
        throw new NoSuchElementException(
          s"no catalog query '$n'; known: canary_kernel, " +
            Queries.all.map(_.name).sorted.mkString(", ")))
    }

    def runOnce(q: Q): Double = {
      val t0 = System.nanoTime()
      q.build(spark, sfDir).write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }

    // two-canary bracket (same discipline as TimeQuery): probes in the
    // tool's own output; SPARK_GRAFT_BRACKET=0 opts out. Skipped when the
    // invocation IS a canary probe (q01/canary_kernel only) — bracketing
    // a probe with itself measures nothing.
    val probeNames = Set("q01_pricing_summary", "canary_kernel")
    val bracket = tools.CanaryBracket.enabled &&
      !qs.forall(q => probeNames(q.name))
    val pre = if (bracket) Some(tools.CanaryBracket.probe(spark, 3)) else None
    pre.foreach(p => println(f"[bracket] pre q01=${tools.CanaryBracket.fmtQ01(p)} kernel=${p.kernel}%.3f"))
    qs.foreach(runOnce) // warm-up
    val timings = collection.mutable.Map[String, List[Double]]().withDefaultValue(Nil)
    for (_ <- 1 to 3; q <- qs) timings(q.name) ::= runOnce(q)
    qs.foreach { q =>
      val runs = timings(q.name).reverse
      println(f"${q.name}: min=${runs.min}%.3f s  samples=[${runs.map(t => f"$t%.3f").mkString(", ")}]  sf=$sfDir")
    }
    pre.foreach { p =>
      val post = tools.CanaryBracket.probe(spark, 2)
      println(f"[bracket] post q01=${tools.CanaryBracket.fmtQ01(post)} kernel=${post.kernel}%.3f")
      println(s"""{"metric":"canary_bracket","queries":"${qs.map(_.name).mkString(",")}",""" +
        tools.CanaryBracket.json(p, post) + "}")
    }
    spark.stop()
  }
}
