package graft

/** Ad-hoc perf probe: time one query N times. Not part of the contract. */
object QDebug {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else "q01_pricing_summary"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Session.get("graft-qdebug")
    val q = Queries.byName(name)
    for (i <- 1 to 4) {
      val t0 = System.nanoTime()
      q.build(spark, sfDir).write.mode("overwrite").format("noop").save()
      println(f"[$name] iter $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    q.build(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
