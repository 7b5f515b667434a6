package graft

/** Benchmark main: runs the headline query set against
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line with per-query seconds.
  *
  * Queries are materialized through the noop sink so every output column is
  * computed (a bare `.count()` would let Catalyst prune the work away) while
  * write cost stays out of the measurement.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Session.get("graft-bench")

    val headliners = Queries.all.filter(_.headline)
    val set = if (headliners.nonEmpty) headliners else Queries.all

    def runOnce(q: Q): Double = {
      val t0 = System.nanoTime()
      try q.build(spark, sfDir).write.mode("overwrite").format("noop").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
        return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    set.foreach(runOnce) // warm-up: JIT + codegen + parquet footer caches
    // Min of 3: the sandboxed filesystem shows erratic multi-second IO
    // stalls; min is the noise-robust estimator of true query cost.
    val results = set.map { q =>
      val runs = (1 to 3).map(_ => runOnce(q)).filter(_ >= 0)
      q.name -> (if (runs.isEmpty) -1.0 else runs.min)
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
