package graft.tools

import graft.{Queries, Session}

/** Time a SEQUENCE of catalog queries once each in ONE session — the
  * measurement shape for families that share a written-once artifact
  * (d06/g01/g04/g05 over `DedupOps.sharedAdjacency`): the first query
  * pays the shared build, the rest ride it, exactly like a real
  * pipeline session. Cold-JVM per-query timing double-counts the
  * shared build once per family member and says nothing about how the
  * family scales.
  *
  * Usage: `tools/run.sh graft.tools.FamilyTime <sfDir> <name> [<name>...]`
  */
object FamilyTime {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: FamilyTime <sfDir> <name> [<name>...]")
    val dir = args(0)
    val qs = args.drop(1).toSeq.map(n => Queries.byName.getOrElse(n,
      sys.error(s"unknown query '$n'")))
    val spark = Session.get("graft-familytime")
    spark.sparkContext.setLogLevel("WARN")
    val t00 = System.nanoTime()
    qs.foreach { q =>
      val t0 = System.nanoTime()
      q.build(spark, dir).write.mode("overwrite").format("noop").save()
      println(f"[family] ${q.name}: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    println(f"[family] TOTAL: ${(System.nanoTime() - t00) / 1e9}%.2f s")
    spark.stop()
  }
}
