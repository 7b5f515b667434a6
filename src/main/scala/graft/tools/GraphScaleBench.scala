package graft.tools

import graft.core.Materialize.MatOps
import graft.Session
import graft.operators.GraphOps
import org.apache.spark.sql.functions._

/** Decade-scale evidence for the graph family on a graph whose EDGE
  * count grows LINEARLY in the node count — unlike the 0.7-threshold
  * ScaleUp pair graph, whose cross-replica twins make the edge volume
  * quadratic in replicas by fixture construction (BASELINE.md r8/r9:
  * g04/g05 sf10 excluded for exactly that reason). Here the fixture
  * cannot confound the operator: degrees are bounded (1..15, avg ≈ 8),
  * so time-per-edge across two runs a decade apart isolates the
  * operator's own scaling.
  *
  * The graph is deterministic and generated in expression space
  * (`spark.range` + hash arithmetic — no driver materialization, no
  * rand()): node i emits 1 + (xxhash64(i) mod 15) edges to hash-derived
  * targets, self-loops dropped, exact-duplicate edges deduped at
  * generation (one edge-linear shuffle, charged to setup, not to the
  * measured operators).
  *
  * Runs [[GraphOps.labelPropagation]] (2 rounds, the g04 shape) and
  * [[GraphOps.kCorePeel]] (k=3, 3 rounds, the g05 shape) and prints one
  * JSON ledger line per operator.
  *
  * Usage: tools/run.sh graft.tools.GraphScaleBench <nodes> [lpa|kcore|both]
  */
object GraphScaleBench {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: GraphScaleBench <nodes> [lpa|kcore|both]")
    val n = args(0).toLong
    val which = if (args.length > 1) args(1) else "both"
    val spark = Session.get("graft-graphscale")
    spark.sparkContext.setLogLevel("WARN")

    val edges = spark.range(n)
      .select(col("id").as("src"),
        explode(expr(
          s"transform(sequence(1, 1 + cast(pmod(xxhash64(id), 15) as int)), " +
            s"j -> pmod(xxhash64(id * 131 + j * 7919), ${n}L))")).as("dst"))
      .filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
      .select(col("a").as("doc_a"), col("b").as("doc_b"))
      .materialize
    val m = edges.count()

    def timed(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = body
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"metric":"graphscale_$name","nodes":$n,"edges":$m,"rows":$rows,"total_sec":$sec%.2f,"ns_per_edge":${sec * 1e9 / m}%.1f}""")
    }

    if (which == "lpa" || which == "both")
      timed("lpa2")(GraphOps.labelPropagation(edges, iterations = 2).count())
    if (which == "kcore" || which == "both")
      timed("kcore3")(GraphOps.kCorePeel(edges, k = 3, rounds = 3).count())
    spark.stop()
  }
}
