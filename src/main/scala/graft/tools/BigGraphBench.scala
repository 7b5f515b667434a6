package graft.tools

import graft.core.Materialize.MatOps
import graft.Session
import graft.examples.PageRank
import org.apache.spark.sql.functions._

/** PageRank at the scale of the reference's stripped large fixture
  * (`/root/reference/.MISSING_LARGE_BLOBS:1` names a 227,323-node /
  * 1M-edge adjacency that is referenced by the repo but not shipped).
  * The blob itself is unavailable, so this generates a deterministic
  * hash-derived graph of the same shape — 227,323 nodes, out-degrees
  * 1..7 (avg ≈ 4.4, ≈1M edges, same density as the missing file) —
  * entirely in expression space (no driver-side materialization), and
  * runs the convergence-driven [[PageRank.runUntil]] loop on it.
  *
  * Prints one JSON line with edges, iterations, total seconds and
  * sec/iteration for the BASELINE.md ledger.
  *
  * Usage: runMain graft.tools.BigGraphBench [nodes] [eps] [maxIter] */
object BigGraphBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 227323L
    val eps = if (args.length > 1) args(1).toDouble else 1e-7
    val maxIter = if (args.length > 2) args(2).toInt else 20
    val spark = Session.get("graft-biggraph")

    val links = spark.range(n).select(
      concat(lit("n"), col("id")).as("src"),
      expr(s"""transform(sequence(1, 1 + cast(pmod(xxhash64(id), 7) as int)),
              |  j -> concat('n', pmod(xxhash64(id * 31 + j), ${n}L)))"""
        .stripMargin).as("targets"))
      .materialize // the loop's stable input, materialized once
    val edges = links.select(sum(size(col("targets")))).head.getLong(0)

    val t0 = System.nanoTime()
    val res = PageRank.runUntil(spark, links, eps = eps,
      maxIterations = maxIter, totalPages = n)
    val cnt = res.ranks.count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"""{"metric":"biggraph_pagerank","nodes":$n,"edges":$edges,"ranked_pages":$cnt,"iterations":${res.iterations},"max_delta":${res.maxDelta}%.3e,"total_sec":$sec%.2f,"sec_per_iter":${sec / res.iterations}%.2f}""")
    spark.stop()
  }
}
