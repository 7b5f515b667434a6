package graft

import graft.core.SortOpt
import graft.examples.{PageRank, WordCount}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Reference-workload analogs for the BASELINE.md ledger:
  *   1. WordCount end-to-end (read → tokenize → count → sort desc →
  *      JSON + TSV sinks) over a generated random-text corpus shaped like
  *      the reference's file_gen.py output (50–120-char lines, small
  *      common vocabulary) — corpus size via SPARK_GRAFT_WC_MB (default 256);
  *   2. PageRank, 2 iterations, over the reference's shipped
  *      41,332-node / 100k-edge adjacency TSV, with an assertion that
  *      no-inlink sources carry the golden baseline (1-d)/n from
  *      `shared/page_rank_iter_1.json`.
  *
  * Prints one JSON line like Bench.
  */
object RefBench {
  def main(args: Array[String]): Unit = {
    val spark = Session.get("graft-refbench")
    import spark.implicits._

    // --- corpus generation (driver-side, one-time, excluded from timing)
    val mb = sys.env.getOrElse("SPARK_GRAFT_WC_MB", "256").toInt
    val corpusDir = s"/tmp/graft_wc_corpus_$mb"
    if (!Files.exists(Paths.get(corpusDir))) {
      val vocab = Array("the", "quick", "brown", "fox", "data", "spark",
        "shuffle", "partition", "join", "filter", "scan", "merge", "sort",
        "hash", "aggregate", "window", "stream", "batch", "row", "column",
        "don't", "well-known", "x2", "alpha", "beta", "gamma", "delta")
      val rnd = new scala.util.Random(42)
      val sb = new StringBuilder(1 << 20)
      Files.createDirectories(Paths.get(corpusDir))
      var fileIdx = 0
      var bytes = 0L
      val target = mb.toLong * 1024 * 1024
      val w = new java.io.BufferedWriter(
        new java.io.FileWriter(s"$corpusDir/part-0.txt"))
      try {
        while (bytes < target) {
          sb.clear()
          while (sb.length < 50 + rnd.nextInt(70))
            sb.append(vocab(rnd.nextInt(vocab.length))).append(' ')
          sb.append('\n')
          w.write(sb.toString)
          bytes += sb.length
        }
      } finally w.close()
      fileIdx += 1
    }

    // --- 1. WordCount end-to-end (incl. both sinks)
    val outDir = Files.createTempDirectory("graft_refbench").toString
    val t0 = System.nanoTime()
    val res = core.MiniJob.run(spark, WordCount.spec(Some(SortOpt.Default)),
      Seq(corpusDir), outDir)
    val wcSec = (System.nanoTime() - t0) / 1e9
    require(res.entries > 0)

    // --- 2. PageRank, 2 iterations, reference graph
    val adjPath = "/root/reference/test_file/adjacency_41332_nodes_100000_edges.tsv"
    val n = 41332L // total_pages per the reference runbook (lib/mini_hadoop.ex:42-47)
    val t1 = System.nanoTime()
    val links = PageRank.parseAdjacency(spark, spark.read.textFile(adjPath))
    val ranks = PageRank.run(spark, links, iterations = 2,
      damping = 0.85, totalPages = n)
    val cnt = ranks.count()
    val prSec = (System.nanoTime() - t1) / 1e9

    // golden sanity: no-inlink sources carry exactly baseline = (1-d)/n
    // (the invariant behind the reference's shipped page_rank_iter_1.json;
    // pure targets may sit below it — they get no baseline by design)
    val baseline = (1 - 0.85) / n
    val atBaseline = ranks.filter(col("rank") === baseline).count()
    require(atBaseline > 0,
      s"no node at the golden baseline $baseline — semantics drifted")

    println(f"""{"metric":"refbench","wordcount_${mb}mb_sec":$wcSec%.2f,"pagerank_2iter_sec":$prSec%.2f,"pagerank_nodes":$cnt}""")
    spark.stop()
  }
}
