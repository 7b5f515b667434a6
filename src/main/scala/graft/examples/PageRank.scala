package graft.examples

import graft.core.Materialize.MatOps
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** PageRank with the reference's exact (quirky, documented) semantics
  * (`lib/mini_hadoop/examples/page_rank.ex:31-122`):
  *   - each adjacency row emits `(source, (1-d)/n)` — the baseline goes to
  *     SOURCES only; pure targets receive only distributed mass;
  *   - each target of a row receives `d * rank(source) / out_degree`;
  *   - a source's previous rank defaults to 1.0 when absent
  *     (page_rank.ex:56);
  *   - the new rank is the plain sum of contributions (no dangling-mass
  *     redistribution).
  *
  * The reference re-reads the whole rank file inside every map task
  * (SURVEY §4.3.5); here previous ranks are a DataFrame joined once per
  * iteration — broadcast when small, shuffle-join when not. Iteration is
  * a driver loop with `localCheckpoint` every few rounds so lineage stays
  * bounded at scale (SURVEY §7.4).
  */
object PageRank {

  /** F4 line parse: `source\ttarget1 target2 ...` → (src, targets).
    * Malformed lines are dropped, like the mapper's error branch. */
  def parseAdjacency(spark: SparkSession, lines: Dataset[String]): DataFrame = {
    lines
      .select(split(col("value"), "\t").as("parts"))
      .filter(size(col("parts")) >= 1 && length(trim(col("parts").getItem(0))) > 0)
      .select(
        trim(col("parts").getItem(0)).as("src"),
        when(size(col("parts")) > 1,
          expr("filter(split(parts[1], ' '), x -> x != '')"))
          .otherwise(array().cast("array<string>")).as("targets"))
  }

  /** One iteration: links(src, targets) × prevRanks(page, rank) → (page, rank). */
  def iterate(links: DataFrame, prevRanks: DataFrame, damping: Double,
      totalPages: Long): DataFrame = {
    val baseline = (1.0 - damping) / totalPages
    val baselines = links.select(col("src").as("page"), lit(baseline).as("contrib"))
    val contribs = links
      .filter(size(col("targets")) > 0)
      .join(prevRanks.withColumnRenamed("page", "src"), Seq("src"), "left_outer")
      .withColumn("rank", coalesce(col("rank"), lit(1.0))) // default rank, page_rank.ex:56
      .select(explode(col("targets")).as("page"),
        (lit(damping) * col("rank") / size(col("targets"))).as("contrib"))
    baselines.union(contribs)
      .groupBy("page")
      .agg(sum("contrib").as("rank"))
  }

  private def emptyRanks(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("page",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("rank",
          org.apache.spark.sql.types.DoubleType))))

  /** Driver-loop iteration (replaces the reference's manual job-per-
    * iteration runbook, `lib/mini_hadoop.ex:34-73`). */
  def run(spark: SparkSession, links: DataFrame, iterations: Int,
      damping: Double = 0.85, totalPages: Long): DataFrame = {
    var ranks = emptyRanks(spark)
    for (i <- 1 to iterations) {
      ranks = iterate(links, ranks, damping, totalPages)
      if (i % 5 == 0) ranks = ranks.materialize // bound lineage growth
    }
    ranks
  }

  /** Result of [[runUntil]]: final ranks, iterations executed, and the
    * last max-|Δrank| observed (Double.MaxValue if only one iteration ran). */
  final case class Converged(ranks: DataFrame, iterations: Int, maxDelta: Double)

  /** Convergence-driven iteration: stop when max |rank − prev_rank| < eps
    * or after `maxIterations`. This is the reference's runbook loop
    * (`README.md:843-854` — run a job per iteration, diff successive rank
    * files by hand) made a first-class API. Every iteration is
    * localCheckpoint-ed because its result is consumed twice (next
    * iteration + delta check) and lineage must stay bounded; the delta is
    * one full-outer join + max-agg over the rank table — O(pages), the
    * same cost class as the iteration itself. */
  def runUntil(spark: SparkSession, links: DataFrame, eps: Double,
      maxIterations: Int = 50, damping: Double = 0.85,
      totalPages: Long): Converged = {
    var ranks = emptyRanks(spark)
    var i = 0
    var delta = Double.MaxValue
    while (i < maxIterations && delta >= eps) {
      val next = iterate(links, ranks, damping, totalPages).materialize
      if (i > 0) {
        delta = next
          .join(ranks.withColumnRenamed("rank", "prev_rank"), Seq("page"), "full_outer")
          .agg(max(abs(coalesce(col("rank"), lit(0.0)) -
            coalesce(col("prev_rank"), lit(0.0)))).as("d"))
          .head.getDouble(0)
      }
      ranks = next
      i += 1
    }
    Converged(ranks, i, delta)
  }
}
