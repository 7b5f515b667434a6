package graft.operators

import graft.Q
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics over the near-duplicate pair graph (edges =
  * oracle-verified d02/d07 pairs; nodes = documents). Together with
  * [[DedupOps.connectedComponents]] and PageRank this gives the engine a
  * distributed-graph family: iterative propagation, component labeling,
  * and motif counting.
  */
object GraphOps {

  /** Count triangles in an undirected graph given as (src, dst) edges.
    *
    * Edges are canonicalized to src < dst, so each triangle {a<b<c} is
    * counted exactly once as e(a,b) ⋈ e(b,c) ⋈ e(a,c) — the two-join
    * formulation of the classic MapReduce triangle count (Suri &
    * Vassilvitskii, WWW'11; their degree-ordering refinement bounds the
    * wedge fan-out under power-law skew and is the documented upgrade
    * path — unneeded for near-clique dedup graphs where AQE's skew
    * split covers the hot vertices). Both joins are plain equi-joins:
    * wedge generation shuffles by the middle vertex, closure by the
    * (a, c) pair. */
  def triangleCount(edges: DataFrame): DataFrame = {
    val e = edges.toDF("src", "dst")
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") < col("b")).distinct()
    val wedges = e.toDF("a", "b").alias("x")
      .join(e.toDF("b", "c").alias("y"), "b")
      .filter(col("b") < col("c"))
      .select(col("a"), col("b"), col("c"))
    wedges.join(e.toDF("a", "c"), Seq("a", "c"))
      .agg(count(lit(1)).as("n_triangles"))
  }

  // ---------------------------------------------------------------- g01
  /** Triangle count of the ≥0.9-Jaccard near-dup graph — a structure
    * probe for dedup clusters (near-cliques are triangle-dense; chains
    * of borderline pairs are not). Oracle: DuckDB closes the same
    * wedges over the quadratic exact pair set. */
  val g01 = Q("g01_neardup_triangles",
    (s, dir) =>
      triangleCount(DedupOps.nearDupPairs(s, dir).select("doc_a", "doc_b")),
    Some("""
      WITH w AS (
        SELECT doc_id,
               list_distinct(list_filter(string_split(text,' '), x -> x <> '')) AS s
        FROM documents),
      e AS (
        SELECT a.doc_id AS a, b.doc_id AS b
        FROM w a JOIN w b ON a.doc_id < b.doc_id
        WHERE len(list_intersect(a.s, b.s)) * 1.0 /
                (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.9)
      SELECT count(*) AS n_triangles
      FROM e e1 JOIN e e2 ON e1.b = e2.a
                JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b"""))

  val queries: Seq[Q] = Seq(g01)
}
