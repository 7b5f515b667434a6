package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One catalog entry: a Spark-native query plus (when SQL-expressible) an
  * equivalent DuckDB SQL oracle over the same parquet tables.
  *
  * Contract (driver correctness gate):
  *   - column names of the Spark result and the oracle result must match;
  *   - results must be deterministically ordered (ORDER BY on a unique key
  *     set in BOTH engines) because the compare hashes values;
  *   - float aggregates are rounded on both sides — summation order differs
  *     between engines, so raw doubles would hash-mismatch at the last ulp.
  */
final case class Q(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** true → include in the Bench headline set (run at sf0.1). */
    headline: Boolean = false,
    /** Scale-feasible replacement oracle for fixtures where `oracle` is
      * quadratic-infeasible in DuckDB (the d-kernel pair queries: the
      * ground-truth self-join is 1.25B pairs already at sf1.0). Same
      * output contract, different candidate scheme — a complete
      * (pigeonhole) prefix-filter replay whose exact verify makes it
      * equal to the ground truth at every scale. Used ONLY by the
      * local scale boards (`SPARK_GRAFT_SCALE_ORACLES=1`); the driver's
      * sf0.01 gate always gets the maximally-independent `oracle`. */
    scaleOracle: Option[String] = None)

object Queries {
  lazy val all: Seq[Q] =
    operators.Relational.queries ++
      operators.TextOps.queries ++
      operators.DedupOps.queries ++
      operators.SimilarityOps.queries ++
      operators.EventOps.queries ++
      operators.RangeJoinOps.queries ++
      operators.SkewOps.queries ++
      operators.MergeOps.queries ++
      operators.GraphOps.queries ++
      operators.MultimodalOps.queries ++
      operators.MapReduceQueries.queries ++
      operators.ValidateOps.queries ++
      operators.PipelineOps.queries

  lazy val byName: Map[String, Q] = all.map(q => q.name -> q).toMap

  def queryMap: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.build).toMap

  def oracleMap: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap

  /** Scale-board oracle overrides (see [[Q.scaleOracle]]). */
  def scaleOracleMap: Map[String, String] =
    all.flatMap(q => q.scaleOracle.map(q.name -> _)).toMap
}
