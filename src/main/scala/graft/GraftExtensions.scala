package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.{CosineSimilarity, JaccardSimilarity, MinHashAgg}

/** SparkSessionExtensions hook: registers the engine's native functions
  * for SQL use at session build time —
  * `SparkSession.builder().withExtensions(new GraftExtensions)` — the
  * standard integration point for third-party Catalyst function libraries
  * (also wired into graft.Session by default).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      exprs => CosineSimilarity(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("jaccard_similarity"),
      new ExpressionInfo(classOf[JaccardSimilarity].getName, "jaccard_similarity"),
      exprs => JaccardSimilarity(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("minhash_agg"),
      new ExpressionInfo(classOf[MinHashAgg].getName, "minhash_agg"),
      exprs => MinHashAgg(exprs.head, 64, 42L).toAggregateExpression()))
  }
}
