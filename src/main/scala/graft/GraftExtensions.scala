package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.{BitmapAndCardinality, BitmapCardinality, BitmapOrCardinality, CosineSimilarity, DenseBitmapAgg, JaccardSimilarity, MinHashAgg, TopKAgg}

/** SparkSessionExtensions hook: registers the engine's native functions
  * for SQL use at session build time —
  * `SparkSession.builder().withExtensions(new GraftExtensions)` — the
  * standard integration point for third-party Catalyst function libraries
  * (also wired into graft.Session by default).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(e: SparkSessionExtensions): Unit = {
    // whole-operator extension (SURVEY §7.3 tier c): the native as-of join
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    e.injectFunction((
      FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      exprs => CosineSimilarity(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("jaccard_similarity"),
      new ExpressionInfo(classOf[JaccardSimilarity].getName, "jaccard_similarity"),
      exprs => JaccardSimilarity(exprs(0), exprs(1))))
    // minhash_agg(hash BIGINT[, numHashes INT[, seed BIGINT]]) — the
    // sketch-shape args must be literals (they fix the aggregation buffer
    // size); wrong arity or non-literal args fail at analysis, not with a
    // silently-ignored argument.
    e.injectFunction((
      FunctionIdentifier("minhash_agg"),
      new ExpressionInfo(classOf[MinHashAgg].getName, "minhash_agg"),
      exprs => {
        // shared literal validation (VectorFunctions.longLitArg/intLitArg):
        // one definition for every registration path, incl. the
        // reject-instead-of-truncate Int-range rule
        import graft.functions.VectorFunctions.{intLitArg, longLitArg}
        exprs match {
          case Seq(child) => MinHashAgg(child, 64, 42L).toAggregateExpression()
          case Seq(child, n) =>
            MinHashAgg(child, intLitArg(n, "minhash_agg", "numHashes"), 42L)
              .toAggregateExpression()
          case Seq(child, n, s) =>
            MinHashAgg(child, intLitArg(n, "minhash_agg", "numHashes"),
              longLitArg(s, "minhash_agg", "seed")).toAggregateExpression()
          case other => throw new IllegalArgumentException(
            s"minhash_agg takes 1-3 arguments (hash[, numHashes[, seed]]), got ${other.size}")
        }
      }))
    // minhash_sig(whs ARRAY<BIGINT>[, numHashes INT[, seed BIGINT]]) —
    // the fused per-ROW signature kernel (same hash family and literal
    // rules as minhash_agg; bit-identical, pinned by MinHashSigSpec).
    e.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[graft.functions.MinHashSig].getName, "minhash_sig"),
      exprs => {
        import graft.functions.VectorFunctions.{intLitArg, longLitArg}
        exprs match {
          case Seq(child) => graft.functions.MinHashSig(child, 64, 42L)
          case Seq(child, n) =>
            graft.functions.MinHashSig(child,
              intLitArg(n, "minhash_sig", "numHashes"), 42L)
          case Seq(child, n, s) =>
            graft.functions.MinHashSig(child,
              intLitArg(n, "minhash_sig", "numHashes"),
              longLitArg(s, "minhash_sig", "seed"))
          case other => throw new IllegalArgumentException(
            s"minhash_sig takes 1-3 arguments (whs[, numHashes[, seed]]), got ${other.size}")
        }
      }))
    // dense_bitmap_agg(id BIGINT/INT, nBits INT literal) + bitmap
    // cardinality arithmetic — the audience-store primitive; nBits must
    // be a literal (it bounds the aggregation state).
    e.injectFunction((
      FunctionIdentifier("dense_bitmap_agg"),
      new ExpressionInfo(classOf[DenseBitmapAgg].getName, "dense_bitmap_agg"),
      exprs => {
        import org.apache.spark.sql.catalyst.expressions.Literal
        exprs match {
          case Seq(child) => DenseBitmapAgg(child, 1 << 22).toAggregateExpression()
          case Seq(child, Literal(n: Int, _: org.apache.spark.sql.types.IntegerType)) =>
            DenseBitmapAgg(child, n).toAggregateExpression()
          case Seq(_, other) => throw new IllegalArgumentException(
            s"dense_bitmap_agg: nBits must be an integer literal, got ${other.sql}")
          case other => throw new IllegalArgumentException(
            s"dense_bitmap_agg takes 1-2 arguments (id[, nBits]), got ${other.size}")
        }
      }))
    e.injectFunction((
      FunctionIdentifier("bitmap_cardinality"),
      new ExpressionInfo(classOf[BitmapCardinality].getName, "bitmap_cardinality"),
      exprs => BitmapCardinality(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("bitmap_and_cardinality"),
      new ExpressionInfo(classOf[BitmapAndCardinality].getName, "bitmap_and_cardinality"),
      exprs => BitmapAndCardinality(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("bitmap_or_cardinality"),
      new ExpressionInfo(classOf[BitmapOrCardinality].getName, "bitmap_or_cardinality"),
      exprs => BitmapOrCardinality(exprs(0), exprs(1))))
    // mg_sketch(key STRING, k INT literal) — Misra–Gries heavy-hitter
    // candidate summary (STRUCT<total, keys>); k must be a literal (it
    // bounds the aggregation state).
    e.injectFunction((
      FunctionIdentifier("mg_sketch"),
      new ExpressionInfo(classOf[graft.functions.MisraGriesAgg].getName, "mg_sketch"),
      exprs => {
        import org.apache.spark.sql.catalyst.expressions.Literal
        exprs match {
          case Seq(child, Literal(k: Int, _: org.apache.spark.sql.types.IntegerType)) =>
            graft.functions.MisraGriesAgg(child, k).toAggregateExpression()
          case Seq(_, other) => throw new IllegalArgumentException(
            s"mg_sketch: k must be an integer literal, got ${other.sql}")
          case other => throw new IllegalArgumentException(
            s"mg_sketch takes 2 arguments (key, k), got ${other.size}")
        }
      }))
    // kll_agg(value DOUBLE[, k INT literal]) / kll_union_agg(sketch
    // BINARY[, k]) / kll_quantile(sketch, q) / kll_rank(sketch, v) —
    // mergeable quantile sketches; k bounds the aggregation state.
    locally {
      import org.apache.spark.sql.catalyst.expressions.Literal
      import graft.functions.{KllAgg, KllDoublesAgg, KllQuantile, KllRank, KllUnionAgg}
      def kOf(exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
          name: String): Int = exprs match {
        case Seq(_) => KllAgg.DefaultK
        case Seq(_, Literal(k: Int, _: org.apache.spark.sql.types.IntegerType)) => k
        case Seq(_, other) => throw new IllegalArgumentException(
          s"$name: k must be an integer literal, got ${other.sql}")
        case other => throw new IllegalArgumentException(
          s"$name takes 1-2 arguments, got ${other.size}")
      }
      e.injectFunction((
        FunctionIdentifier("kll_agg"),
        new ExpressionInfo(classOf[KllDoublesAgg].getName, "kll_agg"),
        exprs => KllDoublesAgg(exprs.head, kOf(exprs, "kll_agg")).toAggregateExpression()))
      e.injectFunction((
        FunctionIdentifier("kll_union_agg"),
        new ExpressionInfo(classOf[KllUnionAgg].getName, "kll_union_agg"),
        exprs => KllUnionAgg(exprs.head, kOf(exprs, "kll_union_agg")).toAggregateExpression()))
      e.injectFunction((
        FunctionIdentifier("kll_quantile"),
        new ExpressionInfo(classOf[KllQuantile].getName, "kll_quantile"),
        exprs => KllQuantile(exprs(0), exprs(1))))
      e.injectFunction((
        FunctionIdentifier("kll_rank"),
        new ExpressionInfo(classOf[KllRank].getName, "kll_rank"),
        exprs => KllRank(exprs(0), exprs(1))))
    }
    // topk_agg(sort, payload, k INT) — sort/payload take any orderable
    // atomic type (STRING/BIGINT/INT/DOUBLE/DATE/TIMESTAMP, checked by
    // the aggregate's own type check); k must be a literal (it bounds
    // the aggregation state); wrong arity fails at analysis.
    e.injectFunction((
      FunctionIdentifier("topk_agg"),
      new ExpressionInfo(classOf[TopKAgg].getName, "topk_agg"),
      exprs => {
        import org.apache.spark.sql.catalyst.expressions.Literal
        exprs match {
          case Seq(sort, payload, Literal(k: Int, _: org.apache.spark.sql.types.IntegerType)) =>
            TopKAgg(sort, payload, k).toAggregateExpression()
          case Seq(_, _, other) => throw new IllegalArgumentException(
            s"topk_agg: k must be an integer literal, got ${other.sql}")
          case other => throw new IllegalArgumentException(
            s"topk_agg takes 3 arguments (sort, payload, k), got ${other.size}")
        }
      }))
  }
}
