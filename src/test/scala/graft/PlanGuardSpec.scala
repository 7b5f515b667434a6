package graft

import org.apache.spark.sql.execution.FormattedMode
import org.scalatest.funsuite.AnyFunSuite

/** Catalog-wide scale guardrail: builds EVERY query's physical plan and
  * rejects the two patterns that do not survive a 100× scale-up —
  * CartesianProduct anywhere, and BroadcastNestedLoopJoin outside the
  * short whitelist of queries whose semantics genuinely need a theta
  * join against a BOUNDED broadcast side. A refactor that silently
  * degrades an equi-join into a nested loop (lost join key, lost bin
  * key, accidental non-equi predicate) fails here, not in a 100 TB run.
  */
class PlanGuardSpec extends AnyFunSuite {

  lazy val spark = Session.builder("graft-test").master("local[4]")
    .config("spark.sql.shuffle.partitions", "4").getOrCreate()

  /** Version provenance (r13 verdict ask #6): the whitelist below
    * encodes which physical join Spark 4.1.2's planner picks per query;
    * a jar swap must fail here rather than silently re-validate. */
  test("provenance: plan guardrail validated on Spark 4.1.2") {
    info(s"running on Spark ${spark.version}")
    assert(spark.version == "4.1.2",
      s"plan guardrail was validated on Spark 4.1.2 but this is " +
        s"${spark.version} — re-check the BNL whitelist and " +
        "CartesianProduct sweep on the new version, then update this pin")
  }

  private val sf = "/root/testdata/sf0.001"

  /** Queries where a BroadcastNestedLoopJoin is the intended plan:
    * the streamed side passes ONCE over a provably small broadcast side
    * (probe rows, 1-row scalar attaches, a bounded dimension). Each is
    * documented at its definition site. */
  private val bnlWhitelist: Set[String] = Set(
    "s01_cosine_topk",      // corpus × 5 broadcast probe rows (vec_id<5, <>)
    "s11_knn_classify",     // corpus × 20 broadcast probe rows
    "s09_hybrid_retrieval", // dense leg = the s01 probe shape
    "s10_mmr_diversify",    // s01 probe shape feeding the fold
    "d05_embedding_neardup",// bounded candidate block × broadcast block
    "d09_containment",      // length-binned candidate enumeration, non-equi
    "d11_semantic_dedup",   // within-cluster quadratic vs broadcast centroids
    "q26_approx_aggs",      // 1-row broadcast scalar attach
    "q34_fuzzy_match",      // bounded dim × bounded dim, crossJoin by design
    "q38_scalar_subquery",  // 1-row broadcast scalar attach
    "t07_tfidf",            // 1-row corpus-size broadcast attach
    "t10_mix_weights",      // 1-row total broadcast attach
    "t17_unigram_logprob",  // 1-row LM-total broadcast attach
    "t20_bm25",             // 1-row corpus-stats broadcast attach
    "v03_referential_integrity", // 1-row counts crossJoin attach
    "e07_gap_fill",         // dense grid from broadcast 1-row bounds
    "t14_quality_deciles_approx", // 1-row approx-quantile cuts attach
    "t18_mixture_sample",   // per-source keep-rate table (#sources rows)
    "s06_kmeans_lite",      // broadcast centroid table (k rows) per pass
    "g03_ppr_redistribute", // 1-row dangling-mass aggregate attach
    "e20_bitmap_retention", // 1-row day-0 bitmap broadcast attach
    "q46_zorder_layout",    // 1-row column-max bounds attach
    "v05_table_fingerprint", // two 1-row fingerprint attaches
    "s12_retrieval_metrics", // corpus × 20 broadcast probe rows (s01 shape)
    "e24_overlap_sketch")   // |types|² sketch-blob pairing (≤ 5 rows a side)

  test("no CartesianProduct in any catalog plan; BNL only where whitelisted") {
    // Other suites legitimately flip this on the shared session (forcing
    // SMJ to pin bucketed plans); with broadcast disabled every bounded
    // theta join degrades to CartesianProduct and this guard would fire
    // on suite ORDER, not on code. Pin the production default, restore
    // after.
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key, "10485760")
    try runGuard()
    finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  private def runGuard(): Unit = {
    val failures = Queries.all.flatMap { q =>
      try {
        val plan = q.build(spark, sf).queryExecution
          .explainString(FormattedMode)
        val cart =
          if (plan.contains("CartesianProduct")) Some(s"${q.name}: CartesianProduct")
          else None
        val bnl =
          if (plan.contains("BroadcastNestedLoopJoin") && !bnlWhitelist(q.name))
            Some(s"${q.name}: unexpected BroadcastNestedLoopJoin")
          else None
        cart.toSeq ++ bnl.toSeq
      } catch {
        case e: Exception => Seq(s"${q.name}: plan build failed: ${e.getMessage.take(120)}")
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("q45's two windows share one hash exchange (same partition key)") {
    val plan = Queries.byName("q45_running_distinct").build(spark, sf)
      .queryExecution.explainString(FormattedMode)
    val hashExchanges = "hashpartitioning".r.findAllIn(plan).length
    assert(hashExchanges === 1,
      s"expected ONE suppkey exchange feeding both window sorts, got $hashExchanges")
    assert("(?s)Window.*Window".r.findFirstIn(plan).isDefined, "two window operators expected")
  }

  test("whitelist carries no dead entries") {
    val names = Queries.all.map(_.name).toSet
    val dead = bnlWhitelist.filterNot(names)
    assert(dead.isEmpty, s"whitelisted but not in catalog: $dead")
  }
}
