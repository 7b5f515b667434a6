package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Adversarial hot-bucket corpus for the bounded LSH dedup path: a
  * 30-doc identical clique makes every one of its (band, bh) buckets
  * 30 deep, so an unbounded band join would enumerate all ~435·16
  * intra-bucket rows. With bounding, the clique docs are detected as
  * hot and routed through the exact prefix-filter kernel (complete at
  * the threshold), the band join never pairs two hot docs, and the
  * result must STILL equal the exact quadratic truth — at a tiny cap
  * (everything routed), the default, and a huge cap (pure LSH). */
class DedupHotBucketSpec extends AnyFunSuite {

  lazy val spark = Session.builder("graft-hotbucket-test").master("local[4]")
    .config("spark.sql.shuffle.partitions", "4").getOrCreate()

  private val cliqueWords = (1 to 30).map(i => s"w$i")
  private val cliqueText = cliqueWords.mkString(" ")
  // 29 shared + 1 new word: J = 29/31 ≈ 0.9355 ≥ 0.9 against every clique doc
  private val variantText = (cliqueWords.dropRight(1) :+ "wX").mkString(" ")
  // separate near-dup pair outside the clique: J = 19/21 ≈ 0.9048
  private val pairBase = (101 to 120).map(i => s"p$i")
  private val pairA = pairBase.mkString(" ")
  private val pairB = (pairBase.dropRight(1) :+ "pX").mkString(" ")

  lazy val dir: String = {
    val d = Files.createTempDirectory("graft-hotbucket").toString
    import spark.implicits._
    val rows =
      (0L until 30L).map(i => (i, cliqueText)) ++
        Seq((30L, variantText), (31L, pairA), (32L, pairB),
          (33L, "totally unrelated words about shuffle partitions"),
          (34L, "another disjoint document mentioning catalyst plans"))
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("src"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    d
  }

  /** Exact quadratic ground truth over distinct word sets, rounded like d02. */
  private def truth: Set[(Long, Long, Double)] = {
    val docs = (0L until 30L).map(i => (i, cliqueText)) ++
      Seq((30L, variantText), (31L, pairA), (32L, pairB),
        (33L, "totally unrelated words about shuffle partitions"),
        (34L, "another disjoint document mentioning catalyst plans"))
    val sets = docs.map { case (id, t) => (id, t.split(' ').filter(_.nonEmpty).toSet) }
    (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      j = (sa & sb).size.toDouble / (sa | sb).size
      if j >= 0.9
    } yield (a, b, math.rint(j * 10000) / 10000.0)).toSet
  }

  private def d02At(maxBucket: Int): Set[(Long, Long, Double)] =
    operators.DedupOps.nearDupPairs(spark, dir, maxBucket = maxBucket)
      .select(col("doc_a"), col("doc_b"), round(col("jac"), 4).as("j"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("the identical clique is detected as hot at a small cap") {
    // rebuild the band frame the same way nearDupPairs does, via the
    // exposed helper on a cap that the 30-deep clique buckets exceed
    val pairs = d02At(8) // forces the routing path to run end-to-end
    assert(pairs.nonEmpty)
    // clique pairs exist in the output and could only have come from the
    // kernel: every clique bucket is 30 > 8 deep, so the band join's
    // both-hot filter excluded them
    assert(pairs.contains((0L, 1L, 1.0)))
  }

  test("bounded d02 equals the exact quadratic truth at tiny, default, and huge caps") {
    val want = truth
    assert(want.size >= 435 + 30 + 1, s"fixture sanity: got ${want.size} true pairs")
    Seq(2, 64, Int.MaxValue).foreach { cap =>
      assert(d02At(cap) == want, s"mismatch at maxBucket=$cap")
    }
  }

  test("derived cutoff stays at the floor on the adversarial clique corpus; result is exact") {
    // every clique bucket is 30 deep: enumerating them would blow the
    // per-doc pair budget, so the histogram-derived cutoff must stay at
    // the floor (16 < 30) and the default-path answer must still be the
    // exact truth via hot-doc routing
    val (bands, numBands) = operators.DedupOps.lshBands(spark, dir, 0.9)
    val bs = bands.groupBy("band", "bh").agg(count(lit(1)).as("bn"))
    val cutoff = operators.DedupOps.deriveMaxBucket(bs, numBands)
    assert(cutoff < 30, s"cutoff $cutoff would enumerate the clique buckets")
    assert(d02At(0) == truth) // 0 = derive (the d02 catalog default)
  }

  test("derived cutoff keeps a benign corpus entirely in the banding layer") {
    // 1000 documents of 25 distinct pseudo-random words each (vocab 50k
    // — essentially disjoint word sets), plus 50 injected near-dup pairs
    // (24 shared + 1 changed word: J = 24/26 ≈ 0.923). No bucket grows
    // past a handful, so the derived cutoff must exceed every bucket
    // size: ZERO docs routed to the exact kernel, the banding layer
    // carries all the traffic, and the answer still matches the exact
    // quadratic truth.
    import spark.implicits._
    def wordsOf(i: Long): Seq[String] =
      (0 until 25).map(j => "v" + (((i * 31 + j * 7919) * 2654435761L) % 50000))
    val rows = (0L until 1000L).map { i =>
      if (i % 20 == 19) // near-dup of the previous doc
        (i, (wordsOf(i - 1).dropRight(1) :+ s"x$i").mkString(" "))
      else (i, wordsOf(i).mkString(" "))
    }
    val d = Files.createTempDirectory("graft-benign").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("src"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(2).write.parquet(s"$d/documents.parquet")

    val (bands, numBands) = operators.DedupOps.lshBands(spark, d, 0.9)
    val bs = bands.groupBy("band", "bh").agg(count(lit(1)).as("bn"))
    val cutoff = operators.DedupOps.deriveMaxBucket(bs, numBands)
    val hot = operators.DedupOps.lshHotDocs(bands, cutoff).count()
    assert(hot == 0, s"$hot docs were routed off the banding layer")

    val got = operators.DedupOps.nearDupPairs(spark, d)
      .select(col("doc_a"), col("doc_b"), round(col("jac"), 4).as("j"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val sets = rows.map { case (id, t) => (id, t.split(' ').toSet) }
    val want = (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      j = (sa & sb).size.toDouble / (sa | sb).size
      if j >= 0.9
    } yield (a, b, math.rint(j * 10000) / 10000.0)).toSet
    assert(want.size == 50, s"fixture sanity: ${want.size} true pairs")
    assert(got == want)
  }

  test("deriveMaxBucket raises the cutoff exactly while the pair budget holds") {
    import spark.implicits._
    // 50 buckets of 4 docs + 5 buckets of 40; numBands=4 → 100 docs.
    // Enumerating the size-4 buckets costs 300 pairs, adding the
    // size-40s costs 4200 total. Budget 50/doc (5000) admits both →
    // cutoff 40; budget 10/doc (1000) admits only the small ones →
    // floor (16, above the size-4 buckets).
    val bs = ((0 until 50).map(i => (0, i.toLong, 4L)) ++
      (0 until 5).map(i => (1, i.toLong, 40L)))
      .toDF("band", "bh", "bn")
    assert(operators.DedupOps.deriveMaxBucket(bs, 4, pairBudgetPerDoc = 50.0) == 40)
    assert(operators.DedupOps.deriveMaxBucket(bs, 4, pairBudgetPerDoc = 10.0) == 16)
  }

  test("lshHotDocs flags exactly the clique at cap 8 on a synthetic band frame") {
    import spark.implicits._
    // synthetic bands: docs 0-29 share bucket (0, 7); docs 100-102 share
    // bucket (1, 9); cap 8 → only the 30-clique is hot
    val bands = ((0L until 30L).map(i => (i, 0, 7L)) ++
      Seq((100L, 1, 9L), (101L, 1, 9L), (102L, 1, 9L)))
      .toDF("doc_id", "band", "bh")
    val hot = operators.DedupOps.lshHotDocs(bands, 8)
      .collect().map(_.getLong(0)).toSet
    assert(hot == (0L until 30L).toSet)
  }

  test("band self-join is a ShuffledHashJoin, never sort-merged") {
    // StageStats at benign 5M docs attributed the whole benign-decade
    // superlinearity to the SMJ's external sort of the two 290 B/row
    // band streams (probe stage 1,730 → 189 task-s once hash-joined).
    // Node-detail paragraphs in formatted mode start "(n) NodeName";
    // any SMJ block keying on the band hash is a fail.
    val plan = operators.DedupOps.nearDupPairs(spark, dir)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    val blocks = plan.split("\n\n")
    // key on the join-keys attribute lines ("Left/Right keys: [... bh#N ...]"),
    // not a bare "bh" substring — the column name "bhs" and any future
    // Output/Input attribute lines in node details would match spuriously
    def keyedOnBh(b: String): Boolean = b.linesIterator.exists(l =>
      (l.contains("Left keys") || l.contains("Right keys")) && l.contains("bh#"))
    assert(blocks.exists(b =>
      b.matches("(?s)\\(\\d+\\) ShuffledHashJoin.*") && keyedOnBh(b)), plan)
    assert(!blocks.exists(b =>
      b.matches("(?s)\\(\\d+\\) SortMergeJoin.*") && keyedOnBh(b)), plan)
  }
}
