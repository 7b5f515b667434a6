package graft

import graft.operators.{DedupOps, MergeOps, TextOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Late round-5 operators on constructed data: semantic dedup (d11),
  * snapshot diff (q43), and the deterministic epoch shuffle (t19). */
class VersioningAndShuffleSpec extends AnyFunSuite {

  lazy val spark = Session.builder("graft-test").master("local[4]")
    .config("spark.sql.shuffle.partitions", "4").getOrCreate()
  import spark.implicits._

  // ------------------------------------------------------------- d11
  /** Hand-computed 2-d fixture. Seeds (ids < 2) are corpus members too,
    * mirroring the catalog query. With τ = 0.9:
    *   cluster 0 = {0, 10, 11, 13}: cos(10,11) ≈ 0.9992 and
    *   cos(10,13) ≈ 0.964 → 11 and 13 removed, both dup_of 10
    *   (13's dup_of is the SMALLEST qualifying mate, 10 not 11);
    *   cluster 1 = {1, 14}: cos(1,14) ≈ 0.743 → kept.
    * 13/14 are the clustering trade-off pinned on purpose: cos(13,14)
    * ≈ 0.995 but they straddle the cluster boundary, so SemDeDup does
    * NOT prune 14 — the recall cost bought by the per-cluster bound. */
  test("semanticDedup prunes within clusters only, dup_of = smallest mate") {
    val e = Seq(
      (0L, Seq(1.0, 0.0)),
      (1L, Seq(0.0, 1.0)),
      (10L, Seq(1.0, 0.5)),
      (11L, Seq(0.95, 0.52)),
      (13L, Seq(1.0, 0.9)),
      (14L, Seq(0.9, 1.0))
    ).toDF("vec_id", "v")
    val got = DedupOps.semanticDedup(e, seedCount = 2, threshold = 0.9)
      .select("vec_id", "cluster_id", "dup_of")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((11L, 0L, 10L), (13L, 0L, 10L)))
  }

  /** Randomized equivalence against an independent driver-side replay of
    * the SemDeDup rule (same argmax-assign / in-cluster-threshold / keep-
    * smallest semantics computed in plain Scala): the distributed plan
    * and the sequential reference must pick the identical removal set. */
  test("semanticDedup matches a driver-side reference on random vectors") {
    val rnd = new scala.util.Random(42)
    val n = 40
    val dims = 8
    val vecs = (0 until n).map(i => i.toLong -> Vector.fill(dims)(rnd.nextGaussian()))
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      def dot(x: Seq[Double], y: Seq[Double]) =
        x.zip(y).foldLeft(0.0) { case (acc, (p, q)) => acc + p * q }
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    }
    val seeds = vecs.take(4)
    val assign = vecs.map { case (id, v) =>
      id -> seeds.map { case (cid, cv) => (cid, cos(v, cv)) }
        .maxBy { case (cid, c) => (c, -cid) }._1
    }.toMap
    val expected = (for {
      (vb, xb) <- vecs
      va = vecs.filter { case (a, xa) =>
        a < vb && assign(a) == assign(vb) && cos(xa, xb) >= 0.5
      }.map(_._1).sorted.headOption
      a <- va
    } yield (vb, assign(vb), a)).toSet

    val e = vecs.map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "v")
    val got = DedupOps.semanticDedup(e, seedCount = 4, threshold = 0.5)
      .select("vec_id", "cluster_id", "dup_of")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == expected)
  }

  // ------------------------------------------------------------- q43
  test("snapshotDiff classifies added/removed/changed, null-safe on values") {
    val old = Seq(
      (1L, "A", Some(10.0)), // removed
      (2L, "B", Some(20.0)), // unchanged → dropped from the diff
      (3L, "C", Some(30.0)), // changed (price)
      (4L, "D", None) // changed (NULL → value must count as a change)
    ).toDF("k", "status", "price")
    val nw = Seq(
      (2L, "B", Some(20.0)),
      (3L, "C", Some(35.0)),
      (4L, "D", Some(40.0)),
      (5L, "E", Some(50.0)) // added
    ).toDF("k", "status", "price")
    val got = MergeOps.snapshotDiff(old, nw, "k")
      .select("k", "diff").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "removed"), (3L, "changed"),
      (4L, "changed"), (5L, "added")))

    val bad = nw.withColumnRenamed("price", "amount")
    assertThrows[IllegalArgumentException](MergeOps.snapshotDiff(old, bad, "k"))
  }

  /** The CDC family composes: applying a diff to the old snapshot —
    * upsert the added+changed rows, anti-join away the removed keys —
    * reconstructs the new snapshot exactly. Randomized so the property
    * holds beyond the hand-picked cases. */
  test("snapshotDiff composed with upsert reconstructs the new snapshot") {
    val rnd = new scala.util.Random(11)
    val old = (1L to 60L).filter(_ => rnd.nextDouble() < 0.8)
      .map(k => (k, s"s${k % 3}", rnd.nextInt(100).toDouble)).toDF("k", "st", "p")
    val nw = (1L to 60L).filter(_ => rnd.nextDouble() < 0.8)
      .map(k => (k, s"s${k % 3}",
        if (k % 4 == 0) rnd.nextInt(100) + 1000.0 else k.toDouble)).toDF("k", "st", "p")
    val d = MergeOps.snapshotDiff(old, nw, "k").localCheckpoint()
    val ups = d.filter(col("diff").isin("added", "changed"))
      .select(col("k"), col("new_st").as("st"), col("new_p").as("p"))
    val dels = d.filter(col("diff") === "removed").select("k")
    val rebuilt = MergeOps.upsert(old, ups, "k")
      .join(dels, Seq("k"), "left_anti")
    assert(rebuilt.as[(Long, String, Double)].collect().sorted.toSeq ==
      nw.as[(Long, String, Double)].collect().sorted.toSeq)
  }

  // ------------------------------------------------------------- t20
  /** BM25 against an independent sequential replay of the same formula
    * (k1 = 1.2, b = 0.75, positive-idf form) on a 4-doc fixture — ranking
    * and rounded scores must both match. */
  test("t20 BM25 matches a driver-side formula replay on a fixture corpus") {
    val corpus = Seq(
      (0L, "join join window foo bar"),
      (1L, "stream baz qux quux corge"),
      (2L, "foo bar baz qux corge grault"),
      (3L, "join window stream join window stream"))
    def toks(t: String) = t.split(" ").filter(_.nonEmpty).toSeq
    val dl = corpus.map { case (id, t) => id -> toks(t).size.toDouble }.toMap
    val n = corpus.size.toDouble
    val avgdl = dl.values.sum / n
    val q = Seq("join", "window", "stream")
    val dfq = q.map(t => t -> corpus.count { case (_, txt) => toks(txt).contains(t) }.toDouble).toMap
    val expected = corpus.flatMap { case (id, txt) =>
      val s = q.map { term =>
        val tf = toks(txt).count(_ == term).toDouble
        if (tf == 0) 0.0
        else math.log((n - dfq(term) + 0.5) / (dfq(term) + 0.5) + 1) *
          (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl(id) / avgdl))
      }.sum
      if (s == 0.0) None
      else Some(id -> BigDecimal(s).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy { case (id, s) => (-s, id) }

    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-bm25").toString
    corpus.map { case (id, t) => (id, t, "en", "s0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val got = Queries.byName("t20_bm25").build(spark, dir)
      .as[(Long, Double)].collect().toSeq
    assert(got == expected)
    assert(got.head._1 == 3L, "the doc with every query term twice ranks first")
  }

  // ------------------------------------------------------------- t21
  /** A-ES weighted sampling against an independent sequential replay of
    * the same key construction (md5-uniform, ln(u)/w ranking): ranks,
    * keys, and the zero-weight exclusion must all match. */
  test("t21 weighted sample matches a driver-side A-ES replay") {
    val corpus = Seq(
      (0L, "a b c d e f g h", "s0"),
      (1L, "a b", "s0"),
      (2L, "a b c d e f g h i j k l m n o p", "s0"),
      (3L, "a", "s1"),
      (4L, "a b c d", "s1"),
      (5L, "", "s1")) // zero tokens → excluded by the w > 0 guard
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val expected = corpus.flatMap { case (id, text, src) =>
      val w = text.split(" ").count(_.nonEmpty).toDouble
      if (w == 0) None else {
        val u = (BigInt(md5hex(id.toString).substring(0, 8), 16) % 1000000).toDouble
        val key = BigDecimal(math.log((u + 0.5) / 1e6) / w)
          .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
        Some((src, id, key))
      }
    }.groupBy(_._1).toSeq.flatMap { case (src, rows) =>
      rows.sortBy { case (_, id, key) => (-key, id) }.take(10).zipWithIndex
        .map { case ((_, id, key), i) => (src, i + 1L, id, key) }
    }.sortBy { case (src, rk, _, _) => (src, rk) }

    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-aes").toString
    corpus.map { case (id, t, src) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val got = Queries.byName("t21_weighted_sample").build(spark, dir)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got == expected)
    assert(!got.exists(_._3 == 5L), "the zero-weight doc never samples")
  }

  // ------------------------------------------------------------- t19
  test("epochShuffle is seed-deterministic with dense per-shard positions") {
    val ids = (1L to 100L).toDF("doc_id")
    val a = TextOps.epochShuffle(ids, "e1", 4)
      .as[(Long, Long, Long)].collect().sorted.toSeq
    val b = TextOps.epochShuffle(ids, "e1", 4)
      .as[(Long, Long, Long)].collect().sorted.toSeq
    assert(a == b, "same seed must reproduce the identical shuffle")
    assert(a.map(_._1).toSet == (1L to 100L).toSet, "a permutation, not a sample")
    // positions are dense 1..|shard| within every shard
    a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted == (1L to rows.size).toSeq)
    }
    val c = TextOps.epochShuffle(ids, "e2", 4)
      .as[(Long, Long, Long)].collect().sorted.toSeq
    assert(a != c, "a new seed must produce a different epoch order")
  }
}
