package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Golden checks for the operators the DuckDB oracle can't express
  * (rows-only in the driver gate): langid, simhash, ANN-LSH, fake-decode.
  * Runs them against a crafted mini test-data directory with known
  * near-duplicates and vector clusters. */
class OpsGoldenSpec extends AnyFunSuite {

  lazy val spark = Session.builder("graft-test").master("local[4]")
    .config("spark.sql.shuffle.partitions", "4").getOrCreate()

  /** Crafted tables in the same layout as /root/testdata/sf*. */
  lazy val dir: String = {
    val d = Files.createTempDirectory("graft-golden").toString
    import spark.implicits._
    Seq(
      (0L, "the quick brown fox jumps over the lazy dog again and again", "en", "srcA", 60L),
      (1L, "the quick brown fox jumps over the lazy dog again and again", "en", "srcA", 60L), // exact dup of 0
      (2L, "the quick brown fox jumps over the lazy dog again and often", "en", "srcB", 60L), // near dup of 0
      (3L, "der hund und die katze sind ist und der garten und der baum", "de", "srcB", 59L),
      (4L, "completely different words about spark shuffle partitions here", "en", "srcC", 62L),
      (5L, "el perro y la casa es de la madre y de el padre", "es", "srcC", 47L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")

    val base = Array.fill(64)(0.1f)
    def vec(seed: Int, noise: Float): Array[Float] = {
      val rnd = new scala.util.Random(seed)
      base.map(_ + rnd.nextFloat() * noise)
    }
    Seq(
      (0L, vec(1, 0.01f).toSeq, 0),  // cluster A
      (1L, vec(2, 0.01f).toSeq, 0),  // cluster A (near 0)
      (2L, Array.fill(64)(-0.1f).toSeq.map(x => x + 0.001f), 1), // far away
      (3L, vec(3, 0.01f).toSeq, 0),
      (4L, vec(4, 2.0f).toSeq, 2),
      (5L, vec(5, 2.0f).toSeq, 2))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$d/embeddings.parquet")
    d
  }

  test("d01 exact dedup collapses the identical pair") {
    val rows = Queries.byName("d01_exact_dedup").build(spark, dir).collect()
    assert(rows.length == 5) // 6 docs, one exact dup
    val dup = rows.filter(_.getLong(2) == 2L)
    assert(dup.length == 1 && dup.head.getLong(1) == 0L) // keeper = min id
  }

  test("d02 minhash-lsh finds exact and near dups") {
    val pairs = Queries.byName("d02_minhash_lsh").build(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L))) // identical word sets
    assert(pairs.contains((0L, 2L))) // near dup: jaccard 10/11 ≥ 0.9
    assert(!pairs.exists { case (a, b) => Set(a, b) == Set(0L, 4L) }) // unrelated

  }

  test("d03 simhash: identical docs at hamming 0") {
    val rows = Queries.byName("d03_simhash").build(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    val h01 = rows.find(r => r._1 == 0L && r._2 == 1L)
    assert(h01.exists(_._3 == 0))
  }

  test("t03 langid votes by marker tokens") {
    val preds = Queries.byName("t03_langid").build(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(preds(3L) == "de")
    assert(preds(5L) == "es")
    assert(preds(0L) == "en")
  }

  test("s01/s02: LSH ANN finds the same-cluster neighbor the brute force finds") {
    val brute = Queries.byName("s01_cosine_topk").build(spark, dir).collect()
      .filter(_.getLong(0) == 0L).map(_.getLong(2)).toSeq
    val ann = Queries.byName("s02_ann_lsh").build(spark, dir).collect()
      .filter(_.getLong(0) == 0L).map(_.getLong(2)).toSeq
    assert(brute.head == ann.head) // nearest neighbor agrees
    assert(ann.toSet.subsetOf(brute.toSet ++ Set(2L, 4L, 5L)))
  }

  test("connectedComponents labels a chain, a pair, and leaves them separate") {
    import spark.implicits._
    // chain 1-2-3-4 (diameter 3, needs >1 propagation round), pair 10-11
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (11L, 10L)).toDF("src", "dst")
    val got = operators.DedupOps.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("d06 clusters the exact+near dup group under the smallest doc_id") {
    // docs 0, 1, 2 are mutual near-dups → one cluster rooted at 0
    val rows = Queries.byName("d06_dedup_clusters").build(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows == Map(0L -> 0L, 1L -> 0L, 2L -> 0L))
  }

  test("sorted_long_jaccard equals the string-set jaccard on hashed sets") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(11)
    val vocab = (0 until 200).map(i => s"tok$i")
    val rows = (0 until 50).map { i =>
      (i.toLong, rnd.shuffle(vocab).take(20 + rnd.nextInt(60)))
    }.toDF("id", "words")
    val pairs = rows.alias("a").join(rows.alias("b"),
        col("a.id") < col("b.id"))
      .select(
        functions.VectorFunctions.jaccard_similarity(col("a.words"), col("b.words")).as("js"),
        functions.VectorFunctions.sorted_long_jaccard(
          expr("array_sort(transform(a.words, w -> xxhash64(w)))"),
          expr("array_sort(transform(b.words, w -> xxhash64(w)))")).as("slj"))
      .collect()
    assert(pairs.length == 50 * 49 / 2)
    pairs.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("prefix-filter completeness on randomized template corpora") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // seeded generator (no scalacheck-plus in the offline cache): mutate a
    // 40-word template by swapping k random words — a spread of Jaccard
    // values straddling the 0.9 threshold, the regime where a wrong prefix
    // length silently drops pairs
    val rnd = new scala.util.Random(1234)
    val vocab = (0 until 400).map(i => s"w$i")
    val template = rnd.shuffle(vocab).take(40)
    val docsLocal = (0L until 40L).map { id =>
      val k = rnd.nextInt(5) // 0-4 swaps → J from 1.0 down to ~0.78
      val words = template.toArray
      (0 until k).foreach { _ =>
        words(rnd.nextInt(words.length)) = vocab(rnd.nextInt(vocab.length))
      }
      (id, words.mkString(" "))
    }
    val d = java.nio.file.Files.createTempDirectory("graft-d07rand").toString
    docsLocal.toDF("doc_id", "text").coalesce(1)
      .write.parquet(s"$d/documents.parquet")

    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // ground truth: exact quadratic on word sets
    val w = spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), expr("array_distinct(filter(split(text,' '), x -> x != ''))").as("s"))
    val truth = pairs(w.alias("a").join(w.alias("b"), col("a.doc_id") < col("b.doc_id"))
      .withColumn("j", functions.VectorFunctions.jaccard_similarity(col("a.s"), col("b.s")))
      .filter(col("j") >= 0.9)
      .select(col("a.doc_id"), col("b.doc_id")))
    val got = pairs(Queries.byName("d07_allpairs_jaccard").build(spark, d)
      .select(col("doc_a"), col("doc_b")))
    assert(got == truth)
    assert(truth.size > 10, s"generator degenerate: only ${truth.size} true pairs")
  }

  test("d09 containment finds subset dups that Jaccard misses, matches quadratic truth") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(77)
    val vocab = (0 until 500).map(i => s"c$i")
    val big = rnd.shuffle(vocab).take(60)
    val docsLocal =
      // doc 0: the big page; doc 1: a strict 12-word subset (containment
      // 1.0, Jaccard 0.2 — invisible to d02/d07); docs 2+: random noise
      // plus template mutations straddling the threshold
      Seq((0L, big.mkString(" ")), (1L, big.take(12).mkString(" "))) ++
        (2L until 30L).map { id =>
          val words = big.toArray
          (0 until rnd.nextInt(8)).foreach { _ =>
            words(rnd.nextInt(words.length)) = vocab(rnd.nextInt(vocab.length))
          }
          (id, words.mkString(" "))
        }
    val d = java.nio.file.Files.createTempDirectory("graft-d09").toString
    docsLocal.toDF("doc_id", "text").coalesce(1)
      .write.parquet(s"$d/documents.parquet")

    // exact quadratic ordered-pair ground truth
    val w = spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"),
        expr("array_distinct(filter(split(text,' '), x -> x != ''))").as("s"))
    val truth = w.alias("a").join(w.alias("b"), col("a.doc_id") =!= col("b.doc_id"))
      .withColumn("cont",
        size(expr("array_intersect(a.s, b.s)")).cast("double") / size(col("a.s")))
      .filter(col("cont") >= 0.9)
      .select(col("a.doc_id"), col("b.doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Queries.byName("d09_containment").build(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == truth)
    assert(got.contains((1L, 0L)), "strict subset pair must be found")
    // ...and the symmetric Jaccard join rightly does NOT see it
    val jpairs = Queries.byName("d07_allpairs_jaccard").build(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!jpairs.contains((1L, 0L)))
  }

  test("d07 prefix-filter join returns exactly the d02 pair set") {
    val d02 = Queries.byName("d02_minhash_lsh").build(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val d07 = Queries.byName("d07_allpairs_jaccard").build(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(d07 == d02)
    assert(d07.nonEmpty) // docs 0/1/2 are near-dups
  }

  test("d07/d09 candidate stages emit each pair exactly once, without distinct") {
    import spark.implicits._
    // Heavy-multiplicity corpus: 20-token docs at t=0.9 carry a 3-token
    // prefix, and the identical docs share all 3 — so the naive join
    // emits each pair 3×. The first_common_long rule must cut that to 1
    // with no dedup shuffle.
    val base = (1 to 20).map(i => s"tok$i").mkString(" ")
    val variant = ((1 to 19).map(i => s"tok$i") :+ "tok99").mkString(" ")
    val d = Files.createTempDirectory("graft-once").toString
    (0L to 3L).map(i => (i, base, "en", "srcA", 60L))
      .++(Seq((4L, variant, "en", "srcA", 60L),
        (5L, "wholly unrelated words live here in this document today ok", "en", "srcB", 60L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")

    val c7 = operators.DedupOps.prefixCandidates(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(c7.nonEmpty)
    assert(c7.length == c7.distinct.length, "d07 candidates must be duplicate-free")
    // completeness at the candidate level: all 6 identical-doc pairs present
    val idPairs = for (a <- 0L to 3L; b <- (a + 1) to 3L) yield (a, b)
    assert(idPairs.forall(c7.contains))

    val c9 = operators.DedupOps.containmentCandidates(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(c9.nonEmpty)
    assert(c9.length == c9.distinct.length, "d09 candidates must be duplicate-free")
    // ordered identical pairs (both directions) must all be candidates
    val ordPairs = for (a <- 0L to 3L; b <- 0L to 3L; if a != b) yield (a, b)
    assert(ordPairs.forall(c9.contains))
  }

  test("triangleCount sees the one triangle in a triangle-plus-tail graph") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // triangle 1-2-3 (edges in mixed orientation) + tail 3-4
    val edges = Seq((2L, 1L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("src", "dst")
    val n = operators.GraphOps.triangleCount(edges)
      .select(col("n_triangles")).collect().head.getLong(0)
    assert(n == 1L)
  }

  test("m04 chunking emits no fully-redundant tail chunk") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-m04").toString
    Seq(
      (0L, (1 to 64).map(i => s"t$i").mkString(" ")),  // exactly one window
      (1L, (1 to 65).map(i => s"t$i").mkString(" ")),  // tail holds a new token
      (2L, (1 to 10).map(i => s"t$i").mkString(" ")))  // shorter than one window
      .toDF("doc_id", "text").coalesce(1).write.parquet(s"$d/documents.parquet")
    val perDoc = Queries.byName("m04_chunking").build(spark, d)
      .groupBy("doc_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perDoc == Map(0L -> 1L, 1L -> 2L, 2L -> 1L))
  }

  test("m02 real PNG decode is deterministic and round-trips the raster") {
    val rows = Queries.byName("m02_decode_features").build(spark, dir).collect()
    assert(rows.length == 6)
    val r0 = rows.find(_.getLong(0) == 0L).get
    val r1 = rows.find(_.getLong(0) == 1L).get
    // identical payloads → identical features, across partitions
    assert(r0.getInt(2) == r1.getInt(2) && r0.getDouble(4) == r1.getDouble(4))
    // and the features must equal an independent local encode+decode of
    // the same seed — i.e. ImageIO really parsed the PNG we rendered
    val seed = "the quick brown fox jumps over the lazy dog again and again"
      .getBytes("UTF-8")
    val f = graft.operators.MultimodalOps.ImageCodec.decode(
      graft.operators.MultimodalOps.ImageCodec.encodePng(seed))
    // the query rounds the raw decoded mean to 4 digits (oracle parity)
    val rounded = BigDecimal(f.mean_byte)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r0.getInt(2) == f.width && r0.getInt(3) == f.height &&
      r0.getDouble(4) == rounded && r0.getString(5) == "png")
    assert(f.width >= 8 && f.width < 32 && f.height >= 8 && f.height < 32)
  }

  test("ImageCodec decode rejects non-image bytes and round-trips pixel truth") {
    import graft.operators.MultimodalOps.ImageCodec
    // pixel-level truth: decode(encode(seed)) must reproduce the exact
    // counter-mode md5-expanded raster mean, PNG grayscale being lossless
    val seed = Array[Byte](7, 42, -3, 99)
    val md = java.security.MessageDigest.getInstance("MD5")
    val w = 8 + ((seed.head & 0xFF) % 24)
    val h = 8 + ((seed.last & 0xFF) % 24)
    var sum = 0L
    (0 until w * h).foreach { i =>
      val j = i / 16
      md.reset()
      md.update(seed)
      md.update((":" + j).getBytes("UTF-8"))
      sum += md.digest()(i % 16) & 0xFF
    }
    val wantMean = sum.toDouble / (w * h)
    val f = ImageCodec.decode(ImageCodec.encodePng(seed))
    assert((f.width, f.height, f.mean_byte) == (w, h, wantMean))
    intercept[Exception] {
      ImageCodec.decode("definitely not a png".getBytes("UTF-8"))
    }
  }
}
