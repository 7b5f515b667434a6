package graft

import graft.operators.{DedupOps, MergeOps, PipelineOps, TextOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-5 operators on constructed data: incremental delta-vs-corpus
  * near-dup (d10), the end-to-end curation pipeline (p01), SCD2 history
  * (q42), and unigram-LM scoring (t17). */
class CurationOpsSpec extends AnyFunSuite {

  lazy val spark = Session.builder("graft-test").master("local[4]")
    .config("spark.sql.shuffle.partitions", "4").getOrCreate()
  import spark.implicits._

  /** Write a fixture table under a fresh temp dir readable via Tables. */
  private def fixtureDir(tables: (String, org.apache.spark.sql.DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-fixture").toString
    tables.foreach { case (name, df) =>
      df.coalesce(1).write.mode("overwrite").parquet(s"$dir/$name.parquet")
    }
    dir
  }

  // ------------------------------------------------------------- d10
  test("incrementalPairs = full pair set restricted to new×old, new side first") {
    val docs = Seq(
      (1L, "a b c d e f g h i j"), // old
      (7L, "a b c d e f g h i j"), // new (id%10==7), dup of 1
      (17L, "a b c d e f g h i k"), // new, jac vs 1 = 9/11 < 0.9
      (27L, "a b c d e f g h i j"), // new, dup of 1 (and of 7)
      (2L, "q r s t u v w x y z"), // old
      (12L, "q r s t u v w x y z") // old, dup of 2 — old×old, must not emit
    ).toDF("doc_id", "text")
    val sets = DedupOps.hashedWordSetsOf(docs)
    val isNew = pmod(col("doc_id"), lit(10)) === 7

    val got = DedupOps.incrementalPairs(sets, isNew, 0.9)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(got == Set((7L, 1L), (27L, 1L)))

    // equivalence: exactly the straddling subset of the d07 kernel's
    // (complete) pair set, reoriented new-first
    val full = DedupOps.prefixFilterPairsOn(sets, 0.9)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val straddle = full.collect {
      case (a, b) if a % 10 == 7 && b % 10 != 7 => (a, b)
      case (a, b) if b % 10 == 7 && a % 10 != 7 => (b, a)
    }
    assert(got == straddle)
  }

  test("incremental near-dup completeness on randomized template corpora") {
    // the d07 generator, split 10%-new: mutate a 40-word template by 0-4
    // swaps so Jaccard straddles the threshold — the regime where a wrong
    // one-sided prefix would silently drop straddling pairs
    val rnd = new scala.util.Random(4321)
    val vocab = (0 until 400).map(i => s"w$i")
    val template = rnd.shuffle(vocab).take(40)
    val df = (0L until 40L).map { id =>
      val k = rnd.nextInt(5)
      val words = template.toArray
      (0 until k).foreach { _ =>
        words(rnd.nextInt(words.length)) = vocab(rnd.nextInt(vocab.length))
      }
      (id, words.mkString(" "))
    }.toDF("doc_id", "text")
    val sets = DedupOps.hashedWordSetsOf(df)
    val got = DedupOps.incrementalPairs(sets,
        pmod(col("doc_id"), lit(10)) === 7, 0.9)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // ground truth: exact quadratic, restricted to new×old, new side first
    val w = df.select(col("doc_id"),
      expr("array_distinct(filter(split(text,' '), x -> x != ''))").as("s"))
    val truth = w.alias("a").join(w.alias("b"),
        col("a.doc_id") =!= col("b.doc_id") &&
          pmod(col("a.doc_id"), lit(10)) === 7 &&
          pmod(col("b.doc_id"), lit(10)) =!= 7)
      .withColumn("j", functions.VectorFunctions
        .jaccard_similarity(col("a.s"), col("b.s")))
      .filter(col("j") >= 0.9)
      .select(col("a.doc_id"), col("b.doc_id"))
      .as[(Long, Long)].collect().toSet
    assert(got == truth)
    assert(truth.size > 3, s"generator degenerate: ${truth.size} straddling pairs")
  }

  // ------------------------------------------------------------- p01
  test("curated drops quality/lang/exact-dup/near-dup failures, keeps representatives") {
    def doc(id: Long, lang: String, text: String) =
      (id, text, lang, "src0", text.length.toLong)
    val base = (1 to 40).map(i => s"w$i").mkString(" ") // 40 distinct tokens
    val near = ((1 to 39).map(i => s"w$i") :+ "zz").mkString(" ") // jac 39/41 ≈ 0.95
    val docs = Seq(
      doc(1, "en", base), // kept: representative
      doc(2, "en", base), // exact dup of 1 → dropped
      doc(3, "en", near), // near-dup of 1 → dropped
      doc(4, "zh", (1 to 40).map(i => s"z$i").mkString(" ")), // lang → dropped
      doc(5, "en", "too short"), // < 30 tokens → dropped
      doc(6, "en", (1 to 30).map(_ => "x" * 20).mkString(" ")), // 20 chars/token → dropped
      doc(7, "en", (1 to 35).map(i => s"v$i").mkString(" ")) // kept
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = fixtureDir("documents" -> docs)
    val kept = PipelineOps.curated(spark, dir)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 7L))
  }

  // ------------------------------------------------------------- v02
  test("quarantine routes each failing row with its reason list") {
    def doc(id: Long, lang: String, text: String) =
      (id, text, lang, "src0", text.length.toLong)
    val docs = Seq(
      doc(1, "en", (1 to 40).map(i => s"w$i").mkString(" ")), // clean
      doc(4, "zh", (1 to 40).map(i => s"z$i").mkString(" ")), // off-mix lang
      doc(5, "en", "too short"), // too few tokens
      doc(6, "en", (1 to 30).map(_ => "x" * 20).mkString(" ")), // long tokens
      doc(8, "zh", "nope") // both lang and length
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = fixtureDir("documents" -> docs)
    val got = operators.ValidateOps.v02.build(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got == Map(
      4L -> "off_mix_lang",
      5L -> "too_few_tokens",
      6L -> "bad_token_len",
      8L -> "too_few_tokens,off_mix_lang"))
  }

  // ------------------------------------------------------------- v03
  test("referential integrity counts orphans per FK edge") {
    import java.sql.Date
    val orders = Seq((1L, 10L, Date.valueOf("2024-01-01"), "O", 5.0),
      (2L, 99L, Date.valueOf("2024-01-02"), "O", 6.0)) // cust 99 missing
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_orderstatus",
        "o_totalprice")
    val lineitem = Seq((1L, 1.0), (1L, 2.0), (7L, 3.0), (8L, 4.0)) // 2 orphans
      .toDF("l_orderkey", "l_quantity")
    val customer = Seq((10L, "a")).toDF("c_custkey", "c_name")
    val supplier = Seq((1L, 0L), (2L, 5L)).toDF("s_suppkey", "s_nationkey")
    val nation = Seq((0L, "x")).toDF("n_nationkey", "n_name")
    val dir = fixtureDir("orders" -> orders, "lineitem" -> lineitem,
      "customer" -> customer, "supplier" -> supplier, "nation" -> nation)
    val r = operators.ValidateOps.v03.build(spark, dir).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((2L, 1L, 1L)))
  }

  // ------------------------------------------------------------- q42
  test("SCD2 collapses status runs into chained validity intervals") {
    val d = java.sql.Date.valueOf(_: String)
    val orders = Seq(
      // cust 1: O,O,F,O — three versions (run-collapse, not per-order)
      (1L, 101L, d("2024-01-01"), "O"),
      (1L, 102L, d("2024-02-01"), "O"),
      (1L, 103L, d("2024-03-01"), "F"),
      (1L, 104L, d("2024-04-01"), "O"),
      // cust 2: same date ties broken by orderkey: F(201) then O(202)
      (2L, 201L, d("2024-05-01"), "F"),
      (2L, 202L, d("2024-05-01"), "O")
    ).toDF("o_custkey", "o_orderkey", "o_orderdate", "o_orderstatus")
    val dir = fixtureDir("orders" -> orders)
    val got = MergeOps.q42.build(spark, dir)
      .select("o_custkey", "version", "o_orderstatus", "valid_from",
        "valid_to", "is_current", "n_orders")
      .collect()
      // o_orderdate-derived columns are TimestampType since Tables.adapt
      // canonicalizes the time family; compare the date part.
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getTimestamp(3).toLocalDateTime.toLocalDate.toString,
        Option(r.getTimestamp(4)).map(_.toLocalDateTime.toLocalDate.toString),
        r.getBoolean(5), r.getLong(6)))
      .toSeq
    assert(got == Seq(
      (1L, 1L, "O", "2024-01-01", Some("2024-03-01"), false, 2L),
      (1L, 2L, "F", "2024-03-01", Some("2024-04-01"), false, 1L),
      (1L, 3L, "O", "2024-04-01", None, true, 1L),
      (2L, 1L, "F", "2024-05-01", Some("2024-05-01"), false, 1L),
      (2L, 2L, "O", "2024-05-01", None, true, 1L)))
  }

  // ------------------------------------------------------------- t18
  test("mixture sampling keeps rare sources whole and cuts dominant ones") {
    // srcA: 50 docs × 40 tokens (dominant); srcB: 2 docs × 40 tokens (rare)
    val text = (1 to 40).map(i => s"w$i").mkString(" ")
    val docs = ((1 to 50).map(i => (i.toLong, text, "en", "srcA", 200L)) ++
      Seq((100L, text, "en", "srcB", 200L), (101L, text, "en", "srcB", 200L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = fixtureDir("documents" -> docs)
    val got = TextOps.t18.build(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2), r.getLong(3)))
      .toMap
    // rare source: w/f ratio far above 2 → p capped at 1.0, all docs kept
    assert(got("srcB") == ((1.0, 2L, 80L)))
    // dominant source: p = ½·w/f < 1 and the digest gate cuts roughly p·n
    val (pA, keptA, _) = got("srcA")
    assert(pA < 1.0 && keptA < 50 && keptA > 0)
  }

  // ------------------------------------------------------------- s07
  test("PQ encode assigns each subvector its nearest seed centroid, ties to smaller id") {
    // 8 seed vectors: vec k = constant k across all 64 dims, except seed 1
    // duplicates seed 0 → any vector nearest to them must code 0 (tie rule)
    def const(x: Float) = Seq.fill(64)(x)
    val seeds = (0 until 8).map(k =>
      (k.toLong, if (k == 1) const(0f) else const(k.toFloat), 0))
    val probes = Seq(
      (100L, const(0.2f), 0), // nearest 0 (and dup 1) in all subspaces → 0
      (101L, const(6.8f), 0), // nearest 7
      (102L, (Seq.fill(16)(2.1f) ++ Seq.fill(48)(4.9f)).toSeq, 0)) // 2 then 5
    val emb = (seeds ++ probes).toDF("vec_id", "embedding", "label")
    val dir = fixtureDir("embeddings" -> emb)
    val got = operators.SimilarityOps.s07.build(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got(100L) == ((0L, 0L, 0L, 0L)))
    assert(got(101L) == ((7L, 7L, 7L, 7L)))
    assert(got(102L) == ((2L, 5L, 5L, 5L)))
    // seeds code to themselves (except the duplicate, which ties to 0)
    assert(got(0L) == ((0L, 0L, 0L, 0L)))
    assert(got(1L) == ((0L, 0L, 0L, 0L)))
    assert(got(7L) == ((7L, 7L, 7L, 7L)))
  }

  // ------------------------------------------------------------- e11
  test("hourly anomaly flags the spike hour with the hand-computed z") {
    // type a: 11 hours of 1 event + a 12-hour spike of 12 events.
    // power sums: s1=23, s2=155, cnt=12 → mean=23/12, var=10.0833…,
    // z(spike)=10.0833/sqrt(10.0833)=sqrt(var)=3.1754. Type b is
    // constant → variance 0 → filtered, never a NaN row.
    val base = 1704067200L * 1000000000L // 2024-01-01 00:00:00 UTC in nanos
    def at(hour: Int, j: Int) = base + hour * 3600L * 1000000000L + j * 1000000000L
    val events =
      ((0 until 11).map(h => ("a", at(h, 0))) ++
        (0 until 12).map(j => ("a", at(11, j))) ++
        (0 until 4).map(h => ("b", at(h, 0)))).toDF("event_type", "ts")
    val dir = fixtureDir("events" -> events)
    val got = operators.EventOps.e11.build(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(("a", "2024-01-01 11:00", 12L, 3.1754)))
  }

  // ------------------------------------------------------------- t17
  test("unigram logprob golden: hand-computed means") {
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val dir = fixtureDir("documents" -> docs)
    val got = TextOps.t17.build(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    // counts: a=2 b=2 c=1, total=5
    // doc 1: tokens a,a,b → all p=0.4 → avg log10 = -0.3979
    // doc 2: (log10(0.4) + log10(0.2)) / 2 = -0.5485
    assert(got == Seq((1L, -0.3979, 3L), (2L, -0.5485, 2L)))
  }
}
