package graft

import graft.streaming.StreamDedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

case class InDoc(doc_id: Long, text: String)

/** Pins the streaming near-dup gate: (1) the expression-space MinHash
  * signature is bit-identical to the MinHashAgg aggregate path (the d02
  * contract — if these diverge, stream and batch dedup silently disagree
  * on candidates); (2) the matcher equals d02 restricted to
  * (incoming × corpus) pairs on real data; (3) streaming execution over
  * micro-batches emits exactly the batch result with no state. */
class StreamDedupSpec extends AnyFunSuite {

  lazy val spark = Session.builder("graft-streamdedup-test").master("local[4]")
    .config("spark.sql.shuffle.partitions", "4").getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("expression-space signature is bit-identical to the MinHashAgg path") {
    val docs = Tables.df(spark, sf, "documents").limit(50)
    val words = docs.select(col("doc_id"),
      expr("array_distinct(filter(split(text, ' '), x -> x != ''))").as("words"))
      .filter(size(col("words")) > 0)
    val viaExpr = words
      .withColumn("sig", StreamDedup.sigExpr("words"))
      .select("doc_id", "sig")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val viaAgg = words
      .select(col("doc_id"), explode(col("words")).as("w"))
      .withColumn("wh", pmod(xxhash64(col("w")), lit(2147483647L)))
      .groupBy("doc_id")
      .agg(functions.MinHashAgg.minhash_agg(col("wh"), 64, 42L).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaExpr.keySet == viaAgg.keySet && viaExpr.nonEmpty)
    viaExpr.foreach { case (id, sig) => assert(sig == viaAgg(id), s"doc $id") }
  }

  test("batch matcher equals d02 restricted to incoming-vs-corpus pairs") {
    val docs = Tables.df(spark, sf, "documents")
    val corpus = docs.filter(col("doc_id") < 250).select("doc_id", "text")
    val incoming = docs.filter(col("doc_id") >= 250).select("doc_id", "text")
    val idx = StreamDedup.corpusIndex(corpus)
    val got = StreamDedup.matchesAgainstCorpus(incoming, idx)
      .collect().map(r => (r.getLong(1), r.getLong(0), r.getDouble(2))).toSet
    // pure-LSH d02 (hot-bucket routing disabled): identical signatures →
    // identical band collisions → identical pair set after exact verify
    val d02 = operators.DedupOps.nearDupPairs(spark, sf, maxBucket = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter { case (a, b, _) => a < 250 && b >= 250 }.toSet
    assert(got == d02 && got.nonEmpty, s"got ${got.size} vs d02 ${d02.size}")
  }

  test("streaming micro-batches emit exactly the batch result, stateless") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
        "lam mu nu xi omicron pi rho sigma tau upsilon"),
      (1L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    val idx = StreamDedup.corpusIndex(corpus).localCheckpoint()
    // 100: near-dup of 0 (19 shared + 1 new of 21 words); 101: exact dup
    // of 1; 102: unrelated
    val nearDup = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lam mu nu xi omicron pi rho sigma tau NEWWORD"
    val in = Seq(
      InDoc(100L, nearDup),
      InDoc(101L, "one two three four five six seven eight nine ten"),
      InDoc(102L, "completely different vocabulary about spark plans here"))

    val batchResult = StreamDedup
      .matchesAgainstCorpus(in.toDF(), idx, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(batchResult.map(t => (t._1, t._2)) == Set((100L, 0L), (101L, 1L)))

    val stream = MemoryStream[InDoc]
    val q = StreamDedup
      .matchesAgainstCorpus(stream.toDF(), idx, threshold = 0.9)
      .writeStream.format("memory").queryName("dedup_hits")
      .outputMode("append").start()
    stream.addData(in.head)
    q.processAllAvailable()
    stream.addData(in.tail: _*)
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("dedup_hits")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed == batchResult)
  }
}
