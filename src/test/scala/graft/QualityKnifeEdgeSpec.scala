package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the exact-integer round-half-up semantics of the t04 quality
  * score at a TRUE decimal knife edge — the class of divergence the
  * first sf1.0 oracle board caught (r14): a doc whose quality rational
  * is EXACTLY 0.93125, where `round(double, 4)` was engine-dependent
  * (Spark's decimal-string HALF_UP of the FMA-contracted double said
  * .9312, DuckDB's float-multiply round said .9313). The integer form
  * must say .9313 — half-up of the exact rational — everywhere, and
  * d15's winner selection must rank with the same score.
  *
  * The doc is built to hit the rational exactly:
  * n_tokens=66 (5 stopwords), alpha_chars=271, length=352 →
  * num = 5000·66·352 + 3000·61·352 + 2000·271·66 = 216,348,000,
  * den = 66·352 = 23,232; num/den = 9312.5 exactly. */
class QualityKnifeEdgeSpec extends AnyFunSuite {

  lazy val spark = Session.builder("graft-knife-test").master("local[2]")
    .config("spark.sql.shuffle.partitions", "2").getOrCreate()

  private lazy val knifeText: String = {
    val stops = Seq("the", "a", "of", "and", "to") // 5 tokens, 11 alpha
    val filler = Seq.fill(45)("abcd") ++ Seq.fill(16)("abcde") // 260 alpha
    val toks = stops ++ filler // 66 tokens, 271 alpha, 65 spaces
    toks.mkString(" ") + "0123456789012345" // 16 digits → length 352
  }

  test("fixture arithmetic: the doc sits exactly on the half") {
    assert(knifeText.length == 352)
    assert(knifeText.count(_.isLetter) == 271)
    assert(knifeText.split(" ").count(_.nonEmpty) == 66)
    val num = 5000L * 66 * 352 + 3000L * 61 * 352 + 2000L * 271 * 66
    assert(num == 216348000L && num % 23232L == 11616L,
      s"num=$num — the rational must be exactly X.5/10^4") // 11616 = den/2
  }

  lazy val dir: String = {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-knife").toString
    Seq((0L, knifeText), (1L, "the quick brown fox jumps"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("src"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    d
  }

  test("t04 rounds the exact half UP, independent of float paths") {
    val row = Queries.byName("t04_quality_score").build(spark, dir)
      .filter(col("doc_id") === 0L).head()
    assert(row.getAs[Double]("quality") == 0.9313,
      s"half-up of exactly 0.93125 must be 0.9313, got $row")
    assert(row.getAs[Long]("n_tokens") == 66L)
  }

  test("the three ratio columns stay exact decimals at 4 digits") {
    val row = Queries.byName("t04_quality_score").build(spark, dir)
      .filter(col("doc_id") === 0L).head()
    // 5/66 = 0.0757575… → .0758; 271/352 = 0.76988… → .7699
    assert(row.getAs[Double]("stop_ratio") == 0.0758)
    assert(row.getAs[Double]("alpha_ratio") == 0.7699)
  }
}
