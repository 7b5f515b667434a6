package graft

import graft.functions.MinHashAgg.minhash_agg
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The sketch aggregate must equal the 64-separate-min formulation it
  * replaced, merge correctly across partitions, and be SQL-callable via
  * GraftExtensions. */
class MinHashAggSpec extends AnyFunSuite {

  lazy val spark = Session.builder("graft-test").master("local[4]")
    .config("spark.sql.shuffle.partitions", "4").getOrCreate()

  private val P = 2147483647L

  test("sketch equals per-column min formulation across partitions") {
    import spark.implicits._
    val rnd0 = new scala.util.Random(9)
    val rows = Seq.tabulate(500)(i => (i % 7L, rnd0.nextLong().abs % P))
    val df = rows.toDF("g", "wh").repartition(8) // force partial/merge path

    val sketch = df.groupBy("g").agg(minhash_agg(col("wh"), 64, 42L).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap

    val rnd = new scala.util.Random(42L) // same family as MinHashAgg(seed=42)
    val ab = Array.fill(64)((1 + rnd.nextLong().abs % (P - 1), rnd.nextLong().abs % P))
    val mins = ab.zipWithIndex.map { case ((a, b), i) =>
      min(pmod(lit(a) * col("wh") + lit(b), lit(P))).as(s"h$i")
    }
    val manual = df.groupBy("g").agg(mins.head, mins.tail: _*)
      .collect().map(r => r.getLong(0) -> (1 to 64).map(r.getLong(_)).toVector).toMap

    assert(sketch == manual)
  }

  test("SQL registration via extensions") {
    import spark.implicits._
    Seq((1L, 10L), (1L, 20L), (2L, 30L)).toDF("g", "wh")
      .createOrReplaceTempView("mh_in")
    val sig = spark.sql("SELECT g, minhash_agg(wh) AS sig FROM mh_in GROUP BY g")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sig(1L).length == 64)
    assert(sig.keySet == Set(1L, 2L))
    // per-element minimum property: singleton group == elementwise min participant
    val s1 = spark.sql("SELECT minhash_agg(wh) FROM mh_in WHERE wh = 10")
      .collect().head.getSeq[Long](0)
    sig(1L).zip(s1).foreach { case (m, x) => assert(m <= x) }
  }
}
