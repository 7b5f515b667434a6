package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins q46's Morton-interleave bit math on hand-computed values and
  * quantifies the point of the layout: per-file min/max stats under the
  * z-order binning must prune most files on BOTH key dimensions, while an
  * insertion-order layout (files = arrival order) prunes neither.
  */
class ZOrderSpec extends AnyFunSuite {

  lazy val spark = Session.builder("graft-test").master("local[4]")
    .config("spark.sql.shuffle.partitions", "4").getOrCreate()

  val sf = "/root/testdata/sf0.001"

  test("morton interleave matches hand-computed bit layout") {
    import spark.implicits._
    // even=5 (101b) → bits at z-positions 0,4; odd=3 (011b) → 1,3.
    // even=0,odd=0 → 0; even=1,odd=1 → 3; even=2^9 (top bucket bit) → 2^18.
    val df = Seq((5L, 3L), (0L, 0L), (1L, 1L), (1L << 9, 0L))
      .toDF("e", "o")
      .withColumn("z", operators.Relational.zOrder(col("e"), col("o")))
    val got = df.select("z").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L + 2 + 8 + 16, 0L, 3L, 1L << 18))
  }

  test("z-order files prune both dimensions; insertion order prunes neither") {
    val layout = Queries.byName("q46_zorder_layout").build(spark, sf)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    // Range normalization fills the 2^20 grid near-uniformly, so most of
    // the 64 equal-width z-cells materialize even at sf0.001.
    val nFiles = layout.length
    assert(nFiles >= 32, s"expected most of 64 z-files occupied, got $nFiles")

    // Insertion-order baseline: same file count over arrival order.
    val li = Tables.df(spark, sf, "lineitem")
      .select("l_partkey", "l_suppkey", "l_orderkey", "l_linenumber")
    val rows = li.orderBy("l_orderkey", "l_linenumber").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val per = math.ceil(rows.length.toDouble / nFiles).toInt
    val insertion = rows.grouped(per).map { g =>
      (g.length.toLong, g.map(_._1).min, g.map(_._1).max, g.map(_._2).min, g.map(_._2).max)
    }.toArray

    val partProbes = Seq(10L, 77L, 150L)
    val suppProbes = Seq(2L, 5L, 9L)
    def overlapPart(files: Array[(Long, Long, Long, Long, Long)], p: Long) =
      files.count(f => f._2 <= p && p <= f._3)
    def overlapSupp(files: Array[(Long, Long, Long, Long, Long)], v: Long) =
      files.count(f => f._4 <= v && v <= f._5)

    for (p <- partProbes) {
      val zHit = overlapPart(layout, p)
      val insHit = overlapPart(insertion, p)
      assert(zHit < insHit, s"partkey=$p z=$zHit insertion=$insHit")
      assert(zHit <= nFiles / 4, s"partkey=$p z-order should prune >75%, hit $zHit/$nFiles")
    }
    for (v <- suppProbes) {
      val zHit = overlapSupp(layout, v)
      assert(zHit <= nFiles / 2, s"suppkey=$v z-order hit $zHit/$nFiles")
      // insertion order is key-oblivious: essentially every file overlaps
      assert(overlapSupp(insertion, v) > nFiles * 3 / 4)
    }
  }
}
