package graft

import graft.functions.MisraGriesAgg
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Pins the Misra–Gries candidate guarantee (superset of every item with
  * true frequency > n/(k+1)) and the two-pass exact-heavy-hitter
  * composition (t24) on adversarial streams where the decrement and merge
  * paths genuinely fire, plus partitioning invariance — the property a
  * partial-merge aggregate must hold for its answer to be well-defined on
  * a cluster.
  */
class MisraGriesSpec extends AnyFunSuite {

  lazy val spark = Session.builder("graft-test").master("local[4]")
    .config("spark.sql.shuffle.partitions", "4").getOrCreate()

  private def summary(words: Seq[String], k: Int, nPart: Int): (Long, Seq[String]) = {
    import spark.implicits._
    val row = words.toDF("w").repartition(nPart)
      .agg(MisraGriesAgg.mg_sketch(col("w"), k).as("sk"))
      .select(col("sk.total"), col("sk.keys"))
      .head()
    (row.getLong(0), row.getSeq[String](1))
  }

  test("candidates are a superset of true heavy hitters on a skewed stream") {
    val rnd = new Random(42)
    // Zipf-ish: item i appears ~ 3000/i times, plus uniform noise tail.
    val words = rnd.shuffle(
      (1 to 40).flatMap(i => Seq.fill(3000 / i)(s"hh_$i")) ++
        (1 to 2000).map(i => s"noise_${i % 500}"))
    val k = 10
    val n = words.size
    val exact = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val trueHH = exact.filter(_._2 > n.toDouble / (k + 1)).keySet
    assert(trueHH.nonEmpty, "fixture must have true heavy hitters")

    for (nPart <- Seq(1, 7)) {
      val (total, cand) = summary(words, k, nPart)
      assert(total == n.toLong)
      assert(cand.size <= k)
      assert(trueHH.subsetOf(cand.toSet),
        s"nPart=$nPart missing ${trueHH -- cand.toSet}")
    }
  }

  test("two-pass composition equals the exact HAVING-threshold answer") {
    import spark.implicits._
    val rnd = new Random(7)
    val words = rnd.shuffle(
      Seq.fill(500)("alpha") ++ Seq.fill(300)("beta") ++ Seq.fill(120)("gamma") ++
        (1 to 800).map(i => s"tail_${i % 200}"))
    val k = 8
    val n = words.size

    val exact = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
      .filter(_._2 > n.toDouble / (k + 1))

    val tok = words.toDF("word").repartition(5)
    val cand = tok.agg(MisraGriesAgg.mg_sketch(col("word"), k).as("sk"))
      .select(col("sk.total").as("total"), explode(col("sk.keys")).as("word"))
    val got = tok.join(broadcast(cand), "word")
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"), max("total").as("total"))
      .where(col("cnt") > col("total") / lit((k + 1).toDouble))
      .select("word", "cnt")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    assert(got == exact)
  }

  test("summary is invariant to partitioning even when merge must re-cut") {
    // Vocabulary (60) ≫ k (5): every partial fills, merges exceed k and
    // take the subtract-(k+1)th-largest path. The kept KEY SET may legally
    // differ from the 1-partition run below threshold, but the guarantee
    // set and total must agree — and the final two-pass answer must be
    // identical across partitionings.
    import spark.implicits._
    val rnd = new Random(99)
    val words = rnd.shuffle(
      Seq.fill(2000)("big") ++ Seq.fill(900)("mid") ++
        (1 to 3000).map(i => s"t_${i % 60}"))
    val k = 5
    val n = words.size
    val trueHH = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
      .filter(_._2 > n.toDouble / (k + 1))

    val answers = Seq(1, 3, 11).map { nPart =>
      val tok = words.toDF("word").repartition(nPart)
      val cand = tok.agg(MisraGriesAgg.mg_sketch(col("word"), k).as("sk"))
        .select(col("sk.total").as("total"), explode(col("sk.keys")).as("word"))
      tok.join(broadcast(cand), "word")
        .groupBy("word")
        .agg(count(lit(1)).as("cnt"), max("total").as("total"))
        .where(col("cnt") > col("total") / lit((k + 1).toDouble))
        .select("word", "cnt")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    answers.foreach(a => assert(a == trueHH))
  }

  test("property: guarantee holds on 200 random streams × 3 partitionings") {
    import spark.implicits._
    val rnd = new Random(123)
    val k = 8
    // trial mix: zipf-ish heads, uniform noise, adversarial alternating
    // runs — sized so decrements fire in most trials
    val trials: Seq[(Int, Seq[String])] = (0 until 200).map { t =>
      val style = t % 3
      val words = style match {
        case 0 => (1 to 20).flatMap(i => Seq.fill(rnd.nextInt(200) / i + 1)(s"h$i")) ++
          (1 to 300).map(_ => s"n${rnd.nextInt(100)}")
        case 1 => (1 to 500).map(_ => s"u${rnd.nextInt(30)}")
        case 2 => (1 to 400).map(i => if (i % 2 == 0) "dom" else s"alt${i % 40}")
      }
      t -> rnd.shuffle(words.toList)
    }
    val exact: Map[Int, Map[String, Long]] = trials.map { case (t, ws) =>
      t -> ws.groupBy(identity).view.mapValues(_.size.toLong).toMap
    }.toMap
    val rows = trials.flatMap { case (t, ws) => ws.map(t -> _) }

    for (nPart <- Seq(1, 6, 31)) {
      val got = rows.toDF("trial", "word").repartition(nPart)
        .groupBy("trial")
        .agg(MisraGriesAgg.mg_sketch(col("word"), k).as("sk"))
        .select(col("trial"), col("sk.total"), col("sk.keys"))
        .collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getSeq[String](2))).toSeq
      assert(got.size == trials.size)
      got.foreach { case (t, total, cand) =>
        val ex = exact(t)
        val n = ex.values.sum
        assert(total == n, s"trial $t nPart=$nPart")
        assert(cand.size <= k, s"trial $t nPart=$nPart size=${cand.size}")
        val heavy = ex.filter(_._2 > n.toDouble / (k + 1)).keySet
        assert(heavy.subsetOf(cand.toSet),
          s"trial $t nPart=$nPart missing ${heavy -- cand.toSet}")
      }
    }
  }

  test("null keys are ignored and do not count toward the total") {
    import spark.implicits._
    val df = Seq(Some("a"), None, Some("a"), Some("b"), None).toDF("w")
    val row = df.agg(MisraGriesAgg.mg_sketch(col("w"), 4).as("sk"))
      .select(col("sk.total"), col("sk.keys")).head()
    assert(row.getLong(0) == 3L)
    assert(row.getSeq[String](1).sorted == Seq("a", "b"))
  }
}
