package graft

import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native expressions must agree bit-for-bit with the HOF formulations
  * they replaced (same summation order), in both codegen and interpreted
  * paths, and be callable from SQL after registration. */
class VectorExpressionsSpec extends AnyFunSuite {

  lazy val spark = Session.builder("graft-test").master("local[4]")
    .config("spark.sql.shuffle.partitions", "4").getOrCreate()

  test("cosine_similarity equals the aggregate/zip_with formulation") {
    import spark.implicits._
    val rnd = new scala.util.Random(1)
    val df = Seq.fill(50)((
      Seq.fill(64)(rnd.nextDouble() - 0.5),
      Seq.fill(64)(rnd.nextDouble() - 0.5))).toDF("a", "b")
    val got = df.select(
      VectorFunctions.cosine_similarity(col("a"), col("b")).as("c1"),
      (expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, x) -> acc + x)") /
        (sqrt(expr("aggregate(a, 0D, (acc, x) -> acc + x * x)")) *
          sqrt(expr("aggregate(b, 0D, (acc, x) -> acc + x * x)")))).as("c2"))
      .collect()
    got.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1)) // bit-identical, not approx
    }
  }

  test("jaccard_similarity equals the array_intersect formulation") {
    import spark.implicits._
    val rnd = new scala.util.Random(2)
    val vocab = ('a' to 'z').map(_.toString)
    val df = Seq.fill(50)((
      Seq.fill(20)(vocab(rnd.nextInt(26))).distinct,
      Seq.fill(20)(vocab(rnd.nextInt(26))).distinct)).toDF("a", "b")
    val got = df.select(
      VectorFunctions.jaccard_similarity(col("a"), col("b")).as("j1"),
      (size(array_intersect(col("a"), col("b"))) /
        (size(col("a")) + size(col("b")) - size(array_intersect(col("a"), col("b"))))).as("j2"))
      .collect()
    got.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("SQL registration exposes both functions") {
    VectorFunctions.register(spark)
    val r = spark.sql(
      """SELECT cosine_similarity(array(1D, 0D), array(1D, 0D)) AS c,
               jaccard_similarity(array('x','y'), array('y','z')) AS j""")
      .collect().head
    assert(r.getDouble(0) == 1.0)
    assert(math.abs(r.getDouble(1) - 1.0 / 3.0) < 1e-15)
  }

  test("type check rejects non-double arrays") {
    import spark.implicits._
    val df = Seq((Seq(1, 2), Seq(3, 4))).toDF("a", "b")
    val ex = intercept[Exception] {
      df.select(VectorFunctions.cosine_similarity(col("a"), col("b"))).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("array<double>") ||
      ex.getMessage.toLowerCase.contains("data type mismatch"))
  }
}
