package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-mitigation join shapes.
  *
  * A shuffled equi-join hashes rows to partitions BY KEY, so one hot key
  * = one straggler task no matter how many executors exist. AQE's skew
  * handling splits oversized partitions at runtime and is the right
  * default; explicit salting remains the tool when (a) the skew is in an
  * aggregation-feeding join AQE can't split (the hot key must still meet
  * in one task), or (b) the runtime stats arrive too late because the
  * hot partition already OOM'd. The reference engine partitions reduce
  * tasks by plain key hash (`SURVEY §2.5` X1-X3) and has no skew story —
  * this is extension surface.
  */
object SkewOps {

  /** Equi-join `big ⋈ small` on `key`, with the big side's rows spread
    * over `salts` sub-partitions per key and the small side replicated
    * `salts`×. The hot key's probe rows land on `salts` tasks instead of
    * one; cost is a bounded small-side blow-up (rows × salts), the
    * standard trade. The salt hashes the row's content TOGETHER WITH its
    * physical position (monotonically_increasing_id = partition id +
    * in-partition index): content alone would send exact-duplicate hot
    * rows — the nastiest real skew, a crawled boilerplate page repeated
    * a million times — to one salt. No rand(): position is stable for a
    * fixed input layout, so retries and re-runs route identically. The
    * salt only routes; the join RESULT is position-independent. Inner
    * joins only (replication would duplicate unmatched outer rows). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val saltedBig = big.withColumn("__salt", saltCol(big, salts))
    val replicated = small.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedBig.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** The routing salt for [[saltedJoin]]'s big side (exposed for the
    * duplicate-hot-row spread test). */
  private[graft] def saltCol(big: DataFrame, salts: Int) =
    pmod(xxhash64(struct(big.columns.map(col): _*),
      monotonically_increasing_id()), lit(salts)).cast("int")

  // ---------------------------------------------------------------- j02
  /** Order-priority revenue through a salted lineitem⋈orders join. The
    * salt is plan-internal — the result is byte-identical to the plain
    * join (which is the oracle), making the rewrite itself the thing
    * under test. */
  val j02 = Q("j02_salted_join",
    (s, dir) => {
      val li = Tables.df(s, dir, "lineitem")
        .select(col("l_orderkey").as("o_orderkey"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
      val ord = Tables.df(s, dir, "orders").select("o_orderkey", "o_orderpriority")
      saltedJoin(li, ord, "o_orderkey", salts = 8)
        .groupBy("o_orderpriority")
        .agg(round(sum("rev"), 2).as("revenue"), count(lit(1)).as("n_items"))
        .orderBy("o_orderpriority")
    },
    Some("""
      SELECT o_orderpriority,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
             count(*) AS n_items
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority"""))

  val queries: Seq[Q] = Seq(j02)
}
