package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE-shaped upsert over immutable columnar storage — the dataset
  * refresh primitive (apply a day's corrections + additions to a 100 TB
  * snapshot). The reference's storage is whole-file put/get with no
  * update concept (SURVEY §2.1); lakehouse-style table formats implement
  * MERGE as exactly this join-and-rewrite, so the operator is the
  * portable core of that behavior.
  *
  * Scale shape: ONE shuffle (full-outer hash join on the key; broadcast
  * when the update batch is small — the common case). The rewrite is
  * then a partition-aligned write of only the partitions that changed;
  * here we return the merged frame and leave placement to the caller.
  */
object MergeOps {

  /** `target` rows overridden by same-key `updates` rows; update-only
    * keys are inserted; all other target rows pass through. Schemas must
    * match. Update rows win wholesale (including their nulls) — matched
    * rows are replaced, not patched. */
  def upsert(target: DataFrame, updates: DataFrame, key: String): DataFrame = {
    require(target.columns.sameElements(updates.columns),
      s"schema mismatch: ${target.columns.mkString(",")} vs ${updates.columns.mkString(",")}")
    val t = target.alias("t")
    // presence flag, NOT `u.key IS NOT NULL`: a null-key update row never
    // joins, and testing the key would route its columns to the (all-null)
    // t side — emitting a phantom all-NULL row instead of the update
    val u = updates.withColumn("__from_update", lit(true)).alias("u")
    val cols = target.columns.toSeq
    t.join(u, col(s"t.$key") === col(s"u.$key"), "full_outer")
      .select(cols.map(c =>
        when(col("u.__from_update").isNotNull, col(s"u.$c"))
          .otherwise(col(s"t.$c")).as(c)): _*)
  }

  // ---------------------------------------------------------------- q35
  /** Upsert demo on orders: every 7th order re-priced +10% (update),
    * every 97th re-keyed into a new id range (insert), then profiled by
    * status. The oracle replays the same merge as UNION ALL + anti-key
    * logic — identical result through a completely different formulation. */
  val q35 = Q("q35_upsert",
    (s, dir) => {
      val orders = Tables.df(s, dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      // Reprice in exact decimal, not double: round(double*1.1, 2) tie-breaks
      // differently across engines (Spark renders the double and HALF_UPs the
      // decimal string; DuckDB rounds in scaled double arithmetic), so ~1 in
      // 10^3 repriced rows diverge by a cent and poison every sum downstream.
      // decimal(18,2) * decimal(2,1) → exact product; HALF_UP to 2 places is
      // defined identically everywhere; cast back to double is correctly
      // rounded on both engines.
      val updates = orders.filter(col("o_orderkey") % 7 === 0)
        .withColumn("o_totalprice",
          round(col("o_totalprice").cast("decimal(18,2)") * lit(BigDecimal("1.1")), 2)
            .cast("double"))
        .union(orders.filter(col("o_orderkey") % 97 === 0)
          .withColumn("o_orderkey", col("o_orderkey") + 100000000L))
      MergeOps.upsert(orders, updates, "o_orderkey")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          round(sum("o_totalprice"), 2).as("total"))
        .orderBy("o_orderstatus")
    },
    Some("""
      WITH upd AS (
        SELECT o_orderkey, o_orderstatus,
               CAST(round(CAST(o_totalprice AS DECIMAL(18,2)) * 1.1, 2) AS DOUBLE)
                 AS o_totalprice
        FROM orders WHERE o_orderkey % 7 = 0
        UNION ALL
        SELECT o_orderkey + 100000000, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 97 = 0),
      merged AS (
        SELECT * FROM upd
        UNION ALL
        SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd))
      SELECT o_orderstatus, count(*) AS n,
             round(sum(o_totalprice), 2) AS total
      FROM merged
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus"""))

  // ---------------------------------------------------------------- q42
  /** SCD Type-2 history build — the other half of dimension maintenance
    * next to q35's MERGE: collapse each customer's order-status timeline
    * into versioned validity intervals, emitting a new version only when
    * the tracked attribute CHANGES (gaps-and-islands, not one row per
    * event). `valid_to` is the next version's `valid_from`; the open
    * interval is flagged `is_current` — the standard shape a warehouse
    * time-travel join expects.
    *
    * Scale shape: two window passes partitioned by customer (change
    * marking + run numbering), one partial-agg roll-up per run, one more
    * per-customer window for valid_to. Every stage is keyed by customer
    * — bounded by orders-per-customer, embarrassingly parallel across
    * customers, no global sort. */
  val q42 = Q("q42_scd2_history",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val runs = Tables.df(s, dir, "orders")
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_orderstatus")
        .withColumn("chg",
          when(lag("o_orderstatus", 1).over(w).isNull ||
            lag("o_orderstatus", 1).over(w) =!= col("o_orderstatus"), 1)
            .otherwise(0))
        .withColumn("version", sum("chg")
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val iv = runs.groupBy("o_custkey", "version", "o_orderstatus")
        .agg(min("o_orderdate").as("valid_from"),
          count(lit(1)).as("n_orders"))
      val wv = Window.partitionBy("o_custkey").orderBy("version")
      iv.withColumn("valid_to", lead("valid_from", 1).over(wv))
        .withColumn("is_current", col("valid_to").isNull)
        .select("o_custkey", "version", "o_orderstatus", "valid_from",
          "valid_to", "is_current", "n_orders")
        .orderBy("o_custkey", "version")
    },
    Some("""
      WITH runs AS (
        SELECT o_custkey, o_orderkey, o_orderdate, o_orderstatus,
               CASE WHEN lag(o_orderstatus) OVER w IS NULL
                      OR lag(o_orderstatus) OVER w <> o_orderstatus
                    THEN 1 ELSE 0 END AS chg
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey)),
      numbered AS (
        SELECT *, CAST(sum(chg) OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate, o_orderkey
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT)
                    AS version
        FROM runs),
      iv AS (
        SELECT o_custkey, version, o_orderstatus,
               min(o_orderdate) AS valid_from, count(*) AS n_orders
        FROM numbered
        GROUP BY o_custkey, version, o_orderstatus)
      SELECT o_custkey, version, o_orderstatus, valid_from,
             lead(valid_from) OVER (PARTITION BY o_custkey ORDER BY version)
               AS valid_to,
             lead(valid_from) OVER (PARTITION BY o_custkey ORDER BY version)
               IS NULL AS is_current,
             n_orders
      FROM iv
      ORDER BY o_custkey, version"""))

  val queries: Seq[Q] = Seq(q35, q42)
}
