package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
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

  /** Row-level diff of two same-schema snapshots on a unique key: which
    * rows were `added`, `removed`, or `changed` (any non-key column
    * differs) between versions. Unchanged rows are dropped — the diff of
    * a 100 TB snapshot pair is sized by the churn, not the corpus. */
  /** Persist two snapshots as tables BUCKETED AND SORTED on the merge
    * key and hand back their re-read frames — the storage layout a
    * 100 TB CDC pipeline keeps snapshots in. Every join in this family
    * (q35 upsert, q42 history, q43 diff) keys on the same column, so
    * bucketed snapshots co-locate and the full-outer/outer joins run
    * with ZERO Exchange: the snapshots shuffle once at WRITE time and
    * never again, instead of once per query. BucketedJoinSpec pins the
    * exchange-free plan and result parity with the unbucketed path. */
  def bucketedSnapshots(s: SparkSession, oldDf: DataFrame, newDf: DataFrame,
      key: String, buckets: Int, oldName: String, newName: String):
      (DataFrame, DataFrame) = {
    // a managed-table LOCATION left by a previous application (fresh
    // catalog, stale directory) fails saveAsTable with
    // LOCATION_ALREADY_EXISTS — drop + delete first (idempotent)
    Seq(oldName, newName).foreach { n =>
      s.sql(s"DROP TABLE IF EXISTS `$n`")
      val loc = new org.apache.hadoop.fs.Path(
        s.sessionState.catalog.defaultTablePath(
          org.apache.spark.sql.catalyst.TableIdentifier(n)))
      val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
    oldDf.write.mode("overwrite").bucketBy(buckets, key).sortBy(key)
      .saveAsTable(oldName)
    newDf.write.mode("overwrite").bucketBy(buckets, key).sortBy(key)
      .saveAsTable(newName)
    (s.table(oldName), s.table(newName))
  }

  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, key: String): DataFrame = {
    require(oldDf.columns.sameElements(newDf.columns),
      s"schema mismatch: ${oldDf.columns.mkString(",")} vs ${newDf.columns.mkString(",")}")
    val valueCols = oldDf.columns.filterNot(_ == key).toSeq
    // presence flags, not key-null tests (the q35 upsert lesson): a row
    // with a NULL key must read as present-on-its-side, not as a miss
    val o = oldDf.withColumn("__in_old", lit(true)).alias("o")
    val n = newDf.withColumn("__in_new", lit(true)).alias("n")
    val changed = valueCols
      .map(c => !(col(s"o.$c") <=> col(s"n.$c")))
      .reduce(_ || _)
    o.join(n, col(s"o.$key") === col(s"n.$key"), "full_outer")
      .withColumn("diff",
        when(col("o.__in_old").isNull, lit("added"))
          .when(col("n.__in_new").isNull, lit("removed"))
          .when(changed, lit("changed")))
      .filter(col("diff").isNotNull)
      .select(coalesce(col(s"o.$key"), col(s"n.$key")).as(key) +:
        col("diff") +:
        valueCols.flatMap(c => Seq(col(s"o.$c").as(s"old_$c"),
          col(s"n.$c").as(s"new_$c"))): _*)
  }

  // ---------------------------------------------------------------- q43
  /** Snapshot diff — the audit view of dataset versioning, completing the
    * CDC family (q35 applies changes, q42 keeps history, q43 answers
    * "what changed between v1 and v2"). Fixture: v1 drops every 7th
    * order, v2 drops every 5th and reprices every 3rd (+10%, in exact
    * decimal — the q35 discipline), so all three diff classes appear.
    *
    * Scale shape: ONE full-outer hash join on the key — both snapshots
    * shuffle once (bucketed snapshots co-locate and skip even that),
    * the change predicate is expression-space, and output is churn-sized.
    * The summary roll-up is a 3-key partial agg. */
  val q43 = Q("q43_snapshot_diff",
    (s, dir) => {
      val orders = Tables.df(s, dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      val v1 = orders.filter(col("o_orderkey") % 7 =!= 0)
      val v2 = orders.filter(col("o_orderkey") % 5 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 3 === 0,
            round(col("o_totalprice").cast("decimal(18,2)") * lit(BigDecimal("1.1")), 2)
              .cast("double"))
            .otherwise(col("o_totalprice")))
      // per-row price delta accumulated in decimal(18,2): a double sum's
      // accumulation order differs between engines (and partitionings),
      // so a half-cent knife-edge could flip the rounded total — the
      // decimal cast makes every partial sum exact on both engines
      snapshotDiff(v1, v2, "o_orderkey")
        .groupBy("diff")
        .agg(count(lit(1)).as("n"),
          sum((coalesce(col("new_o_totalprice"), lit(0.0)) -
            coalesce(col("old_o_totalprice"), lit(0.0)))
            .cast("decimal(18,2)")).cast("double").as("net_value"))
        .orderBy("diff")
    },
    Some("""
      WITH v1 AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 7 <> 0),
      v2 AS (
        SELECT o_orderkey, o_orderstatus,
               CASE WHEN o_orderkey % 3 = 0
                    THEN CAST(round(CAST(o_totalprice AS DECIMAL(18,2)) * 1.1, 2)
                              AS DOUBLE)
                    ELSE o_totalprice END AS o_totalprice
        FROM orders WHERE o_orderkey % 5 <> 0),
      d AS (
        SELECT coalesce(v1.o_orderkey, v2.o_orderkey) AS o_orderkey,
               CASE WHEN v1.o_orderkey IS NULL THEN 'added'
                    WHEN v2.o_orderkey IS NULL THEN 'removed'
                    WHEN v1.o_orderstatus IS DISTINCT FROM v2.o_orderstatus
                      OR v1.o_totalprice IS DISTINCT FROM v2.o_totalprice
                    THEN 'changed' END AS diff,
               v1.o_totalprice AS old_p, v2.o_totalprice AS new_p
        FROM v1 FULL OUTER JOIN v2 ON v1.o_orderkey = v2.o_orderkey)
      SELECT diff, count(*) AS n,
             CAST(sum(CAST(coalesce(new_p, 0) - coalesce(old_p, 0)
                           AS DECIMAL(18,2))) AS DOUBLE) AS net_value
      FROM d
      WHERE diff IS NOT NULL
      GROUP BY diff
      ORDER BY diff"""))

  val queries: Seq[Q] = Seq(q35, q42, q43)
}
