package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-expectation validation — the contract gate a pipeline runs
  * before (and after) every expensive stage: key uniqueness, domain
  * membership, null budgets, range checks, all measured in ONE
  * aggregate pass over the table (every expectation is a conditional
  * count, so the whole suite partial-aggregates and adds nothing beyond
  * the single scan it rides). The reference has no validation surface
  * beyond its result-format taxonomy (SURVEY §2.2 M3) — this is the
  * dataset-side counterpart.
  */
object ValidateOps {

  /** One expectation: a name plus a violation predicate; `violations`
    * counts rows where the predicate holds. */
  final case class Expect(name: String, violation: Column)

  /** Single-pass violation counts, one output column per expectation,
    * plus row and distinct-key counts for the uniqueness check. */
  def check(df: DataFrame, keyCol: String, expectations: Seq[Expect]): DataFrame = {
    val aggs = Seq(
      count(lit(1)).as("n_rows"),
      countDistinct(col(keyCol)).as("n_distinct_keys")) ++
      expectations.map(e => sum(when(e.violation, 1L).otherwise(0L)).as(e.name))
    df.agg(aggs.head, aggs.tail: _*)
  }

  // ---------------------------------------------------------------- v01
  /** Orders-table contract: unique keys, positive prices, status and
    * priority in their domains, no null dates — the wide one-row report
    * with an overall pass flag. */
  val v01 = Q("v01_data_expectations",
    (s, dir) => {
      val checked = check(Tables.df(s, dir, "orders"), "o_orderkey", Seq(
        Expect("n_nonpositive_price", col("o_totalprice") <= 0),
        Expect("n_bad_status", !col("o_orderstatus").isin("F", "O", "P")),
        Expect("n_bad_priority",
          !col("o_orderpriority").rlike("^[1-5]-(URGENT|HIGH|MEDIUM|NOT SPECIFIED|LOW)$")),
        Expect("n_null_date", col("o_orderdate").isNull)))
      checked.select(col("*"),
        (col("n_distinct_keys") === col("n_rows") &&
          col("n_nonpositive_price") === 0 && col("n_bad_status") === 0 &&
          col("n_bad_priority") === 0 && col("n_null_date") === 0)
          .cast("long").as("all_pass"))
    },
    Some("""
      WITH c AS (
        SELECT count(*) AS n_rows,
               count(DISTINCT o_orderkey) AS n_distinct_keys,
               CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_nonpositive_price,
               CAST(sum(CASE WHEN o_orderstatus NOT IN ('F','O','P') THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_bad_status,
               CAST(sum(CASE WHEN NOT regexp_matches(o_orderpriority,
                 '^[1-5]-(URGENT|HIGH|MEDIUM|NOT SPECIFIED|LOW)$') THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_bad_priority,
               CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_null_date
        FROM orders)
      SELECT *,
             CAST(n_distinct_keys = n_rows AND n_nonpositive_price = 0
                  AND n_bad_status = 0 AND n_bad_priority = 0
                  AND n_null_date = 0 AS BIGINT) AS all_pass
      FROM c"""))

  // ---------------------------------------------------------------- v02
  /** Row-level quarantine routing — v01 tells you THAT the batch has
    * violations; this splits out WHICH rows and WHY, the badRecords
    * side-channel of a production ingest: every failing row carries the
    * array of expectation names it violated, so the quarantine is
    * re-processable per reason. The clean side is the complement
    * (`size(reasons) == 0`) of the same one-pass expression — no second
    * scan, no join. The reasons list is emitted as a comma-joined
    * string (order is fixed by the expression itself), which keeps the
    * result sortable/hashable in any downstream harness while losing
    * no information.
    *
    * Scale shape: entirely scan-local expression work (the reasons array
    * is built per row in codegen) plus the output sort; at 100 TB the
    * two sides are one `partitionBy("clean")` write. */
  val v02 = Q("v02_quarantine",
    (s, dir) => {
      val d = Tables.df(s, dir, "documents")
        .withColumn("n_tokens",
          size(expr("filter(split(text, ' '), x -> x != '')")))
      d.withColumn("reasons", array_compact(array(
          when(col("n_tokens") < 30, lit("too_few_tokens")),
          when(col("n_tokens") > 0 &&
            col("n_chars").cast("double") / col("n_tokens") > 13.0,
            lit("bad_token_len")),
          when(!col("lang").isin("en", "de", "es", "fr"),
            lit("off_mix_lang")))))
        .filter(size(col("reasons")) > 0)
        .select(col("doc_id"), col("lang"),
          array_join(col("reasons"), ",").as("reasons"))
        .orderBy("doc_id")
    },
    Some("""
      WITH d AS (
        SELECT doc_id, lang, n_chars,
               len(list_filter(string_split(text, ' '), x -> x <> ''))
                 AS n_tokens
        FROM documents),
      r AS (
        SELECT doc_id, lang,
               list_filter([
                 CASE WHEN n_tokens < 30 THEN 'too_few_tokens' END,
                 CASE WHEN n_tokens > 0
                       AND n_chars * 1.0 / n_tokens > 13.0
                      THEN 'bad_token_len' END,
                 CASE WHEN lang NOT IN ('en', 'de', 'es', 'fr')
                      THEN 'off_mix_lang' END],
                 x -> x IS NOT NULL) AS reasons
        FROM d)
      SELECT doc_id, lang, array_to_string(reasons, ',') AS reasons
      FROM r
      WHERE len(reasons) > 0
      ORDER BY doc_id"""))

  // ---------------------------------------------------------------- v03
  /** Cross-table referential integrity — the third leg of the validation
    * family: count FK orphans along the star schema's spine (lineitem →
    * orders → customer, supplier → nation) in one declarative plan.
    * Anti-joins, not EXISTS-per-row: Catalyst broadcasts the small
    * parent side (nation, customer) and sort-merges the fact-sized one
    * (orders' keys against lineitem) — the only RI-check shape that
    * survives a 100 TB fact table. The three 1-row counts attach by
    * broadcast crossJoin (the t07 scalar pattern).
    *
    * Zero orphans on the TPC-H-ish fixture IS the assertion — a
    * validation gate must pass on clean data; the constructed-orphan
    * case is pinned in CurationOpsSpec. */
  val v03 = Q("v03_referential_integrity",
    (s, dir) => {
      def orphanCount(child: DataFrame, key: String, parent: DataFrame,
          pkey: String, as: String): DataFrame =
        child.select(col(key))
          .join(parent.select(col(pkey).as(key)), Seq(key), "left_anti")
          .agg(count(lit(1)).as(as))
      val li = orphanCount(Tables.df(s, dir, "lineitem"), "l_orderkey",
        Tables.df(s, dir, "orders"), "o_orderkey", "orphan_lineitems")
      val oc = orphanCount(Tables.df(s, dir, "orders"), "o_custkey",
        Tables.df(s, dir, "customer"), "c_custkey", "orphan_orders")
      val sn = orphanCount(Tables.df(s, dir, "supplier"), "s_nationkey",
        Tables.df(s, dir, "nation"), "n_nationkey", "orphan_suppliers")
      li.crossJoin(broadcast(oc)).crossJoin(broadcast(sn))
    },
    Some("""
      SELECT
        (SELECT count(*) FROM lineitem l
         WHERE NOT EXISTS (SELECT 1 FROM orders o
                           WHERE o.o_orderkey = l.l_orderkey))
          AS orphan_lineitems,
        (SELECT count(*) FROM orders o
         WHERE NOT EXISTS (SELECT 1 FROM customer c
                           WHERE c.c_custkey = o.o_custkey))
          AS orphan_orders,
        (SELECT count(*) FROM supplier s
         WHERE NOT EXISTS (SELECT 1 FROM nation n
                           WHERE n.n_nationkey = s.s_nationkey))
          AS orphan_suppliers"""))

  // ---------------------------------------------------------------- v04
  /** Distribution-drift check (PSI — population stability index): the
    * gate a pipeline runs when a new corpus snapshot lands, before
    * retraining on it. Reference population = sources src0–src9,
    * current = src10–src19; metric = n_chars binned into 10 fixed-width
    * buckets; PSI = Σ (p_cur − p_ref)·ln(p_cur / p_ref) with +0.5
    * Laplace smoothing per bin so empty bins stay finite. (>0.2 is the
    * conventional "investigate" threshold.)
    *
    * Scale shape: binning and population tags ride the scan; ONE
    * groupBy(bin) with conditional counts (partial-agg) reduces 100 TB
    * to 10 rows; the PSI arithmetic and total happen on those 10 rows
    * (window over the 10-row frame, not the data). Fixed-width bins are
    * deliberate — quantile bins would need a second pass; the t14
    * approx-quantile pattern is the upgrade when bins must adapt. */
  val v04 = Q("v04_psi_drift",
    (s, dir) => {
      val ref = (0 to 9).map(i => s"src$i")
      val binned = Tables.df(s, dir, "documents")
        .withColumn("bin", least(floor(col("n_chars") / 60), lit(9)).cast("long"))
        .groupBy("bin")
        .agg(count(when(col("source").isin(ref: _*), 1)).as("n_ref"),
          count(when(!col("source").isin(ref: _*), 1)).as("n_cur"))
      val w = Window.partitionBy(lit(1))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      binned
        .withColumn("p_ref",
          (col("n_ref") + 0.5) / (sum("n_ref").over(w) + 5.0))
        .withColumn("p_cur",
          (col("n_cur") + 0.5) / (sum("n_cur").over(w) + 5.0))
        .withColumn("psi_term",
          round((col("p_cur") - col("p_ref")) * log(col("p_cur") / col("p_ref")), 6))
        .withColumn("psi_total", round(sum("psi_term").over(w), 6))
        .select(col("bin"), col("n_ref"), col("n_cur"), col("psi_term"),
          col("psi_total"))
        .orderBy("bin")
    },
    Some("""
      WITH b AS (
        SELECT least(CAST(floor(n_chars / 60) AS BIGINT), 9) AS bin,
               count(CASE WHEN source IN ('src0','src1','src2','src3','src4',
                 'src5','src6','src7','src8','src9') THEN 1 END) AS n_ref,
               count(CASE WHEN source NOT IN ('src0','src1','src2','src3','src4',
                 'src5','src6','src7','src8','src9') THEN 1 END) AS n_cur
        FROM documents
        GROUP BY 1),
      p AS (
        SELECT bin, n_ref, n_cur,
               (n_ref + 0.5) / (sum(n_ref) OVER () + 5.0) AS p_ref,
               (n_cur + 0.5) / (sum(n_cur) OVER () + 5.0) AS p_cur
        FROM b),
      t AS (
        SELECT bin, n_ref, n_cur,
               round((p_cur - p_ref) * ln(p_cur / p_ref), 6) AS psi_term
        FROM p)
      SELECT bin, n_ref, n_cur, psi_term,
             round(sum(psi_term) OVER (), 6) AS psi_total
      FROM t
      ORDER BY bin"""))

  // ---------------------------------------------------------------- v05
  /** Order-independent table fingerprint — the replica-equality check: a
    * 60-bit XOR of per-row md5 digests answers "are these two copies of
    * the table identical?" in one scan per copy and eight bytes over the
    * wire, with NO sort anywhere (XOR is commutative/associative, so the
    * fingerprint is invariant to row order, partitioning, and file
    * split — exactly the things that DO differ between replicas of the
    * same 100 TB table). The query fingerprints lineitem, a repartitioned
    * replica (must match), and a single-bit-corrupted replica (must
    * differ), emitting the verdicts as oracle-enforced booleans.
    *
    * The fingerprint covers the integer/string columns: their text
    * rendering is engine-portable, which is what lets DuckDB reproduce
    * the exact 60-bit value. A production fingerprint widens to all
    * columns behind a canonical value encoding (IEEE bits for doubles,
    * epoch micros for timestamps) — the XOR-of-row-digests shape is
    * unchanged. 15 hex chars = 60 bits keeps the value exact in both
    * engines' BIGINT (and safely clear of double-precision coercions).
    *
    * Since R14.15 the row digest is computed ONCE, before the replica's
    * layout-changing repartition (the digest is a pure row function, so
    * the fingerprint value is identical and a redundant full-table md5
    * pass + 6× exchange bytes disappear). The replica row therefore
    * attests count/bit_xor layout-invariance; digest-expression
    * determinism across layouts is covered by v06, which keeps dual
    * independent digest passes. */
  val v05 = Q("v05_table_fingerprint",
    (s, dir) => {
      val cols = Seq("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
        "l_returnflag", "l_linestatus")
      val rowFp = expr("cast(conv(substring(md5(concat_ws('|', " +
        cols.mkString(", ") + ")), 1, 15), 16, 10) as bigint)")
      def fp(df: DataFrame, n: String, f: String): DataFrame =
        df.agg(count(lit(1)).as(n), bit_xor(rowFp).as(f))
      val base = Tables.df(s, dir, "lineitem").select(cols.map(col): _*)
      // The replica check proves the AGGREGATE is layout-invariant, so
      // the row digests are computed once and only the 8-byte digest
      // column rides the layout-changing shuffle — md5 twice over the
      // same bytes would prove nothing extra, and at 100 TB the saved
      // pass (and the ~6× narrower exchange) is a full table scan.
      val replicaFp = base.select(rowFp.as("__fp")).repartition(13)
        .agg(count(lit(1)).as("n2"), bit_xor(col("__fp")).as("fp2"))
      val corrupted = base.withColumn("l_partkey",
        when(col("l_orderkey") % 2 === 0, col("l_partkey") + 1)
          .otherwise(col("l_partkey")))
      fp(base, "n_rows", "fp")
        .crossJoin(broadcast(replicaFp))
        .crossJoin(broadcast(fp(corrupted, "n3", "fp3")))
        .select(col("n_rows"), col("fp"),
          (col("fp") === col("fp2") && col("n_rows") === col("n2"))
            .as("replica_equal"),
          (col("fp") =!= col("fp3")).as("corruption_detected"))
    },
    Some("""
      SELECT count(*) AS n_rows,
             bit_xor(CAST(('0x' || substr(md5(concat_ws('|',
               l_orderkey, l_linenumber, l_partkey, l_suppkey,
               l_returnflag, l_linestatus)), 1, 15)) AS BIGINT)) AS fp,
             TRUE AS replica_equal, TRUE AS corruption_detected
      FROM lineitem"""))

  // ---------------------------------------------------------------- v06
  /** Fingerprint DIFF — v05 locates nothing; this is the anti-entropy
    * step that does: bucket each replica by key range (Merkle-leaf
    * style), XOR-fingerprint per bucket, and join the two fingerprint
    * tables to report exactly which buckets diverge. Repairing a 100 TB
    * replica then re-reads only the named buckets, not the table; the
    * fingerprint tables themselves are #buckets rows (here orderkey div
    * 1000), so the comparison is free at any scale. The "replica" here is
    * the base with a deterministic sparse corruption (one partkey
    * perturbed where orderkey % 1997 == 0), so the expected diff set is
    * well-defined and the DuckDB oracle reproduces BOTH fingerprint
    * columns and the diverging-bucket list value-exactly. */
  val v06 = Q("v06_fingerprint_diff",
    (s, dir) => {
      val cols = Seq("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
        "l_returnflag", "l_linestatus")
      val rowFp = expr("cast(conv(substring(md5(concat_ws('|', " +
        cols.mkString(", ") + ")), 1, 15), 16, 10) as bigint)")
      def buckets(df: DataFrame, f: String): DataFrame = df
        .withColumn("bucket", expr("l_orderkey div 1000"))
        .groupBy("bucket")
        .agg(count(lit(1)).as(f + "_n"), bit_xor(rowFp).as(f))
      val base = Tables.df(s, dir, "lineitem").select(cols.map(col): _*)
      val replica = base.withColumn("l_partkey",
        when(col("l_orderkey") % 1997 === 0, col("l_partkey") + 1)
          .otherwise(col("l_partkey")))
      buckets(base, "fp_base")
        .join(buckets(replica, "fp_replica"), Seq("bucket"), "full_outer")
        .where(col("fp_base") =!= col("fp_replica")
          || col("fp_base").isNull || col("fp_replica").isNull
          || col("fp_base_n") =!= col("fp_replica_n"))
        .select(col("bucket"), col("fp_base"), col("fp_replica"))
        .orderBy("bucket")
    },
    Some("""
      WITH base AS (
        SELECT l_orderkey // 1000 AS bucket,
               bit_xor(CAST(('0x' || substr(md5(concat_ws('|',
                 l_orderkey, l_linenumber, l_partkey, l_suppkey,
                 l_returnflag, l_linestatus)), 1, 15)) AS BIGINT)) AS fp_base,
               count(*) AS n
        FROM lineitem GROUP BY 1),
      replica AS (
        SELECT l_orderkey // 1000 AS bucket,
               bit_xor(CAST(('0x' || substr(md5(concat_ws('|',
                 l_orderkey, l_linenumber,
                 CASE WHEN l_orderkey % 1997 = 0 THEN l_partkey + 1
                      ELSE l_partkey END,
                 l_suppkey, l_returnflag, l_linestatus)), 1, 15)) AS BIGINT))
                 AS fp_replica,
               count(*) AS n
        FROM lineitem GROUP BY 1)
      SELECT b.bucket, b.fp_base, r.fp_replica
      FROM base b FULL OUTER JOIN replica r USING (bucket)
      WHERE b.fp_base <> r.fp_replica
         OR b.fp_base IS NULL OR r.fp_replica IS NULL OR b.n <> r.n
      ORDER BY b.bucket"""))

  // ---------------------------------------------------------------- v07
  /** k-anonymity audit — the privacy gate a corpus passes before
    * release: group by the quasi-identifier tuple (lang, source,
    * length bucket) and report every equivalence class smaller than
    * k=5, i.e. the rows an adversary joining on those attributes could
    * re-identify. One partial-agg pass over the scan (each expectation
    * class is a conditional count, same discipline as v01); the output
    * is the risky-class list with sizes, which is also the worklist for
    * the remediation step (generalize the bucket, suppress the rows).
    * The t11 redaction op is the column-level complement. */
  val v07 = Q("v07_k_anonymity",
    (s, dir) => {
      Tables.df(s, dir, "documents")
        .withColumn("chars_bucket", expr("n_chars div 50"))
        .groupBy("lang", "source", "chars_bucket")
        .agg(count(lit(1)).as("class_size"))
        .where(col("class_size") < 5)
        .orderBy("lang", "source", "chars_bucket")
    },
    Some("""
      SELECT lang, source, n_chars // 50 AS chars_bucket,
             count(*) AS class_size
      FROM documents
      GROUP BY 1, 2, 3
      HAVING count(*) < 5
      ORDER BY 1, 2, 3"""))

  val queries: Seq[Q] = Seq(v01, v02, v03, v04, v05, v06, v07)
}
