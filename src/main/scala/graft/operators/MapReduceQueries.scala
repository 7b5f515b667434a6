package graft.operators

import graft.{Q, Tables}
import graft.core.{JobSpec, MiniJob, SortOpt}
import graft.examples.{PageRank, WordCount}
import org.apache.spark.sql.functions._

/** The reference's two flagship algorithms exposed as catalog queries,
  * running through the closure-based MiniJob engine (M1/A1/O1 surface) and
  * the PageRank driver loop — both checked against DuckDB SQL oracles,
  * which is the strongest possible cross-check for an iterative algorithm.
  */
object MapReduceQueries {

  // --------------------------------------------------------------- mr01
  /** WordCount via the MiniJob closure API over documents.text.
    * Tokenizer = reference parity (WordCount.tokenize); the corpus is
    * plain lowercase ASCII so the oracle mirrors the validity rule as
    * `word IN ('a','i') OR length >= 2`. */
  val mr01 = Q("mr01_wordcount_job",
    (s, dir) => {
      val spark = s
      import spark.implicits._
      val lines = Tables.df(s, dir, "documents").select("text").as[String]
      MiniJob.transform(s, WordCount.spec(Some(SortOpt.Default)), lines)
        .toDF("word", "n")
    },
    Some("""
      SELECT word, count(*) AS n
      FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
      WHERE word <> '' AND (word IN ('a','i') OR length(word) >= 2)
      GROUP BY word
      ORDER BY n DESC, word"""))

  // --------------------------------------------------------------- mr02
  /** 2-iteration PageRank over a supplier→part graph derived from
    * lineitem, with the reference's exact semantics (baseline to sources
    * only, default rank 1.0 — see graft.examples.PageRank). The oracle
    * unrolls both iterations in SQL. */
  val mr02 = Q("mr02_pagerank",
    (s, dir) => {
      val edges = Tables.df(s, dir, "lineitem")
        .select(concat(lit("s"), col("l_suppkey")).as("src"),
          concat(lit("p"), col("l_partkey")).as("tgt"))
        .distinct()
      val links = edges.groupBy("src").agg(collect_list("tgt").as("targets"))
      val n = edges.select(col("src").as("p")).union(edges.select(col("tgt").as("p")))
        .distinct().count()
      PageRank.run(s, links, iterations = 2, damping = 0.85, totalPages = n)
        .select(col("page"), round(col("rank"), 8).as("rank"))
        .orderBy(col("rank").desc, col("page"))
    },
    Some("""
      WITH edges AS (
        SELECT DISTINCT 's' || l_suppkey AS src, 'p' || l_partkey AS tgt
        FROM lineitem),
      deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
      n AS (
        SELECT count(*) AS n FROM (
          SELECT src AS page FROM edges UNION SELECT tgt FROM edges)),
      r1 AS (
        SELECT page, sum(c) AS rank FROM (
          SELECT src AS page, 0.15 / (SELECT n FROM n) AS c FROM deg
          UNION ALL
          SELECT e.tgt, 0.85 * 1.0 / d.d
          FROM edges e JOIN deg d ON e.src = d.src) t
        GROUP BY page),
      r2 AS (
        SELECT page, sum(c) AS rank FROM (
          SELECT src AS page, 0.15 / (SELECT n FROM n) AS c FROM deg
          UNION ALL
          SELECT e.tgt, 0.85 * coalesce(r1.rank, 1.0) / d.d
          FROM edges e
          JOIN deg d ON e.src = d.src
          LEFT JOIN r1 ON r1.page = e.src) t
        GROUP BY page)
      SELECT page, round(rank, 8) AS rank
      FROM r2
      ORDER BY rank DESC, page"""))

  // --------------------------------------------------------------- mr03
  /** WordCount over BYTE-ALIGNED blocks — the reference's DEFAULT store
    * layout (`file_operation.ex:185-186` slices at fixed byte offsets with
    * no newline resync), which SURVEY §4.3.1 flags as a correctness
    * hazard: a word straddling a block boundary reaches two different
    * mappers as two fragments, and each fragment ≥2 chars (or a torn-off
    * 'a'/'i') counts as its own word. mr01 is the record-correct
    * line-aligned run; this entry makes the documented miscount itself
    * MACHINE-CHECKED — the oracle reproduces the exact same torn
    * fragments with the same fixed-offset substring rule, so the driver
    * hash pins the divergent-by-design totals.
    *
    * Blocks are carved per document in expression space (BlockSplit's
    * byte-mode rule at document granularity — sequence + substring,
    * codegen, no driver work) and each block is ONE map record, the
    * reference's map granularity. The corpus is strictly [a-z ] (checked
    * against sf0.01), so space-split fragments equal WordRun-regex
    * fragments and the simplified oracle validity rule is exact. */
  val mr03 = Q("mr03_wordcount_bytemode",
    (s, dir) => {
      val spark = s
      import spark.implicits._
      val blockSize = 64
      val blocks = Tables.df(s, dir, "documents")
        .filter(length(col("text")) > 0)
        .select(explode(expr(
          s"""transform(
             |  sequence(0, int(ceil(length(text) / CAST($blockSize AS DOUBLE))) - 1),
             |  i -> substring(text, i * $blockSize + 1, $blockSize))"""
            .stripMargin)).as("data"))
        .as[String]
      MiniJob.transform(s, WordCount.spec(Some(SortOpt.Default)), blocks)
        .toDF("word", "n")
    },
    Some("""
      WITH blocks AS (
        SELECT substring(text, (i - 1) * 64 + 1, 64) AS data
        FROM (
          SELECT text,
                 unnest(generate_series(1,
                   CAST(ceil(length(text) / 64.0) AS BIGINT))) AS i
          FROM documents
          WHERE length(text) > 0))
      SELECT word, count(*) AS n
      FROM (SELECT unnest(string_split(data, ' ')) AS word FROM blocks) t
      WHERE word <> '' AND (word IN ('a','i') OR length(word) >= 2)
      GROUP BY word
      ORDER BY n DESC, word"""))

  val queries: Seq[Q] = Seq(mr01, mr02, mr03)
}
