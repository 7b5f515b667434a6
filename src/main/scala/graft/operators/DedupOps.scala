package graft.operators

import graft.{Q, Tables}
import graft.functions.VectorFunctions.{cosine_similarity, jaccard_similarity}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators over `documents` — exact, MinHash+LSH,
  * SimHash, and n-gram Jaccard — the core of a training-data pipeline.
  *
  * The reference has only the germ of this: distinct-key tracking in its
  * shuffle storage (`lib/mini_hadoop/compute_task/task_result_storage.ex:54-72`,
  * SURVEY §2.4 A5). Here dedup is a first-class operator family.
  *
  * Scale design:
  *   - exact dedup = hash-aggregate on a digest → one shuffle, combiner-friendly;
  *   - MinHash+LSH replaces the O(n²) pair space with band-bucket joins:
  *     only documents sharing a (band, band-hash) bucket are compared, and
  *     the exact Jaccard verify runs on candidates only. At 100 TB the
  *     bucket join is AQE-skew-safe (degenerate hot buckets get split);
  *   - SimHash pairs use the pigeonhole 16-bit-segment trick: hamming ≤ 3
  *     implies at least one of 4 segments matches exactly → equi-join, no
  *     cross product;
  *   - n-gram Jaccard is the exact quadratic baseline, kept for small
  *     scopes and as the oracle for the approximate paths.
  */
object DedupOps {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.df(s, dir, "documents")

  private val wordsExpr: Column =
    expr("array_distinct(filter(split(text, ' '), x -> x != ''))")

  // ---------------------------------------------------------------- d01
  /** Exact dedup: group by content digest, keep the smallest doc_id. */
  val d01 = Q("d01_exact_dedup",
    (s, dir) =>
      docs(s, dir)
        .groupBy(md5(col("text").cast("binary")).as("text_hash"))
        .agg(min("doc_id").as("keeper_id"), count(lit(1)).as("n_copies"))
        .orderBy("text_hash"),
    Some("""
      SELECT md5(text) AS text_hash, min(doc_id) AS keeper_id,
             count(*) AS n_copies
      FROM documents
      GROUP BY md5(text)
      ORDER BY text_hash"""))

  // ---------------------------------------------------------------- d02
  /** MinHash + LSH near-dup pairs (word-shingle Jaccard ≥ 0.9).
    *
    * 64 minhashes, 16 bands × 4 rows → P(candidate | j=0.9) ≈ 1 − 3.6e-8,
    * so the LSH candidate set is effectively complete at the threshold and
    * the exact-Jaccard verify makes the output equal to the true pair set
    * — which is why a SQL oracle (plain quadratic Jaccard) can check it.
    */
  val d02 = Q("d02_minhash_lsh",
    (s, dir) => {
      val P = 2147483647L // 2^31-1, prime
      val words = docs(s, dir).select(col("doc_id"), wordsExpr.as("words"))
      val hashed = words
        .select(col("doc_id"), explode(col("words")).as("w"))
        .withColumn("wh", pmod(xxhash64(col("w")), lit(P)))
      // one single-pass sketch aggregate (graft.functions.MinHashAgg)
      // instead of 64 separate min() columns
      val sigs = hashed.groupBy("doc_id")
        .agg(graft.functions.MinHashAgg.minhash_agg(col("wh"), 64, 42L).as("sig"))
      // 16 bands of 4 rows; band key = hash of the 4 signature values
      val bandCols = (0 until 16).map { bnd =>
        struct(lit(bnd).as("band"),
          xxhash64((bnd * 4 until bnd * 4 + 4).map(i =>
            element_at(col("sig"), i + 1)): _*).as("bh"))
      }
      val bands = sigs.select(col("doc_id"), explode(array(bandCols: _*)).as("b"))
        .select(col("doc_id"), col("b.band").as("band"), col("b.bh").as("bh"))
      val cand = bands.alias("x")
        .join(bands.alias("y"), Seq("band", "bh"))
        .filter(col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .distinct()
      // exact verify on candidates only
      val wa = words.select(col("doc_id").as("doc_a"), col("words").as("swa"))
      val wb = words.select(col("doc_id").as("doc_b"), col("words").as("swb"))
      cand.join(wa, "doc_a").join(wb, "doc_b")
        .withColumn("jac", jaccard_similarity(col("swa"), col("swb")))
        .filter(col("jac") >= 0.9)
        .select(col("doc_a"), col("doc_b"), round(col("jac"), 4).as("jaccard"))
        .orderBy("doc_a", "doc_b")
    },
    Some("""
      WITH w AS (
        SELECT doc_id,
               list_distinct(list_filter(string_split(text,' '), x -> x <> '')) AS s
        FROM documents),
      pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               len(list_intersect(a.s, b.s)) * 1.0 /
                 (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jac
        FROM w a JOIN w b ON a.doc_id < b.doc_id)
      SELECT doc_a, doc_b, round(jac, 4) AS jaccard
      FROM pairs
      WHERE jac >= 0.9
      ORDER BY doc_a, doc_b"""))

  // ---------------------------------------------------------------- d03
  /** SimHash near-dup pairs: 64-bit signature from word hashes, candidate
    * pairs via the 4×16-bit pigeonhole equi-join, hamming ≤ 3 verify.
    * Spark-specific hash (xxhash64) → no SQL oracle; exactness covered by
    * DedupSpec golden tests. */
  val d03 = Q("d03_simhash",
    (s, dir) => {
      val words = docs(s, dir).select(col("doc_id"), wordsExpr.as("words"))
      val bitAggs = (0 until 64).map(b =>
        sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$b"))
      val bitSums = words
        .select(col("doc_id"), explode(col("words")).as("w"))
        .withColumn("h", xxhash64(col("w")))
        .groupBy("doc_id")
        .agg(bitAggs.head, bitAggs.tail: _*)
      val sim = bitSums.select(col("doc_id"),
        (0 until 64).map(b =>
          when(col(s"b$b") >= 0, lit(1L << b)).otherwise(0L)
        ).reduce(_.bitwiseOR(_)).as("simhash"))
      // pigeonhole: hamming ≤ 3 over 4 segments → ≥1 segment equal
      val seg = sim.select(col("doc_id"), col("simhash"),
        explode(array((0 until 4).map(k =>
          struct(lit(k).as("seg"),
            shiftright(col("simhash"), k * 16).bitwiseAND(0xFFFFL).as("sv"))): _*)).as("sg"))
        .select(col("doc_id"), col("simhash"), col("sg.seg").as("seg"), col("sg.sv").as("sv"))
      seg.alias("x").join(seg.alias("y"), Seq("seg", "sv"))
        .filter(col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
          bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming"))
        .distinct()
        .filter(col("hamming") <= 3)
        .orderBy("doc_a", "doc_b")
    },
    None)

  // ---------------------------------------------------------------- d04
  /** Exact bigram-shingle Jaccard pairs (≥ 0.5) — the quadratic baseline.
    * Kept exact on purpose: it is the ground truth the approximate dedup
    * paths (d02/d03) are judged against. At 100 TB you run d02, not this. */
  val d04 = Q("d04_ngram_jaccard",
    (s, dir) => {
      val grams = docs(s, dir)
        .withColumn("w", expr("filter(split(text, ' '), x -> x != '')"))
        .select(col("doc_id"), expr(
          "array_distinct(transform(slice(w, 1, size(w) - 1), (x, i) -> concat(x, ' ', element_at(w, i + 2))))")
          .as("grams"))
      val a = grams.select(col("doc_id").as("doc_a"), col("grams").as("ga"))
      val b = grams.select(col("doc_id").as("doc_b"), col("grams").as("gb"))
      a.join(b, col("doc_a") < col("doc_b"))
        .withColumn("jac", jaccard_similarity(col("ga"), col("gb")))
        .filter(col("jac") >= 0.5)
        .select(col("doc_a"), col("doc_b"), round(col("jac"), 4).as("jaccard"))
        .orderBy("doc_a", "doc_b")
    },
    Some("""
      WITH t AS (
        SELECT doc_id, list_filter(string_split(text,' '), x -> x <> '') AS w
        FROM documents),
      sh AS (
        SELECT doc_id,
               list_distinct([w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]) AS s
        FROM t),
      pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               len(list_intersect(a.s, b.s)) * 1.0 /
                 (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jac
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
      SELECT doc_a, doc_b, round(jac, 4) AS jaccard
      FROM pairs
      WHERE jac >= 0.5
      ORDER BY doc_a, doc_b"""))

  // ---------------------------------------------------------------- d05
  /** Embedding near-dup: top-20 most-similar vector pairs by cosine.
    * Top-k (not a threshold) keeps the result robust to last-ulp float
    * differences between engines. Exact quadratic here; the LSH-bucketed
    * scale path is SimilarityOps.s02. */
  val d05 = Q("d05_embedding_neardup",
    (s, dir) => {
      val e = Tables.df(s, dir, "embeddings")
        .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("v"))
      val a = e.select(col("vec_id").as("vec_a"), col("v").as("va"))
      val b = e.select(col("vec_id").as("vec_b"), col("v").as("vb"))
      a.join(b, col("vec_a") < col("vec_b"))
        .withColumn("cosine", cosine_similarity(col("va"), col("vb")))
        .select(col("vec_a"), col("vec_b"), round(col("cosine"), 4).as("cosine"))
        .orderBy(col("cosine").desc, col("vec_a"), col("vec_b"))
        .limit(20)
    },
    Some("""
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             round(list_dot_product(a.v, b.v) /
                   (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))),
                   4) AS cosine
      FROM e a JOIN e b ON a.vec_id < b.vec_id
      ORDER BY cosine DESC, vec_a, vec_b
      LIMIT 20"""))

  val queries: Seq[Q] = Seq(d01, d02, d03, d04, d05)
}
