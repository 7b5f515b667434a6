package graft.operators

import graft.core.Materialize.MatOps
import graft.{Q, Tables}
import graft.functions.VectorFunctions.cosine_similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (64-d float vectors).
  *
  * s01 is brute-force cosine top-k — the correctness baseline. s02 is the
  * scale path: random-hyperplane LSH bucketing with multi-probe, so each
  * query only scores vectors in nearby buckets. At 100 TB the bucketed
  * variant turns an all-pairs shuffle into an equi-join on bucket id
  * (broadcastable probe side), which is the only shape that survives a
  * 1000-executor fan-out.
  *
  * No reference analog: mini-hadoop has no vector operations; this is part
  * of the training-data-pipeline extension surface (SURVEY §7.2.7).
  */
object SimilarityOps {

  private[graft] def emb(s: SparkSession, dir: String): DataFrame =
    Tables.df(s, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))

  // ---------------------------------------------------------------- s01
  /** Brute-force cosine top-5 neighbors for query vectors (vec_id < 5).
    * broadcast(queries) keeps the big side shuffle-free: the corpus scan
    * streams once past an in-memory probe table. */
  val s01 = Q("s01_cosine_topk",
    (s, dir) => {
      val e = emb(s, dir)
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("v").as("qv"))
      val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("vec_id"))
      e.join(broadcast(q), col("vec_id") =!= col("query_id"))
        .withColumn("cosine", cosine_similarity(col("qv"), col("v")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select(col("query_id"), col("rn"), col("vec_id").as("neighbor_id"),
          round(col("cosine"), 4).as("cosine"))
        .orderBy("query_id", "rn")
    },
    Some("""
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
      scored AS (
        SELECT q.query_id, e.vec_id,
               list_dot_product(q.qv, e.v) /
                 (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(e.v, e.v))) AS cosine
        FROM q JOIN e ON e.vec_id <> q.query_id),
      ranked AS (
        SELECT query_id, vec_id, cosine,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, vec_id) AS rn
        FROM scored)
      SELECT query_id, rn, vec_id AS neighbor_id, round(cosine, 4) AS cosine
      FROM ranked
      WHERE rn <= 5
      ORDER BY query_id, rn"""))

  // ---------------------------------------------------------------- s02
  /** ANN via random-hyperplane LSH: 6-bit signatures (64 buckets), queries
    * probe their own bucket plus all hamming-1 neighbors.
    *
    * Oracle: approximate ≠ unverifiable. The hyperplanes are fixed
    * constants (seed 7), so the WHOLE algorithm — signatures, probe set,
    * bucket join, rank — replays in DuckDB with the planes inlined as
    * list literals, and the driver hash-checks the ANN pipeline
    * end-to-end against an independent engine (stronger than the old
    * rows-only gate, which couldn't see a wrong bucket or a dropped
    * probe). Recall floors vs s01 stay in SimilaritySpec. */
  private val lshPlanes: Array[Array[Double]] = {
    val rnd = new scala.util.Random(7)
    Array.fill(6)(Array.fill(64)(rnd.nextGaussian()))
  }

  private def s02OracleSql: String = {
    val sigTerms = lshPlanes.zipWithIndex.map { case (p, i) =>
      s"(CASE WHEN list_dot_product(v, [${p.mkString(",")}]) >= 0 THEN ${1 << i} ELSE 0 END)"
    }.mkString("\n             + ")
    s"""
      WITH e AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings),
      b AS (
        SELECT vec_id, v,
             $sigTerms AS bucket
        FROM e),
      q AS (SELECT vec_id AS query_id, v AS qv, bucket AS qb
            FROM b WHERE vec_id < 5),
      probes AS (
        SELECT query_id, qv,
               unnest([qb, xor(qb, 1), xor(qb, 2), xor(qb, 4),
                       xor(qb, 8), xor(qb, 16), xor(qb, 32)]) AS bucket
        FROM q),
      cand AS (
        SELECT p.query_id, p.qv, b.vec_id, b.v
        FROM probes p JOIN b USING (bucket)
        WHERE b.vec_id <> p.query_id),
      scored AS (
        SELECT query_id, vec_id,
               list_dot_product(qv, v) /
                 (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))) AS cosine
        FROM cand),
      ranked AS (
        SELECT query_id, vec_id, cosine,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, vec_id) AS rn
        FROM scored)
      SELECT query_id, rn, vec_id AS neighbor_id, round(cosine, 4) AS cosine
      FROM ranked
      WHERE rn <= 5
      ORDER BY query_id, rn"""
  }

  val s02 = Q("s02_ann_lsh",
    (s, dir) => {
      val planes = lshPlanes
      def sigCol(vcol: String) = (0 until 6).map { p =>
        val dot = expr(s"aggregate(zip_with($vcol, array(${planes(p).mkString(",")}), (x, y) -> x * y), 0D, (acc, x) -> acc + x)")
        when(dot >= 0, lit(1 << p)).otherwise(lit(0))
      }.reduce(_ + _)

      val e = emb(s, dir).withColumn("bucket", sigCol("v"))
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("v").as("qv"),
          col("bucket").as("qb"))
        // multi-probe: own bucket + 6 hamming-1 buckets
        .withColumn("bucket", explode(array(
          col("qb") +: (0 until 6).map(b => col("qb").bitwiseXOR(1 << b)): _*)))
      val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("vec_id"))
      e.join(broadcast(q), Seq("bucket"))
        .filter(col("vec_id") =!= col("query_id"))
        .withColumn("cosine", cosine_similarity(col("qv"), col("v")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select(col("query_id"), col("rn"), col("vec_id").as("neighbor_id"),
          round(col("cosine"), 4).as("cosine"))
        .orderBy("query_id", "rn")
    },
    Some(s02OracleSql))

  // ---------------------------------------------------------------- s03
  /** IVF-style ANN: coarse quantizer from a deterministic driver-side
    * sample (the RangePartitioner pattern — bounded sample, broadcast
    * centroids), vectors assigned to their nearest centroid, queries probe
    * the 2 nearest cells only. The inverted-file shape is what scales:
    * the corpus is scanned once to build cell assignments, and each query
    * touches ~2/k of the data. Approximate but fully deterministic
    * (portable md5 sample ordering), so the oracle replays the whole
    * index build + probe in DuckDB and hash-checks it; recall vs s01
    * is asserted in SimilarityIvfSpec. */
  /** Deterministic UNBIASED sample → k coarse centroids: ordering by a
    * hash of the id is a reproducible shuffle, so the 256 rows spread
    * across the corpus instead of being the 256 lowest ids (which would
    * train all centroids on one corner of the id space). Bounded driver
    * cost: TakeOrdered over 256 rows. (k-means|| seeding is overkill.)
    * The hash is md5 of the DECIMAL id string — the d03 portable-hash
    * convention — so the same sample (hence the same centroids, cells,
    * and final ANN answer) is reproducible in DuckDB and the s03/s08
    * oracles can replay the whole index build. */
  private[graft] def ivfCentroids(e: DataFrame, k: Int = 8): Seq[Array[Double]] = {
    val sample = e.orderBy(md5(col("vec_id").cast("string").cast("binary")),
      col("vec_id")).limit(256).collect()
    (0 until k).map { i =>
      sample(i * math.max(1, sample.length / k) % sample.length)
        .getSeq[Double](2).toArray
    }
  }

  private def cellDists(centroids: Seq[Array[Double]], vcol: String) =
    centroids.zipWithIndex.map { case (c, i) =>
      val d = expr(
        s"aggregate(zip_with($vcol, array(${c.mkString(",")}), (x, y) -> (x - y) * (x - y)), 0D, (acc, x) -> acc + x)")
      struct(d.as("d"), lit(i).as("cell"))
    }

  /** Nearest coarse cell for the vector in `vcol`. */
  private[graft] def nearestCellExpr(centroids: Seq[Array[Double]],
      vcol: String): org.apache.spark.sql.Column =
    least(cellDists(centroids, vcol): _*).getField("cell")

  /** Runner-up coarse cell (the second probe). */
  private[graft] def secondCellExpr(centroids: Seq[Array[Double]],
      vcol: String): org.apache.spark.sql.Column =
    array_sort(array(cellDists(centroids, vcol): _*)).getItem(1).getField("cell")

  /** Shared DuckDB replay of the IVF index build (the exact mirror of
    * [[ivfCentroids]] / [[nearestCellExpr]] / [[secondCellExpr]]):
    * `e` double vectors → `h` md5-ordered sample ranks → `cent` the k=8
    * stride-32 sample centroids → `celldist` every vector × centroid L2
    * (elementwise, same op order as the Spark fold) → `assigned`
    * nearest cell (ties to the lower cell id, the struct-min semantics)
    * → `probes` each query's 2 nearest cells. */
  private val ivfOracleIndex: String = """
      e AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings),
      h AS (
        SELECT vec_id, v,
               row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
                                  vec_id) AS hrn
        FROM e),
      cent AS (
        SELECT CAST((hrn - 1) // 32 AS INTEGER) AS cell, v AS cv
        FROM h WHERE hrn <= 256 AND (hrn - 1) % 32 = 0),
      celldist AS (
        SELECT e.vec_id, e.v, c.cell,
               list_sum(list_transform(range(1, 65),
                 i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i]))) AS d
        FROM e CROSS JOIN cent c),
      cellrank AS (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY d, cell) AS crn
        FROM celldist),
      assigned AS (SELECT vec_id, v, cell FROM cellrank WHERE crn = 1),
      probes AS (
        SELECT vec_id AS query_id, v AS qv, cell
        FROM cellrank WHERE vec_id < 5 AND crn <= 2)"""

  private val annTopkEpilogue: String = """
      scored AS (
        SELECT query_id, vec_id,
               list_dot_product(qv, v) /
                 (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))) AS cosine
        FROM cand),
      ranked AS (
        SELECT query_id, vec_id, cosine,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, vec_id) AS rn
        FROM scored)
      SELECT query_id, rn, vec_id AS neighbor_id, round(cosine, 4) AS cosine
      FROM ranked
      WHERE rn <= 5
      ORDER BY query_id, rn"""

  private val s03OracleSql: String = s"""
      WITH $ivfOracleIndex,
      cand AS (
        SELECT p.query_id, p.qv, a.vec_id, a.v
        FROM probes p JOIN assigned a USING (cell)
        WHERE a.vec_id <> p.query_id),
      $annTopkEpilogue"""

  /** Full IVF-PQ replay: the s03 index CTEs + the s07 codebook/encode
    * CTEs + the ADC scoring, 64-deep shortlist, and exact re-rank —
    * every stage of the production ANN pipeline hash-checked against
    * DuckDB. */
  private val s08OracleSql: String = s"""
      WITH $ivfOracleIndex,
      subs AS (
        SELECT vec_id, m, v[m * 16 + 1 : m * 16 + 16] AS sub
        FROM e, (SELECT unnest(range(0, 4)) AS m)),
      pqc AS (
        SELECT vec_id AS cid, m, sub AS csub FROM subs WHERE vec_id < 8),
      dd AS (
        SELECT s.vec_id, s.m, c.cid,
               list_sum(list_transform(range(1, 17),
                 i -> (s.sub[i] - c.csub[i]) * (s.sub[i] - c.csub[i]))) AS dist
        FROM subs s JOIN pqc c ON s.m = c.m),
      mind AS (SELECT vec_id, m, min(dist) AS md FROM dd GROUP BY 1, 2),
      codes AS (
        SELECT dd.vec_id, dd.m, min(cid) AS code
        FROM dd JOIN mind USING (vec_id, m)
        WHERE dist = md
        GROUP BY 1, 2),
      adc AS (
        SELECT q.vec_id AS query_id, q.m, c.cid AS code,
               list_sum(list_transform(range(1, 17),
                 i -> (q.sub[i] - c.csub[i]) * (q.sub[i] - c.csub[i]))) AS qd
        FROM subs q JOIN pqc c ON q.m = c.m
        WHERE q.vec_id < 5),
      cand0 AS (
        SELECT p.query_id, a.vec_id
        FROM probes p JOIN assigned a USING (cell)
        WHERE a.vec_id <> p.query_id),
      adist AS (
        SELECT cand0.query_id, cand0.vec_id, sum(adc.qd) AS adist
        FROM cand0
        JOIN codes USING (vec_id)
        JOIN adc ON adc.query_id = cand0.query_id
                AND adc.m = codes.m AND adc.code = codes.code
        GROUP BY 1, 2),
      shortlist AS (
        SELECT query_id, vec_id FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY adist, vec_id) AS srn
          FROM adist)
        WHERE srn <= 64),
      cand AS (
        SELECT sl.query_id, q.v AS qv, e.vec_id, e.v
        FROM shortlist sl
        JOIN e USING (vec_id)
        JOIN (SELECT vec_id AS query_id, v FROM e WHERE vec_id < 5) q
          USING (query_id)),
      $annTopkEpilogue"""

  val s03 = Q("s03_ann_ivf",
    (s, dir) => {
      val e = emb(s, dir)
      val centroids = ivfCentroids(e)
      val assigned = e.withColumn("cell", nearestCellExpr(centroids, "v"))
      val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("vec_id"))
      // queries probe their own cell and the runner-up cell
      val q = assigned.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("v").as("qv"), col("cell"))
      val probes = q.withColumn("cell2", secondCellExpr(centroids, "qv"))
        .select(col("query_id"), col("qv"),
          explode(array(col("cell"), col("cell2"))).as("cell"))
      assigned.join(broadcast(probes), Seq("cell"))
        .filter(col("vec_id") =!= col("query_id"))
        .withColumn("cosine", cosine_similarity(col("qv"), col("v")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select(col("query_id"), col("rn"), col("vec_id").as("neighbor_id"),
          round(col("cosine"), 4).as("cosine"))
        .orderBy("query_id", "rn")
    },
    Some(s03OracleSql))

  // ---------------------------------------------------------------- s04
  /** Embedding normalization + int8 quantization — the storage-side
    * primitive of a vector pipeline (unit-norm turns cosine into dot
    * product; int8 shrinks a float corpus 4×; both are per-row expression
    * work that stays scan-local and codegen'd, shuffling nothing).
    *
    * All math runs in double on BOTH engines (floats cast up first) so
    * the IEEE op sequence is identical and the rounded outputs hash-match.
    * The quantized vector is emitted as one comma-joined string — the
    * driver's pandas hash-compare cannot factorize an array column
    * (q23 lesson). */
  val s04 = Q("s04_normalize_quantize",
    (s, dir) =>
      emb(s, dir)
        .withColumn("norm",
          sqrt(expr("aggregate(v, 0D, (acc, x) -> acc + x * x)")))
        .select(col("vec_id"), round(col("norm"), 6).as("l2_norm"),
          concat_ws(",",
            expr("transform(v, x -> cast(round(x / norm * 127) as int))"))
            .as("q_int8"))
        .orderBy("vec_id"),
    Some("""
      WITH d AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings),
      n AS (
        SELECT vec_id, v,
               sqrt(list_sum(list_transform(v, x -> x * x))) AS norm
        FROM d)
      SELECT vec_id, round(norm, 6) AS l2_norm,
             array_to_string(list_transform(v,
               x -> CAST(round(x / norm * 127) AS INTEGER)), ',') AS q_int8
      FROM n
      ORDER BY vec_id"""))

  // ---------------------------------------------------------------- s05
  /** Per-label embedding centroids (mean pooling) — the prototype /
    * class-representative computation behind centroid classifiers,
    * cluster seeding, and per-domain embedding drift monitoring.
    *
    * Emitted as (label, dim, value) rows, not array columns: positional
    * explode → one hash aggregate on (label, dim) — a key space of
    * #labels × 64 regardless of corpus size, so the shuffle carries
    * partial sums only and the shape is flat at 100 TB. (Array output
    * would also defeat the driver's hash compare — q23 lesson.) */
  val s05 = Q("s05_label_centroids",
    (s, dir) =>
      emb(s, dir)
        .select(col("label"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("label", "pos")
        .agg(round(avg("x"), 6).as("centroid"), count(lit(1)).as("n_vecs"))
        .select(col("label"), (col("pos") + 1).cast("long").as("dim"),
          col("centroid"), col("n_vecs"))
        .orderBy("label", "dim"),
    Some("""
      WITH flat AS (
        SELECT label, generate_subscripts(embedding, 1) AS dim,
               unnest(embedding) AS x
        FROM embeddings)
      SELECT label, CAST(dim AS BIGINT) AS dim,
             round(avg(CAST(x AS DOUBLE)), 6) AS centroid,
             count(*) AS n_vecs
      FROM flat
      GROUP BY label, dim
      ORDER BY label, dim"""))

  // ---------------------------------------------------------------- s06
  /** Unsupervised clustering: 2 Lloyd iterations of cosine k-means with
    * 8 deterministic seeds (the vectors with vec_id < 8) — the corpus
    * auto-partitioning step (semantic sharding, per-cluster sampling,
    * near-dup blocking at the topic level) where s05's label centroids
    * need supervision.
    *
    * Scale shape per iteration: the ONLY shuffle is the (cid, dim)
    * partial-mean — a key space of k×64 regardless of corpus size;
    * assignment is a broadcast of k centroid rows against the scan.
    * Centroid coordinates are rounded to 6 decimals after each mean
    * (the s05 discipline), which is what makes every downstream cosine
    * bit-identical across engines and the oracle hash-sharp; assignment
    * ties break by centroid id. */
  val s06 = Q("s06_kmeans_lite",
    (s, dir) => {
      val e = emb(s, dir).select("vec_id", "v")
      def assign(cents: DataFrame): DataFrame = {
        val w = Window.partitionBy("vec_id").orderBy(col("cos").desc, col("cid"))
        e.crossJoin(broadcast(cents))
          .withColumn("cos", cosine_similarity(col("v"), col("cv")))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("vec_id"), col("v"), col("cid"), col("cos"))
      }
      def update(assigned: DataFrame): DataFrame =
        assigned.select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
          .groupBy("cid", "pos")
          .agg(round(avg("x"), 6).as("cx"))
          .groupBy("cid")
          .agg(expr("transform(sort_array(collect_list(struct(pos, cx))), s -> s.cx)")
            .as("cv"))
      val c0 = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("v").as("cv"))
      val a2 = assign(update(assign(c0)))
      a2.groupBy("cid")
        .agg(count(lit(1)).as("n_members"), round(avg("cos"), 4).as("avg_cosine"))
        .select(col("cid").as("cluster_id"), col("n_members"), col("avg_cosine"))
        .orderBy("cluster_id")
    },
    Some("""
      WITH e AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings),
      c0 AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
      s1 AS (
        SELECT e.vec_id, e.v, c.cid,
               list_dot_product(e.v, c.cv) /
                 (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))) AS cos
        FROM e CROSS JOIN c0 c),
      a1 AS (SELECT * FROM (
               SELECT *, row_number() OVER (PARTITION BY vec_id
                 ORDER BY cos DESC, cid) AS rn FROM s1) WHERE rn = 1),
      d1 AS (SELECT cid, generate_subscripts(v, 1) AS pos, unnest(v) AS x FROM a1),
      c1 AS (SELECT cid, list(cx ORDER BY pos) AS cv FROM (
               SELECT cid, pos, round(avg(x), 6) AS cx FROM d1 GROUP BY cid, pos)
             GROUP BY cid),
      s2 AS (
        SELECT e.vec_id, c.cid,
               list_dot_product(e.v, c.cv) /
                 (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))) AS cos
        FROM e CROSS JOIN c1 c),
      a2 AS (SELECT * FROM (
               SELECT *, row_number() OVER (PARTITION BY vec_id
                 ORDER BY cos DESC, cid) AS rn FROM s2) WHERE rn = 1)
      SELECT cid AS cluster_id, count(*) AS n_members,
             round(avg(cos), 4) AS avg_cosine
      FROM a2
      GROUP BY cid
      ORDER BY cid"""))

  // ---------------------------------------------------------------- s07
  /** Product-quantization encode — the codebook compression layer under
    * a disk-resident ANN index (IVF-PQ): split each 64-d vector into
    * M=4 16-d subvectors and store, per subspace, only the id of the
    * nearest of k=8 codebook centroids → 4 small ints instead of 256
    * bytes of floats. Codebook here = the subvectors of vec_id 0..7
    * (deterministic seed centroids, the s06 convention); a production
    * build would train them with s06's Lloyd iterations per subspace.
    *
    * Scale shape: the codebook is M×k = 32 rows — broadcast; encoding
    * is one pass over the corpus (explode to M subvector rows, join,
    * partial-agg argmin, re-pivot). Nothing scales with corpus size
    * except the scan. All distances are exact IEEE doubles computed in
    * identical order in both engines, and the output is pure integers
    * (argmin ties broken toward the smaller centroid id), so the oracle
    * hash cannot flake on float formatting. */
  /** One row per (vec_id, m): the M=4 16-d subvectors of each vector. */
  private def pqSubvectors(e: DataFrame): DataFrame = e
    .select(col("vec_id"), explode(expr(
      "transform(sequence(0, 3), m -> " +
        "struct(m as m, slice(v, m * 16 + 1, 16) as sub))")).as("e"))
    .select(col("vec_id"), col("e.m").as("m"), col("e.sub").as("sub"))

  /** Seed codebook (s06 convention): subvectors of vec_id 0..7 as
    * (cid, m, csub) — M×k = 32 rows, always broadcast. */
  private def pqCodebook(subs: DataFrame): DataFrame =
    subs.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("m"), col("sub").as("csub"))

  /** (vec_id, m, code): nearest codebook centroid per subspace, ties to
    * the smaller centroid id. */
  private def pqCodes(subs: DataFrame, codebook: DataFrame): DataFrame =
    subs.join(broadcast(codebook), "m")
      .withColumn("dist", expr(
        "aggregate(zip_with(sub, csub, (x, y) -> (x - y) * (x - y)), " +
          "0D, (acc, z) -> acc + z)"))
      .groupBy("vec_id", "m")
      .agg(min(struct(col("dist"), col("cid"))).as("b"))
      .select(col("vec_id"), col("m"), col("b.cid").as("code"))

  val s07 = Q("s07_pq_encode",
    (s, dir) => {
      val subs = pqSubvectors(emb(s, dir))
      val best = pqCodes(subs, pqCodebook(subs))
      best.groupBy("vec_id")
        .agg(max(when(col("m") === 0, col("code"))).as("c0"),
          max(when(col("m") === 1, col("code"))).as("c1"),
          max(when(col("m") === 2, col("code"))).as("c2"),
          max(when(col("m") === 3, col("code"))).as("c3"))
        .orderBy("vec_id")
    },
    Some("""
      WITH v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings),
      subs AS (
        SELECT vec_id, m, v[m * 16 + 1 : m * 16 + 16] AS sub
        FROM v, (SELECT unnest(range(0, 4)) AS m)),
      cents AS (
        SELECT vec_id AS cid, m, sub AS csub FROM subs WHERE vec_id < 8),
      dd AS (
        SELECT s.vec_id, s.m, c.cid,
               list_sum(list_transform(range(1, 17),
                 i -> (s.sub[i] - c.csub[i]) * (s.sub[i] - c.csub[i])))
                 AS dist
        FROM subs s JOIN cents c ON s.m = c.m),
      md AS (SELECT vec_id, m, min(dist) AS md FROM dd GROUP BY 1, 2),
      best AS (
        SELECT dd.vec_id, dd.m, min(cid) AS code
        FROM dd JOIN md USING (vec_id, m)
        WHERE dist = md
        GROUP BY 1, 2)
      SELECT vec_id,
             max(CASE WHEN m = 0 THEN code END) AS c0,
             max(CASE WHEN m = 1 THEN code END) AS c1,
             max(CASE WHEN m = 2 THEN code END) AS c2,
             max(CASE WHEN m = 3 THEN code END) AS c3
      FROM best
      GROUP BY vec_id
      ORDER BY vec_id"""))

  // ---------------------------------------------------------------- s08
  /** The full disk-scale ANN pipeline — IVF routing + PQ asymmetric
    * distance + exact re-rank — composing s03's coarse quantizer with
    * s07's codebook the way a production index serves queries:
    *
    *   1. route: each query probes its 2 nearest coarse cells, so only
    *      ~2/k of the corpus is candidate (the IVF win);
    *   2. score approximately: per query, ONE 160-row ADC table
    *      (M×k distances of its subvectors to the codebook) is
    *      broadcast and joined against candidates' 4 int codes — the
    *      candidates' float vectors are never touched (the PQ win:
    *      at 100 TB this stage reads 16 bytes/vector, not 256);
    *   3. shortlist the 64 best by approximate distance, then re-rank
    *      those exactly against the full vectors and keep top-5 —
    *      re-rank cost is per-query-constant, not corpus-sized. (The
    *      64-deep shortlist is what absorbs the seed codebook's ADC
    *      ranking error: 32 left clustered recall at the 0.8 floor,
    *      64 recovers 1.00 — ApproxAndIvfSpec.)
    *
    * Approximate by construction (IVF recall × PQ ranking error) but
    * fully deterministic — seeded sample centroids, seed codebook, id
    * tie-breaks everywhere — so the oracle replays the entire pipeline
    * (index build, ADC, shortlist, re-rank) in DuckDB and hash-checks
    * it; recall vs the s01 exact baseline is asserted on the clustered
    * fixture in ApproxAndIvfSpec. */
  val s08 = Q("s08_ann_ivfpq",
    (s, dir) => {
      val e = emb(s, dir)
      val centroids = ivfCentroids(e)
      // index-build stages materialized once (lazily): `assigned` feeds
      // the query side and the candidate join, `codes` the ADC join — in
      // production both are the precomputed on-disk index, and without
      // the checkpoint each consumer would re-run the scan + 8-centroid
      // (resp. codebook) distance pipeline
      val assigned = e.withColumn("cell", nearestCellExpr(centroids, "v"))
        .materialize
      val subs = pqSubvectors(e)
      val codebook = pqCodebook(subs)
      val codes = pqCodes(subs, codebook).materialize
      val q = assigned.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("v").as("qv"), col("cell"))
      val probes = q.withColumn("cell2", secondCellExpr(centroids, "qv"))
        .select(col("query_id"),
          explode(array(col("cell"), col("cell2"))).as("cell"))
      // per-query ADC table: distance of each query subvector to each
      // codebook centroid — #queries × M × k rows, broadcast
      val qsubs = q.select(col("query_id"), col("qv").as("v"))
        .withColumnRenamed("query_id", "vec_id")
      val adcTable = pqSubvectors(qsubs).join(broadcast(codebook), "m")
        .withColumn("qd", expr(
          "aggregate(zip_with(sub, csub, (x, y) -> (x - y) * (x - y)), " +
            "0D, (acc, z) -> acc + z)"))
        .select(col("vec_id").as("query_id"), col("m"),
          col("cid").as("code"), col("qd"))
      val cand = assigned.join(broadcast(probes), Seq("cell"))
        .filter(col("vec_id") =!= col("query_id"))
        .select("query_id", "vec_id")
      val adc = cand.join(codes, "vec_id")
        .join(broadcast(adcTable), Seq("query_id", "m", "code"))
        .groupBy("query_id", "vec_id").agg(sum("qd").as("adist"))
      val ws = Window.partitionBy("query_id")
        .orderBy(col("adist").asc, col("vec_id"))
      val shortlist = adc.withColumn("srn", row_number().over(ws))
        .filter(col("srn") <= 64).select("query_id", "vec_id")
      val w = Window.partitionBy("query_id")
        .orderBy(col("cosine").desc, col("vec_id"))
      shortlist
        .join(e.select(col("vec_id"), col("v")), "vec_id")
        .join(broadcast(q.select(col("query_id"), col("qv"))), "query_id")
        .withColumn("cosine", cosine_similarity(col("qv"), col("v")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select(col("query_id"), col("rn"), col("vec_id").as("neighbor_id"),
          round(col("cosine"), 4).as("cosine"))
        .orderBy("query_id", "rn")
    },
    Some(s08OracleSql))

  // ---------------------------------------------------------------- s09
  /** Hybrid retrieval: reciprocal-rank fusion (Cormack et al. 2009,
    * k = 60) of a DENSE ranking (cosine of every embedding to the query
    * vector, vec_id 0) and a SPARSE ranking (the t20 BM25 scores for the
    * fixed keyword query) — the composition proof for the retrieval
    * family the way p01 is for curation. Embeddings and documents share
    * the 0..N id space here, standing in for a corpus with an embedding
    * per document.
    *
    * RRF fuses RANKS, not scores, so the fusion layer is immune to the
    * two scorers' scales; ranks are integers, 1/(60+r) is identical
    * IEEE arithmetic in both engines, and the rounded fusion score is
    * hash-sharp.
    *
    * Scale shape — the production shortlist form: each side reduces to
    * its TOP-50 via TakeOrderedAndProject (distributed top-k, NO global
    * rank window over the corpus); rank numbers are then assigned
    * within the 50-row shortlist (a constant-size window) and fusion is
    * one join of two 50-row lists. Fusing shortlists instead of full
    * rankings is the standard hybrid-search contract — a document deep
    * in BOTH lists is dropped by construction, which is the documented
    * approximation every production RRF makes. The dense scorer is the
    * s01 broadcast-probe shape; the sparse scorer is the t20
    * single-pass shape. */
  val s09 = Q("s09_hybrid_retrieval",
    (s, dir) => {
      val e = emb(s, dir).select("vec_id", "v")
      val qv = e.filter(col("vec_id") === 0)
        .select(col("v").as("qv"))
      val wd = Window.orderBy(col("cosine").desc, col("vec_id"))
      val dense = e.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(qv))
        .withColumn("cosine", cosine_similarity(col("qv"), col("v")))
        .orderBy(col("cosine").desc, col("vec_id")).limit(50)
        .select(col("vec_id").as("doc_id"),
          row_number().over(wd).cast("long").as("dr"))
      val qterms = Seq("join", "window", "stream")
      val base = graft.Tables.df(s, dir, "documents")
        .withColumn("toks", expr("filter(split(text, ' '), x -> x != '')"))
        .select(col("doc_id") +:
          size(col("toks")).cast("double").as("dl") +:
          qterms.map(t =>
            size(expr(s"filter(toks, x -> x = '$t')")).cast("long").as(s"tf_$t")): _*)
        .materialize
      val hits = base.select(col("doc_id"), col("dl"),
          explode(array(qterms.map(t =>
            struct(lit(t).as("term"), col(s"tf_$t").as("tf"))): _*)).as("x"))
        .select(col("doc_id"), col("dl"), col("x.term").as("term"), col("x.tf").as("tf"))
        .filter(col("tf") > 0)
      val dfreq = hits.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
      val st = base.agg(count(lit(1)).cast("double").as("n"), avg("dl").as("avgdl"))
      val ws = Window.orderBy(col("bm25").desc, col("doc_id"))
      val sparse = hits.join(broadcast(dfreq), "term")
        .crossJoin(broadcast(st))
        .withColumn("sc",
          log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1.0) *
            (col("tf") * 2.2) /
            (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
        .groupBy("doc_id").agg(round(sum("sc"), 4).as("bm25"))
        .orderBy(col("bm25").desc, col("doc_id")).limit(50)
        .select(col("doc_id"), row_number().over(ws).cast("long").as("sr"))
      dense.join(sparse, Seq("doc_id"), "full_outer")
        .withColumn("rrf",
          round(coalesce(lit(1.0) / (col("dr") + 60.0), lit(0.0)) +
            coalesce(lit(1.0) / (col("sr") + 60.0), lit(0.0)), 6))
        .orderBy(col("rrf").desc, col("doc_id"))
        .select(col("doc_id"), col("rrf"))
        .limit(10)
    },
    Some("""
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      qv AS (SELECT v AS qvec FROM e WHERE vec_id = 0),
      dense_all AS (
        SELECT e.vec_id AS doc_id,
               row_number() OVER (
                 ORDER BY list_dot_product(e.v, qv.qvec) /
                   (sqrt(list_dot_product(e.v, e.v)) *
                    sqrt(list_dot_product(qv.qvec, qv.qvec))) DESC,
                 e.vec_id) AS dr
        FROM e, qv WHERE e.vec_id <> 0),
      dense AS (SELECT * FROM dense_all WHERE dr <= 50),
      base AS (
        SELECT doc_id,
               CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
                 AS DOUBLE) AS dl,
               list_filter(string_split(text, ' '), x -> x <> '') AS toks
        FROM documents),
      tf AS (
        SELECT doc_id, dl, term,
               CAST(len(list_filter(toks, x -> x = term)) AS BIGINT) AS tf
        FROM base, (SELECT unnest(['join', 'window', 'stream']) AS term) q),
      hits AS (SELECT * FROM tf WHERE tf > 0),
      df AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM hits GROUP BY term),
      st AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM base),
      bm AS (
        SELECT h.doc_id, round(sum(
                 ln((st.n - df.df + 0.5) / (df.df + 0.5) + 1) *
                   (h.tf * 2.2) /
                   (h.tf + 1.2 * (0.25 + 0.75 * h.dl / st.avgdl))), 4) AS bm25
        FROM hits h JOIN df USING (term), st
        GROUP BY h.doc_id),
      sparse_all AS (
        SELECT doc_id,
               row_number() OVER (ORDER BY bm25 DESC, doc_id) AS sr
        FROM bm),
      sparse AS (SELECT * FROM sparse_all WHERE sr <= 50)
      SELECT coalesce(dense.doc_id, sparse.doc_id) AS doc_id,
             round(coalesce(1.0 / (dr + 60.0), 0) +
                   coalesce(1.0 / (sr + 60.0), 0), 6) AS rrf
      FROM dense FULL OUTER JOIN sparse ON dense.doc_id = sparse.doc_id
      ORDER BY rrf DESC, doc_id
      LIMIT 10"""))

  // ---------------------------------------------------------------- s10
  /** MMR (maximal marginal relevance) diversified re-ranking: top-30
    * cosine shortlist for query vec 0, then 10 greedy picks maximizing
    * λ·sim(q,c) − (1−λ)·max sim(c, already-picked), λ = 0.7 — the
    * relevance-vs-redundancy re-ranker every RAG retrieval stack runs
    * after ANN.
    *
    * The greedy loop is inherently sequential in k, but k and the
    * shortlist size are CONSTANTS — so the selection runs as ONE
    * `aggregate` fold over sequence(1,k) on one aggregated shortlist
    * row, state = struct(picked list, remaining list). One fixed-size
    * expression evaluated iteratively at runtime (an earlier unrolled
    * withColumn-chain version grew the Catalyst tree ~3^k and hung the
    * optimizer — the fold is the right encoding). No driver-side
    * collect-loop; the shortlist never leaves the executors. Scale
    * shape: the expensive part (corpus → top-30) is the s01
    * broadcast-probe scan; the MMR tail is O(k²·30) expression work on
    * one row. The oracle unrolls the same 10 picks as chained CTEs —
    * DuckDB replays shortlist, penalties, argmax (same left-to-right
    * float math as the fused CosineSimilarity loop, 0.7/0.3 as literals
    * in both engines, ties by id), so the whole diversification
    * pipeline is hash-checked. */
  val s10 = Q("s10_mmr_diversify",
    (s, dir) => {
      val e = emb(s, dir)
      val q = e.filter(col("vec_id") === 0).select(col("v").as("qv"))
      val short = e.join(broadcast(q), col("vec_id") =!= lit(0))
        .withColumn("qsim", cosine_similarity(col("qv"), col("v")))
        .orderBy(col("qsim").desc, col("vec_id")).limit(30)
        .select(col("vec_id").as("id"), col("v"), col("qsim"))
      // argmax over the remaining candidates, scored against the picks so
      // far; SQL lambdas have no let-binding, so `best` is re-derived per
      // field via array_max (30-element array ops — negligible)
      val best =
        """array_max(transform(st.rem, c -> named_struct(
             'score', 0.7 * c.qsim - 0.3 * coalesce(
                array_max(transform(st.sel, x -> cosine_similarity(c.v, x.v))), 0.0d),
             'nid', -c.id, 'id', c.id, 'v', c.v, 'qsim', c.qsim)))"""
      val df = short
        .agg(collect_list(struct(col("id"), col("v"), col("qsim"))).as("rem0"))
        .select(expr(
          s"""aggregate(
                sequence(1, 10),
                named_struct(
                  'sel', cast(array() as array<struct<id: bigint, v: array<double>, qsim: double, score: double>>),
                  'rem', rem0),
                (st, i) -> named_struct(
                  'sel', array_append(st.sel, named_struct(
                     'id', $best.id, 'v', $best.v,
                     'qsim', $best.qsim, 'score', $best.score)),
                  'rem', filter(st.rem, c -> c.id != $best.id)),
                st -> st.sel)""").as("sel"))
      df.select(posexplode(col("sel")).as(Seq("pos", "p")))
        .select((col("pos") + 1).cast("int").as("rank"),
          col("p.id").as("vec_id"),
          round(col("p.score"), 4).as("mmr_score"),
          round(col("p.qsim"), 4).as("cosine"))
        .orderBy("rank")
    },
    Some(s10OracleSql))

  private def s10OracleSql: String = {
    val cos = (a: String, b: String) =>
      s"list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)))"
    val steps = (1 to 10).map { i =>
      val prevSel = if (i == 1) "sel0" else s"sel${i - 1}"
      s"""
      b$i AS (
        SELECT c.id, c.v, c.qsim,
               0.7 * c.qsim - 0.3 * coalesce(list_max(
                 list_transform(s.sel, x -> ${cos("c.v", "x.v")})), 0.0) AS score
        FROM cand c, $prevSel s
        WHERE NOT list_contains(list_transform(s.sel, x -> x.id), c.id)
        ORDER BY score DESC, c.id LIMIT 1),
      sel$i AS (
        SELECT list_append(s.sel, {'id': b.id, 'v': b.v, 'qsim': b.qsim, 'score': b.score}) AS sel
        FROM $prevSel s, b$i b)"""
    }.mkString(",")
    val out = (1 to 10).map(i =>
      s"SELECT $i AS rank, id AS vec_id, round(score, 4) AS mmr_score, round(qsim, 4) AS cosine FROM b$i")
      .mkString("\n        UNION ALL ")
    s"""
      WITH e AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings),
      q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
      sc AS (
        SELECT e.vec_id AS id, e.v, ${cos("q.qv", "e.v")} AS qsim
        FROM e, q WHERE e.vec_id <> 0),
      cand AS (SELECT id, v, qsim FROM sc ORDER BY qsim DESC, id LIMIT 30),
      sel0 AS (SELECT CAST([] AS STRUCT(id BIGINT, v DOUBLE[], qsim DOUBLE, score DOUBLE)[]) AS sel),$steps
      SELECT rank, vec_id, mmr_score, cosine FROM (
        $out)
      ORDER BY rank"""
  }

  // ---------------------------------------------------------------- s11
  /** kNN label classification: predict each probe vector's label by
    * majority vote among its 10 nearest cosine neighbors (ties broken by
    * smaller label id — deterministic). The retrieval stage is exactly the
    * s01 broadcast-probe shape — the corpus streams once past an in-memory
    * probe table, no corpus shuffle — and the vote is a bounded aggregate
    * on (query, label). At scale the retrieval swaps for the s03 IVF probe
    * with the vote unchanged; this exact variant doubles as its oracle. */
  val s11 = Q("s11_knn_classify",
    (s, dir) => {
      val e = emb(s, dir)
      val q = e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("query_id"), col("v").as("qv"))
      val topk = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("vec_id"))
      val vote = Window.partitionBy("query_id").orderBy(col("votes").desc, col("label"))
      e.join(broadcast(q), col("vec_id") =!= col("query_id"))
        .withColumn("cosine", cosine_similarity(col("qv"), col("v")))
        .withColumn("rn", row_number().over(topk))
        .filter(col("rn") <= 10)
        .groupBy("query_id", "label")
        .agg(count(lit(1)).as("votes"))
        .withColumn("rk", row_number().over(vote))
        .filter(col("rk") === 1)
        .select(col("query_id"), col("label").as("predicted_label"), col("votes"))
        .orderBy("query_id")
    },
    Some("""
      WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
      q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 20),
      scored AS (
        SELECT q.query_id, e.vec_id, e.label,
               list_dot_product(q.qv, e.v) /
                 (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(e.v, e.v))) AS cosine
        FROM q JOIN e ON e.vec_id <> q.query_id),
      topk AS (
        SELECT query_id, label,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, vec_id) AS rn
        FROM scored),
      votes AS (
        SELECT query_id, label, count(*) AS votes
        FROM topk WHERE rn <= 10
        GROUP BY query_id, label),
      win AS (
        SELECT query_id, label, votes,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY votes DESC, label) AS rk
        FROM votes)
      SELECT query_id, label AS predicted_label, votes
      FROM win WHERE rk = 1
      ORDER BY query_id"""))

  // ---------------------------------------------------------------- s12
  /** Retrieval-quality metrics — recall@10, MRR, nDCG@10 — for the ANN
    * family, the eval loop every retrieval system ships with. Relevance
    * ground truth is label agreement (the same convention s11's
    * classifier uses); 20 probe queries ride the s01 broadcast-probe
    * scan, so metric computation adds only bounded per-query windows and
    * a label-histogram broadcast to the retrieval pass itself — at
    * 100 TB the retrieval leg swaps for the IVF probe (s03) with the
    * metric stage unchanged. Ranks and relevance flags are integers, so
    * the metrics are deterministic up to the 1e-6 rounding both engines
    * share; DuckDB replays the entire pipeline (retrieval included), so
    * the hash gate checks the eval AND the retrieval it evaluates. */
  val s12 = Q("s12_retrieval_metrics",
    (s, dir) => {
      val e = emb(s, dir)
      val q = e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("query_id"), col("v").as("qv"),
          col("label").as("qlabel"))
      val labelCounts = e.groupBy("label").agg(count(lit(1)).as("n_label"))
      val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("vec_id"))
      val ranked = e.join(broadcast(q), col("vec_id") =!= col("query_id"))
        .withColumn("cosine", cosine_similarity(col("qv"), col("v")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 10)
        .withColumn("rel", (col("label") === col("qlabel")).cast("int"))
      ranked
        .groupBy("query_id", "qlabel")
        .agg(sum("rel").as("hits"),
          max(when(col("rel") === 1, lit(1.0) / col("rn"))).as("mrr_raw"),
          sum(col("rel") / log2(col("rn") + 1)).as("dcg"))
        .join(broadcast(labelCounts), col("qlabel") === col("label"))
        .withColumn("n_rel", col("n_label") - 1) // corpus matches excl. self
        // a query whose label is unique has nothing to retrieve: excluded
        // from eval (cut = 0 would divide by zero and the idcg sequence
        // degenerates) — the oracle applies the same exclusion
        .where(col("n_rel") > 0)
        .withColumn("cut", least(lit(10L), col("n_rel")))
        .withColumn("idcg",
          expr("aggregate(sequence(1L, cut), 0d, (acc, i) -> acc + 1.0/log2(i + 1))"))
        .select(col("query_id"), col("n_rel"),
          round(col("hits") / col("cut"), 6).as("recall10"),
          round(coalesce(col("mrr_raw"), lit(0.0)), 6).as("mrr"),
          round(col("dcg") / col("idcg"), 6).as("ndcg10"))
        .orderBy("query_id")
    },
    Some("""
      WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
      q AS (SELECT vec_id AS query_id, v AS qv, label AS qlabel
            FROM e WHERE vec_id < 20),
      lc AS (SELECT label, count(*) AS n_label FROM e GROUP BY label),
      scored AS (
        SELECT q.query_id, q.qlabel, e.vec_id, e.label,
               list_dot_product(q.qv, e.v) /
                 (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(e.v, e.v))) AS cosine
        FROM q JOIN e ON e.vec_id <> q.query_id),
      ranked AS (
        SELECT query_id, qlabel,
               CASE WHEN label = qlabel THEN 1 ELSE 0 END AS rel,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, vec_id) AS rn
        FROM scored),
      top AS (SELECT * FROM ranked WHERE rn <= 10),
      agg AS (
        SELECT query_id, qlabel, sum(rel) AS hits,
               max(CASE WHEN rel = 1 THEN 1.0 / rn END) AS mrr_raw,
               sum(rel / log2(rn + 1)) AS dcg
        FROM top GROUP BY query_id, qlabel)
      SELECT a.query_id, lc.n_label - 1 AS n_rel,
             round(a.hits / least(10, lc.n_label - 1), 6) AS recall10,
             round(coalesce(a.mrr_raw, 0), 6) AS mrr,
             round(a.dcg / list_sum(list_transform(
               range(1, CAST(least(10, lc.n_label - 1) AS BIGINT) + 1),
               i -> 1.0 / log2(i + 1))), 6) AS ndcg10
      FROM agg a JOIN lc ON a.qlabel = lc.label
      WHERE lc.n_label > 1
      ORDER BY a.query_id"""))

  val queries: Seq[Q] = Seq(s01, s02, s03, s04, s05, s06, s07, s08, s09, s10,
    s11, s12)
}
