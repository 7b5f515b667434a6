package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, decoded/feature-extracted in partition-sized batches.
  *
  * The decode step is a REAL image codec ([[ImageCodec]], JDK
  * `javax.imageio` PNG): the documents table has no image column, so
  * m02 first renders each doc into a small deterministic grayscale PNG
  * (executor-side, same mapPartitions batch), then decodes those actual
  * PNG bytes back into features. The Spark-side contract — binary
  * column + metadata struct + partition-wise batch processing + schema
  * of extracted features — is exercised with real codec init cost and
  * real byte streams; swapping PNG for JPEG/webp/audio is one function.
  *
  * Scale notes: binary payloads ride through Tungsten as byte arrays —
  * no base64 inflation; the codec runs via mapPartitions so per-batch
  * setup cost amortizes across a whole partition, exactly how a
  * Pandas-UDF batch would behave in PySpark.
  */
object MultimodalOps {

  /** JDK-only PNG codec. Encoding is deterministic in the PIXELS (the
    * PNG byte stream itself may differ across encoder versions, which is
    * why features — not payload digests — are what tests pin): a seed
    * byte array is md5-expanded into a w×h grayscale raster. Decoding is
    * a true `ImageIO.read` over the PNG bytes — a real parse of a real
    * image container, not arithmetic on the input. */
  object ImageCodec {
    java.lang.System.setProperty("java.awt.headless", "true")

    final case class Features(width: Int, height: Int, mean_byte: Double, format: String)

    /** Render a seed into a tiny grayscale PNG (8–31 px per side).
      *
      * The raster is a counter-mode md5 expansion: pixel block j is
      * md5(seed ‖ ":" ‖ ascii(j)). Counter mode (rather than chaining
      * raw digests) is deliberate: DuckDB's md5 is VARCHAR-only, so this
      * exact raster — and therefore the decoded features — replays in
      * the SQL oracle as md5(text || ':' || j), which is what upgrades
      * m02 from rows-only to a full hash gate. */
    def encodePng(seed: Array[Byte]): Array[Byte] = {
      val w = 8 + (seed.headOption.map(b => b & 0xFF).getOrElse(0) % 24)
      val h = 8 + (seed.lastOption.map(b => b & 0xFF).getOrElse(0) % 24)
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val md = java.security.MessageDigest.getInstance("MD5")
      var block: Array[Byte] = null
      var bi = 16
      var j = 0
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          if (bi == 16) {
            md.reset()
            md.update(seed)
            md.update((":" + j).getBytes("UTF-8"))
            block = md.digest()
            j += 1
            bi = 0
          }
          raster.setSample(x, y, 0, block(bi) & 0xFF)
          bi += 1
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** Real decode: parse the PNG container, read back raster stats. */
    def decode(payload: Array[Byte]): Features = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      require(img != null, "payload is not a decodable image")
      val w = img.getWidth
      val h = img.getHeight
      val raster = img.getRaster
      var sum = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          sum += raster.getSample(x, y, 0)
          x += 1
        }
        y += 1
      }
      // raw mean — rounding happens at the query layer so Spark's and
      // the oracle's round() see the identical exact quotient
      Features(w, h, sum.toDouble / (w.toLong * h), "png")
    }
  }

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.df(s, dir, "documents")

  // ---------------------------------------------------------------- m01
  /** Binary-column metadata: payload size, digest, magic bytes — all
    * computed without materializing strings (codegen'd binary functions). */
  val m01 = Q("m01_binary_meta",
    (s, dir) =>
      docs(s, dir)
        .withColumn("payload", col("text").cast("binary"))
        .select(
          col("doc_id"),
          length(col("payload")).cast("long").as("n_bytes"),
          md5(col("payload")).as("digest"),
          hex(substring(col("payload"), 1, 2)).as("magic"))
        .orderBy("doc_id"),
    Some("""
      SELECT doc_id,
             octet_length(encode(text)) AS n_bytes,
             md5(text) AS digest,
             hex(encode(substr(text, 1, 2))) AS magic
      FROM documents
      ORDER BY doc_id"""))

  // ---------------------------------------------------------------- m02
  /** Batch feature extraction over binary payloads via mapPartitions —
    * the multimodal decode pipeline shape, with a REAL `javax.imageio`
    * PNG decode. Each doc's text bytes seed a deterministic rendered
    * PNG; the decode stage parses those actual PNG bytes. Cross-engine
    * oracle stays rows-only (DuckDB has no image codec); OpsGoldenSpec
    * pins determinism and the round-trip against the raster truth. */
  val m02 = Q("m02_decode_features",
    (s, dir) => {
      val spark = s
      import spark.implicits._
      val src = docs(s, dir)
        .select(col("doc_id"), col("text").cast("binary").as("payload"),
          struct(col("source"), col("lang")).as("meta"))
        .as[(Long, Array[Byte], (String, String))]
      src.mapPartitions { it =>
        // one codec per partition: ImageIO plugin lookup + headless AWT
        // init happen once here, amortized across the whole batch
        it.map { case (id, seed, (source, _)) =>
          val png = ImageCodec.encodePng(seed) // real PNG bytes
          val f = ImageCodec.decode(png)       // real container parse
          (id, source, f.width, f.height, f.mean_byte, f.format)
        }
      }.toDF("doc_id", "source", "width", "height", "mean_byte", "format")
        .withColumn("mean_byte", round(col("mean_byte"), 4))
        .orderBy("doc_id")
    },
    // The oracle replays the whole pipeline in SQL: the counter-mode
    // raster (md5(text||':'||j), hex pairs → bytes) IS the image the
    // real PNG round-trip must reproduce losslessly, so the decoded
    // width/height/mean hash-match an engine with no image codec at all.
    Some("""
      WITH base AS (
        SELECT doc_id, source, text,
               8 + (ascii(substr(text, 1, 1)) % 24) AS w,
               8 + (ascii(substr(text, length(text), 1)) % 24) AS h
        FROM documents),
      blocks AS (
        -- range() takes no lateral params; 61 = ceil(31*31/16) covers the
        -- largest possible raster, the WHERE trims per doc
        SELECT doc_id, source, w, h, j,
               md5(text || ':' || CAST(j AS VARCHAR)) AS hx
        FROM base, range(61) t(j)
        WHERE j * 16 < w * h),
      px AS (
        SELECT b.doc_id, b.source, b.w, b.h,
               (strpos('0123456789abcdef', substr(b.hx, 2*p.p+1, 1)) - 1) * 16
               + strpos('0123456789abcdef', substr(b.hx, 2*p.p+2, 1)) - 1 AS v
        FROM blocks b, range(16) p(p)
        WHERE b.j * 16 + p.p < b.w * b.h)
      SELECT doc_id, source, w AS width, h AS height,
             round(sum(v) / (w * h), 4) AS mean_byte, 'png' AS format
      FROM px
      GROUP BY doc_id, source, w, h
      ORDER BY doc_id"""))

  // ---------------------------------------------------------------- m03
  /** Video frame sampling: one row per sampled frame of each payload.
    *
    * The pipeline shape that matters at scale: the sampling schedule
    * (every 30th frame of a per-payload frame count) is computed entirely
    * in expression space — `sequence` + `explode` stay inside whole-stage
    * codegen and the explode multiplies rows AFTER partition pruning, so
    * a 100 TB video corpus fans out executor-side, never via the driver.
    * The per-frame decode is where a codec UDF would sit; the stand-in is
    * md5(payload ‖ frame index), deterministic and engine-independent,
    * which is what lets a SQL oracle check the full fan-out exactly.
    * Frame count is derived from payload bytes (fake "duration"): real
    * metadata would ride in a struct column as in m02. */
  val m03 = Q("m03_frame_sample",
    (s, dir) =>
      docs(s, dir)
        .withColumn("n_frames",
          (length(col("text").cast("binary")) % 240 + 60).cast("int"))
        .select(col("doc_id"), col("text"),
          explode(sequence(lit(0), col("n_frames") - 1, lit(30))).as("frame_idx"))
        .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
          md5(concat(col("text"), lit(":"), col("frame_idx").cast("string"))
            .cast("binary")).as("frame_digest"))
        .orderBy("doc_id", "frame_idx"),
    Some("""
      SELECT doc_id, f.frame_idx,
             md5(text || ':' || CAST(f.frame_idx AS VARCHAR)) AS frame_digest
      FROM documents,
      LATERAL (SELECT unnest(range(0, octet_length(encode(text)) % 240 + 60, 30)) AS frame_idx) f
      ORDER BY doc_id, frame_idx"""))

  // ---------------------------------------------------------------- m04
  /** Overlapping-window document chunking — the retrieval/embedding
    * pipeline's splitter: token windows of 64 with stride 48 (16-token
    * overlap so no boundary sentence is lost), one row per chunk with its
    * re-joined text and true token count (the tail chunk is shorter).
    *
    * Entirely expression-space: the window schedule is `sequence` +
    * `transform` + `slice` inside codegen, so a corpus fans out
    * executor-side with no UDF and no driver involvement; the chunk rows
    * feed straight into an embedding UDF batch (m02's mapPartitions
    * contract) or a write partitioned by source. */
  val m04 = Q("m04_chunking",
    (s, dir) =>
      docs(s, dir)
        .select(col("doc_id"),
          expr("filter(split(text, ' '), x -> x != '')").as("toks"))
        // last start ≤ size−16 (not −15): a start of exactly size−15 would
        // produce a 16-token tail fully contained in the previous chunk.
        // Coverage stays complete — stride 48 < window 64 overlaps, and
        // the largest kept start is > size−64 so the tail is reached.
        .select(col("doc_id"), posexplode(expr(
          "transform(sequence(1, greatest(1, size(toks) - 16), 48), " +
            "i -> concat_ws(' ', slice(toks, i, 64)))")).as(Seq("chunk_idx", "chunk_text")))
        .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
          col("chunk_text"),
          size(expr("filter(split(chunk_text, ' '), x -> x != '')"))
            .cast("long").as("n_tokens"))
        .orderBy("doc_id", "chunk_idx"),
    Some("""
      WITH t AS (
        SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
        FROM documents),
      chunks AS (
        SELECT doc_id,
               generate_subscripts(starts, 1) - 1 AS chunk_idx,
               list_transform(starts, i -> array_to_string(toks[i:i+63], ' ')) AS texts
        FROM (SELECT doc_id, toks,
                     range(1, greatest(1, len(toks) - 16) + 1, 48) AS starts
              FROM t))
      SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
             texts[chunk_idx + 1] AS chunk_text,
             CAST(len(list_filter(string_split(texts[chunk_idx + 1], ' '),
                  x -> x <> '')) AS BIGINT) AS n_tokens
      FROM chunks
      ORDER BY doc_id, chunk_idx"""))

  // ---------------------------------------------------------------- m05
  /** Parameterized modality-balanced batch interleave: place samples
    * (rows with `doc_id` and a `modality` drawn from `modalities`) so
    * every training batch draws all modalities round-robin, instead of
    * long runs of one modality (which wreck multimodal training
    * dynamics). Deterministic formulation: within each of `nShards`
    * shards (doc_id mod nShards), rank each modality's samples by
    * digest, then global position = rank·|modalities| + modality-index —
    * a perfect interleave until a modality exhausts. Batches of
    * `batchSize` are profiled per modality to verify balance. Sharding
    * bounds every per-(shard, modality) ranking window — `nShards`
    * scales with the input without changing any shard's interleave
    * (ShardedOpsSpec pins that locality), the t15 discipline. */
  def modalityInterleave(df: DataFrame, modalities: Seq[String],
      nShards: Int, batchSize: Int): DataFrame = {
    val k = modalities.size
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard", "modality")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    val counts = modalities.map(m =>
      sum(when(col("modality") === m, 1L).otherwise(0L)).as(s"n_$m"))
    df.select(col("doc_id"),
        pmod(col("doc_id"), lit(nShards)).as("shard"),
        col("modality"))
      // rows whose modality is NOT in `modalities` are excluded up front:
      // array_position returns 0 for a missing element, so without this
      // filter they would get m_idx = -1 and silently collide with (or
      // precede) the first listed modality's interleave slots
      .filter(col("modality").isin(modalities.map(m => m: Any): _*))
      .withColumn("m_idx",
        array_position(array(modalities.map(lit): _*), col("modality")) - 1)
      .withColumn("rk", row_number().over(w))
      .withColumn("pos", (col("rk") - 1) * k + col("m_idx"))
      .withColumn("batch", floor(col("pos") / batchSize))
      .groupBy("shard", "batch")
      .agg(counts.head, (counts.tail :+ count(lit(1)).as("n_total")): _*)
  }

  /** The 4-shard × batch-30 text/image/audio instance, pinned by the
    * DuckDB oracle; modality here is synthesized from doc_id (the
    * container carries no media column) — the plumbing, not the decode,
    * is what this pins. */
  val m05 = Q("m05_modality_interleave",
    (s, dir) =>
      modalityInterleave(
        docs(s, dir).select(col("doc_id"),
          element_at(array(lit("text"), lit("image"), lit("audio")),
            pmod(col("doc_id"), lit(3)).cast("int") + 1).as("modality")),
        modalities = Seq("text", "image", "audio"), nShards = 4, batchSize = 30)
        .orderBy("shard", "batch"),
    Some("""
      WITH t AS (
        SELECT doc_id, doc_id % 4 AS shard, doc_id % 3 AS m_idx,
               CASE doc_id % 3 WHEN 0 THEN 'text' WHEN 1 THEN 'image'
                    ELSE 'audio' END AS modality
        FROM documents),
      r AS (
        SELECT *, row_number() OVER (PARTITION BY shard, modality
                 ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        FROM t),
      p AS (
        SELECT shard, modality, (rk - 1) * 3 + m_idx AS pos FROM r)
      SELECT CAST(shard AS BIGINT) AS shard,
             CAST(floor(pos / 30) AS BIGINT) AS batch,
             CAST(sum(CASE WHEN modality = 'text' THEN 1 ELSE 0 END) AS BIGINT) AS n_text,
             CAST(sum(CASE WHEN modality = 'image' THEN 1 ELSE 0 END) AS BIGINT) AS n_image,
             CAST(sum(CASE WHEN modality = 'audio' THEN 1 ELSE 0 END) AS BIGINT) AS n_audio,
             count(*) AS n_total
      FROM p
      GROUP BY shard, batch
      ORDER BY shard, batch"""))

  /** 64-bit average-hash over a decoded image: downsample the raster to
    * 8×8 by block-mean, bit i = cell > global mean. Hamming distance
    * between aHashes survives re-encoding, resizing, and mild noise —
    * the image-dedup primitive (pHash's simpler sibling). */
  def aHash(img: java.awt.image.BufferedImage): Long = {
    val (w, h) = (img.getWidth, img.getHeight)
    val raster = img.getRaster
    val cells = new Array[Double](64)
    var cy = 0
    while (cy < 8) {
      var cx = 0
      while (cx < 8) {
        // block [x0,x1) × [y0,y1); ≥1 px per block for any w,h ≥ 8
        val (x0, x1) = (cx * w / 8, math.max((cx + 1) * w / 8, cx * w / 8 + 1))
        val (y0, y1) = (cy * h / 8, math.max((cy + 1) * h / 8, cy * h / 8 + 1))
        var sum = 0L; var n = 0
        var y = y0
        while (y < y1 && y < h) {
          var x = x0
          while (x < x1 && x < w) { sum += raster.getSample(x, y, 0); n += 1; x += 1 }
          y += 1
        }
        cells(cy * 8 + cx) = sum.toDouble / math.max(n, 1)
        cx += 1
      }
      cy += 1
    }
    val mean = cells.sum / 64
    var bits = 0L
    var i = 0
    while (i < 64) { if (cells(i) > mean) bits |= (1L << i); i += 1 }
    bits
  }

  // ---------------------------------------------------------------- m06
  /** Perceptual image dedup — the multimodal member of the dedup family:
    * render each doc's PNG (m02 pipeline), REAL-decode it, compute the
    * 64-bit aHash, and emit near-dup pairs at hamming ≤ 4 via the d03
    * pigeonhole trick (≤ 4 bit flips over 4 16-bit segments ⇒ ≥ 1
    * segment equal → equi-join, no pair space).
    *
    * Scale shape: codec + hash run in mapPartitions batches (one scan);
    * everything after is 1 long per image — the segment join's key space
    * grows with corpus size, candidates deduped by partial-agg min.
    * The corpus has no image column, so each doc renders the PNG of its
    * asset key (source + size bucket) — the re-uploaded-asset scenario,
    * which gives the fixture real duplicate images (the raw text would
    * render 500 unique rasters and an empty board row). Oracle: the
    * hash rides a real codec DuckDB lacks, BUT identical pixels ⟺ equal
    * asset keys (encodePng is deterministic; md5 expansion is avalanche
    * — unequal seeds give uncorrelated rasters, P(hamming ≤ 4) ≈
    * 3·10⁻¹⁴ per pair), so the key-equality self-join predicts the pair
    * set exactly and the driver hash-checks end-to-end.
    * MultimodalPhashSpec pins the part the fixture can't show:
    * genuinely NEAR (not identical) images — noised re-encodes land
    * within hamming ≤ 4, distinct images far outside. */
  val m06 = Q("m06_phash_dedup",
    (s, dir) => {
      val spark = s
      import spark.implicits._
      val hashes = docs(s, dir)
        .select(col("doc_id"),
          concat_ws(":", col("source"), floor(col("n_chars") / 100).cast("long"))
            .cast("binary").as("payload"))
        .as[(Long, Array[Byte])]
        .mapPartitions { it =>
          it.map { case (id, seed) =>
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(ImageCodec.encodePng(seed)))
            (id, aHash(img))
          }
        }.toDF("doc_id", "ahash")
      val seg = hashes.select(col("doc_id"), col("ahash"),
        explode(array((0 until 4).map(k =>
          struct(lit(k).as("seg"),
            shiftright(col("ahash"), k * 16).bitwiseAND(0xFFFFL).as("sv"))): _*)).as("sg"))
        .select(col("doc_id"), col("ahash"), col("sg.seg").as("seg"), col("sg.sv").as("sv"))
      seg.alias("x").join(seg.alias("y"), Seq("seg", "sv"))
        .filter(col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
          bit_count(col("x.ahash").bitwiseXOR(col("y.ahash"))).as("hamming"))
        .filter(col("hamming") <= 4)
        .distinct()
        .orderBy("doc_a", "doc_b")
    },
    Some("""
      WITH k AS (
        SELECT doc_id,
               source || ':' || CAST(CAST(floor(n_chars / 100) AS BIGINT) AS VARCHAR)
                 AS asset_key
        FROM documents)
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(0 AS INTEGER) AS hamming
      FROM k a JOIN k b
        ON a.asset_key = b.asset_key AND a.doc_id < b.doc_id
      ORDER BY doc_a, doc_b"""))

  /** Frame-level audio decode stand-in (the audio twin of [[ImageCodec]]):
    * the waveform is a counter-mode md5 expansion of the payload — frame j
    * is the 16 bytes of md5(seed ‖ ":" ‖ j), each byte one centered
    * sample (v − 128) — so the SAME stream replays in the SQL oracle as
    * md5(text || ':' || j) hex pairs (the m02 trick; real audio codecs
    * aren't in this container, and the prompt's contract is deterministic
    * fake decode + REAL Spark plumbing). Per frame it returns the
    * INTEGER sum of squared amplitudes: keeping the energy integral
    * until the final projection means the silence decision and every
    * aggregate are integer-exact across engines. */
  object AudioCodec {
    final val SamplesPerFrame = 16

    /** (frameIdx, sumOfSquaredAmplitudes) per frame; frame count derives
      * from the payload head (10–19), the m02 metadata convention. */
    def decodeFrames(seed: Array[Byte]): Seq[(Int, Long)] = {
      val nFrames = 10 + (seed.headOption.map(b => b & 0xFF).getOrElse(0) % 10)
      val md = java.security.MessageDigest.getInstance("MD5")
      (0 until nFrames).map { j =>
        md.reset()
        md.update(seed)
        md.update(s":$j".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
        val block = md.digest()
        var sum = 0L
        var i = 0
        while (i < SamplesPerFrame) {
          val a = (block(i) & 0xFF) - 128
          sum += a.toLong * a
          i += 1
        }
        (j, sum)
      }
    }
  }

  // ---------------------------------------------------------------- m07
  /** Audio silence segmentation — the third modality's decode→feature
    * pipeline (image m02/m06, video m03): per-frame RMS energy, a
    * silence gate, and gaps-and-islands over the loud frames into
    * speech-like segments (n_segments, longest run, overall RMS). The
    * decode runs in mapPartitions like m02 (one digest instance per
    * batch); segmentation is the e16 islands trick per doc over ≤ 19
    * frames. The silence gate compares the INTEGER energy sum against
    * 74²·16 — uniform bytes have E[RMS] ≈ 73.9, so the threshold splits
    * frames — and overall_rms derives from the exact integer total, so
    * every emitted number is cross-engine deterministic without
    * tolerance. */
  val m07 = Q("m07_audio_segments",
    (s, dir) => {
      val spark = s
      import spark.implicits._
      val frames = docs(s, dir)
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .as[(Long, Array[Byte])]
        .mapPartitions(_.flatMap { case (id, seed) =>
          AudioCodec.decodeFrames(seed).map { case (j, ss) => (id, j, ss) }
        })
        .toDF("doc_id", "frame_idx", "sum_sq")
      val loudW = Window.partitionBy("doc_id").orderBy("frame_idx")
      val segs = frames
        .filter(col("sum_sq") >= 74L * 74L * 16L)
        .withColumn("grp", col("frame_idx") - row_number().over(loudW))
        .groupBy("doc_id", "grp").agg(count(lit(1)).as("seg_len"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_segments"), max("seg_len").as("longest_seg"),
          sum("seg_len").as("n_loud"))
      frames.groupBy("doc_id")
        .agg(count(lit(1)).as("n_frames"), sum("sum_sq").as("total_sq"))
        .join(segs, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_frames"),
          coalesce(col("n_loud"), lit(0L)).as("n_loud"),
          coalesce(col("n_segments"), lit(0L)).as("n_segments"),
          coalesce(col("longest_seg"), lit(0L)).as("longest_seg"),
          round(sqrt(col("total_sq") /
            (col("n_frames") * lit(16.0))), 4).as("overall_rms"))
        .orderBy("doc_id")
    },
    Some("""
      WITH base AS (
        SELECT doc_id, text,
               10 + (ascii(substr(text, 1, 1)) % 10) AS n_frames
        FROM documents),
      fr AS (
        SELECT doc_id, n_frames, j,
               md5(text || ':' || CAST(j AS VARCHAR)) AS hx
        FROM base, range(19) t(j)
        WHERE j < n_frames),
      sam AS (
        SELECT f.doc_id, f.n_frames, f.j,
               ((strpos('0123456789abcdef', substr(f.hx, 2*p.p+1, 1)) - 1) * 16
                + strpos('0123456789abcdef', substr(f.hx, 2*p.p+2, 1)) - 1
                - 128) AS a
        FROM fr f, range(16) p(p)),
      energy AS (
        SELECT doc_id, n_frames, j, sum(a * a) AS sum_sq
        FROM sam GROUP BY 1, 2, 3),
      loud AS (
        SELECT doc_id, j,
               j - row_number() OVER (PARTITION BY doc_id ORDER BY j) AS grp
        FROM energy WHERE sum_sq >= 87616),
      seg AS (
        SELECT doc_id, count(*) AS seg_len FROM loud GROUP BY doc_id, grp),
      per_doc_seg AS (
        SELECT doc_id, count(*) AS n_segments, max(seg_len) AS longest_seg,
               CAST(sum(seg_len) AS BIGINT) AS n_loud
        FROM seg GROUP BY doc_id),
      per_doc AS (
        SELECT doc_id, CAST(max(n_frames) AS BIGINT) AS n_frames,
               sum(sum_sq) AS total_sq
        FROM energy GROUP BY doc_id)
      SELECT d.doc_id, d.n_frames,
             coalesce(s.n_loud, 0) AS n_loud,
             coalesce(s.n_segments, 0) AS n_segments,
             coalesce(s.longest_seg, 0) AS longest_seg,
             round(sqrt(d.total_sq / (d.n_frames * 16.0)), 4) AS overall_rms
      FROM per_doc d LEFT JOIN per_doc_seg s USING (doc_id)
      ORDER BY d.doc_id"""))

  val queries: Seq[Q] = Seq(m01, m02, m03, m04, m05, m06, m07)
}
