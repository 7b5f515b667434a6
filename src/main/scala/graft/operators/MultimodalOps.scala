package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, decoded/feature-extracted in partition-sized batches.
  *
  * No image/audio codecs exist in this environment, so the decode step is
  * a clearly-marked deterministic fake ([[FakeDecoder]]) — the Spark-side
  * contract (binary column + metadata struct + partition-wise batch
  * processing + schema of extracted features) is the real, tested part,
  * and a codec drop-in replaces one function.
  *
  * Scale notes: binary payloads ride through Tungsten as byte arrays —
  * no base64 inflation; the decoder runs via mapPartitions so per-batch
  * setup cost (a real codec's init) amortizes across a whole partition,
  * exactly how a Pandas-UDF batch would behave in PySpark.
  */
object MultimodalOps {

  /** Deterministic stand-in for an image decoder: derives (width, height,
    * mean byte, format tag) from the payload bytes. A real implementation
    * would decode the image here; the signature is the contract. */
  object FakeDecoder {
    final case class Features(width: Int, height: Int, mean_byte: Double, format: String)
    def decode(payload: Array[Byte]): Features = {
      // ??? real codec goes here — everything below is a deterministic fake
      val w = 16 + (math.abs(payload.headOption.getOrElse(0: Byte).toInt) % 64)
      val h = 16 + (math.abs(payload.lastOption.getOrElse(0: Byte).toInt) % 64)
      val mean = if (payload.isEmpty) 0.0
        else payload.map(b => (b & 0xFF).toDouble).sum / payload.length
      Features(w, h, math.round(mean * 100) / 100.0,
        if (payload.length % 2 == 0) "png" else "jpeg")
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
    * the multimodal decode pipeline shape. Fake decoder → rows-only check;
    * MultimodalSpec pins the exact values. */
  val m02 = Q("m02_decode_features",
    (s, dir) => {
      val spark = s
      import spark.implicits._
      val src = docs(s, dir)
        .select(col("doc_id"), col("text").cast("binary").as("payload"),
          struct(col("source"), col("lang")).as("meta"))
        .as[(Long, Array[Byte], (String, String))]
      src.mapPartitions { it =>
        // one decoder per partition: real codecs have per-process init cost
        it.map { case (id, payload, (source, _)) =>
          val f = FakeDecoder.decode(payload)
          (id, source, f.width, f.height, f.mean_byte, f.format)
        }
      }.toDF("doc_id", "source", "width", "height", "mean_byte", "format")
        .orderBy("doc_id")
    },
    None)

  val queries: Seq[Q] = Seq(m01, m02)
}
