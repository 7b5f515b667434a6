package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parity implementation of the reference store's two file-chunking
  * modes (`/root/reference/lib/mini_hadoop/master/file_operation.ex:159-191`,
  * benchmarked in `/root/reference/benchmark_split.exs:24-58`):
  *
  *   - DEFAULT (byte-aligned): the file is sliced into fixed
  *     `blockSize`-byte blocks with NO regard for record boundaries —
  *     a line (and therefore a word) straddling a block boundary is
  *     torn in two, and a mapper fed one-block-at-a-time sees two
  *     fragments (the §4.3.1 correctness hazard: WordCount over
  *     byte-aligned blocks miscounts every boundary word);
  *   - `split_on_newline: true`: whole lines are packed greedily —
  *     a new block starts when adding the next line would exceed
  *     `blockSize` and the current block is non-empty, so a single
  *     oversized line becomes its own oversized block.
  *
  * The engine's normal ingest is `spark.read.text`, which is
  * line-aligned FOR FREE at any scale (HDFS-style readers resync to
  * the next newline past each split boundary) — equivalent to the
  * reference's opt-in mode and the only record-correct choice. This
  * module exists as the byte-exact ESCAPE HATCH for reproducing the
  * reference's default store layout (e.g. validating block-level
  * digests against an existing deployment), not as a recommended
  * path; ByteSplitSpec demonstrates the torn-word hazard it carries.
  *
  * Scale shape: one `binaryFile` row per file; byte mode slices in
  * expression space (sequence + substring — codegen, no driver work);
  * line mode is a per-FILE greedy scan (inherently sequential per
  * file, parallel across files — the same granularity the reference's
  * single-process chunker has, minus its global serialization).
  */
object BlockSplit {

  /** One row per byte-aligned block: (path, block_index, data: binary).
    * Torn records are reproduced faithfully; concatenating a file's
    * blocks in index order is byte-identical to the file. */
  def byteBlocks(spark: SparkSession, path: String, blockSize: Int): DataFrame =
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .filter(length(col("content")) > 0)
      .select(col("path"),
        posexplode(expr(
          s"""transform(
             |  sequence(0, int(ceil(length(content) / CAST($blockSize AS DOUBLE))) - 1),
             |  i -> substring(content, i * $blockSize + 1, $blockSize))"""
            .stripMargin)).as(Seq("block_index", "data")))

  /** One row per newline-packed block: (path, block_index, data: binary)
    * — the `split_on_newline: true` chunker. Lines keep their
    * terminators (the reference streams lines with `\n` attached), and
    * the greedy rule is byte-for-byte the reference's `chunk_while`:
    * emit when `current + line > blockSize` and current is non-empty.
    * Line boundaries come from scanning the RAW bytes for 0x0A — no
    * charset decode anywhere, so arbitrary (even invalid-UTF-8) input
    * passes through byte-exact instead of being silently rewritten to
    * replacement characters. */
  def lineBlocks(spark: SparkSession, path: String, blockSize: Int): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        // line end offsets (exclusive), terminators attached
        val bounds = scala.collection.mutable.ArrayBuffer(0)
        var i = 0
        while (i < bytes.length) {
          if (bytes(i) == 0x0A) bounds += i + 1
          i += 1
        }
        if (bounds.last != bytes.length) bounds += bytes.length
        val out = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Array[Byte])]
        var blockStart = 0 // byte offset where the current block began
        var accBytes = 0
        var j = 1
        while (j < bounds.length) {
          val lineBytes = bounds(j) - bounds(j - 1)
          if (accBytes + lineBytes > blockSize && accBytes > 0) {
            out += ((p, out.length,
              java.util.Arrays.copyOfRange(bytes, blockStart, bounds(j - 1))))
            blockStart = bounds(j - 1)
            accBytes = 0
          }
          accBytes += lineBytes
          j += 1
        }
        if (accBytes > 0)
          out += ((p, out.length,
            java.util.Arrays.copyOfRange(bytes, blockStart, bytes.length)))
        out
      }
      .toDF("path", "block_index", "data")
  }
}
