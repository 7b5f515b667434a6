package graft

import graft.core.BlockSplit
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Pins the reference-store chunking parity module (SURVEY §4.3.1).
  *
  * Three claims: (1) byte-aligned blocks reassemble byte-exactly;
  * (2) byte-aligned blocks TEAR boundary words — WordCount over them
  * produces exactly the fragment counts the reference's default mode
  * produces, which differ from the true counts (the documented reason
  * the engine standardizes on line alignment); (3) the newline-packed
  * mode reproduces the reference's greedy `chunk_while` boundaries and
  * never tears a line. */
class ByteSplitSpec extends AnyFunSuite {

  lazy val spark = Session.builder("graft-bytesplit-test").master("local[4]")
    .config("spark.sql.shuffle.partitions", "4").getOrCreate()

  private def writeFixture(text: String): String = {
    val d = Files.createTempDirectory("graft-bytesplit")
    Files.write(d.resolve("f.txt"), text.getBytes("UTF-8"))
    d.toString
  }

  test("byte blocks reassemble to the original bytes in index order") {
    val text = "hello world\nhello spark\n"
    val dir = writeFixture(text)
    val blocks = BlockSplit.byteBlocks(spark, dir, 8)
      .orderBy("block_index")
      .collect().map(_.getAs[Array[Byte]]("data"))
    assert(blocks.map(_.length).sum == text.getBytes("UTF-8").length)
    assert(blocks.forall(_.length <= 8))
    assert(new String(blocks.flatten.toArray, "UTF-8") == text)
  }

  test("byte-aligned blocks tear boundary words; line-aligned ingest does not") {
    val text = "hello world\nhello spark\n"
    val dir = writeFixture(text)
    def countsOf(df: org.apache.spark.sql.DataFrame, dataCol: String) = df
      .select(explode(expr(
        s"filter(split(CAST($dataCol AS STRING), '[ \\n]+'), x -> x != '')")).as("w"))
      .groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 8-byte blocks: |hello wo|rld\nhell|o spark\n| — the reference's
    // default mode hands each block to the mapper whole, so boundary
    // words fragment exactly like this:
    val torn = countsOf(BlockSplit.byteBlocks(spark, dir, 8), "data")
    assert(torn == Map("hello" -> 1L, "wo" -> 1L, "rld" -> 1L,
      "hell" -> 1L, "o" -> 1L, "spark" -> 1L))
    // the engine's default line-aligned read gets the true counts
    val aligned = countsOf(
      spark.read.text(dir).withColumnRenamed("value", "data"), "data")
    assert(aligned == Map("hello" -> 2L, "world" -> 1L, "spark" -> 1L))
  }

  test("newline-packed blocks follow the greedy chunk_while rule, no torn lines") {
    // lines of 6/6/12/6 bytes at blockSize=12: greedy packs |l1 l2|l3|l4|
    // (l3 alone fills a block; a 13-byte line would become its own
    // OVERSIZED block, per the reference's current_size > 0 guard)
    val text = "aaaaa\nbbbbb\nccccccccccc\nddddd\n"
    val dir = writeFixture(text)
    val blocks = BlockSplit.lineBlocks(spark, dir, 12)
      .orderBy("block_index").collect()
      .map(r => new String(r.getAs[Array[Byte]]("data"), "UTF-8"))
    assert(blocks.toSeq == Seq("aaaaa\nbbbbb\n", "ccccccccccc\n", "ddddd\n"))
    assert(blocks.forall(_.endsWith("\n")), "a line was torn")
    assert(blocks.mkString == text)
    // oversized single line: own block, larger than blockSize
    val big = writeFixture("x" * 20 + "\nyy\n")
    val b2 = BlockSplit.lineBlocks(spark, big, 12)
      .orderBy("block_index").collect()
      .map(r => new String(r.getAs[Array[Byte]]("data"), "UTF-8"))
    assert(b2.toSeq == Seq("x" * 20 + "\n", "yy\n"))
  }

  test("mr03 byte-mode WordCount reproduces the fragment miscount end-to-end") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-mr03").toString
    val texts = Seq(
      0L -> ("the quick brown fox jumps over the lazy dog " * 3).trim,
      // 57-char period: the 64-char boundary lands at "alpha b|eta …",
      // tearing "beta" into an invalid "b" and a counted "eta"
      1L -> ("alpha beta gamma delta epsilon zeta eta theta iota kappa " * 2).trim,
      2L -> "short doc")
    texts.toDF("doc_id", "text").coalesce(1)
      .write.parquet(s"$d/documents.parquet")
    // independent model of the reference's default store: fixed-offset
    // 64-char slices, then tokenizer parity per block
    val expected = texts.flatMap { case (_, t) =>
      t.grouped(64).flatMap(graft.examples.WordCount.tokenize)
    }.groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
    val got = Queries.byName("mr03_wordcount_bytemode").build(spark, d)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected)
    // and the miscount is real: line-aligned tokenization disagrees
    val aligned = texts.flatMap { case (_, t) =>
      graft.examples.WordCount.tokenize(t)
    }.groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
    assert(got != aligned)
    assert(got.contains("eta") || got.keySet != aligned.keySet)
  }

  test("newline-packed blocks are byte-exact for invalid-UTF-8 input") {
    // 0xFF / 0xFE are not valid UTF-8; a decode-then-reencode chunker
    // would rewrite them as U+FFFD and shift every later boundary
    val raw = Array[Byte](0xFF.toByte, 0xFE.toByte, 'a', '\n',
      0x80.toByte, 'b', 'c', '\n', 'd', '\n')
    val d = Files.createTempDirectory("graft-bytesplit-bin")
    Files.write(d.resolve("f.bin"), raw)
    val blocks = BlockSplit.lineBlocks(spark, d.toString, 6)
      .orderBy("block_index").collect().map(_.getAs[Array[Byte]]("data"))
    assert(blocks.map(_.length).sum == raw.length)
    assert(blocks.flatten.toSeq == raw.toSeq, "bytes were rewritten")
    assert(blocks.forall(b => b.last == '\n'), "a line was torn")
  }
}
