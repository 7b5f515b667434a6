package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Shard-locality invariance for the parameterized sharded operators
  * (TextOps.sequencePack, MultimodalOps.modalityInterleave): a shard's
  * output depends ONLY on the rows assigned to it, so nShards can scale
  * with the input — the 100 TB knob — without changing any shard's
  * packing/interleave. Pinned by computing shard k's slice two ways:
  * through the full nShards run, and through an nShards=1 run over just
  * that shard's rows. */
class ShardedOpsSpec extends AnyFunSuite {

  lazy val spark = Session.builder("graft-sharded-test").master("local[4]")
    .config("spark.sql.shuffle.partitions", "4").getOrCreate()

  private def sortedRows(df: DataFrame, cols: String*): Seq[Seq[Any]] =
    df.orderBy(cols.map(col): _*).collect().toSeq.map(_.toSeq)

  test("sequencePack: each shard's packs are invariant to how other shards pack") {
    import spark.implicits._
    // 60 docs with varied token counts; budget small enough to force
    // several packs per shard
    val docs = (0L until 60L).map(i => (i, 5L + (i * 7) % 40)).toDF("doc_id", "n")
    val n = 6
    val full = operators.TextOps.sequencePack(docs, budget = 64L, nShards = n)
    (0 until n).foreach { k =>
      val slice = full.filter(col("shard") === k).select("pack", "n_docs", "n_tokens")
      val solo = operators.TextOps
        .sequencePack(docs.filter(pmod(col("doc_id"), lit(n)) === k),
          budget = 64L, nShards = 1)
        .select("pack", "n_docs", "n_tokens")
      assert(sortedRows(slice, "pack") == sortedRows(solo, "pack"),
        s"shard $k packed differently when isolated")
    }
    // and the operator matches a sequential per-shard simulation of the
    // start-offset packing rule (a pack may overflow by its LAST doc's
    // tail — docs are assigned by where they START)
    val expected = (0L until 60L).map(i => (i, 5L + (i * 7) % 40))
      .groupBy { case (id, _) => id % n }
      .flatMap { case (shard, ds) =>
        var cum = 0L
        ds.sortBy(_._1).map { case (_, tok) =>
          val pack = cum / 64L; cum += tok; (shard, pack, tok)
        }
      }
      .groupBy { case (shard, pack, _) => (shard, pack) }
      .map { case ((shard, pack), xs) =>
        Seq[Any](shard, pack, xs.size.toLong, xs.map(_._3).sum) }
      .toSeq.sortBy(r => (r(0).asInstanceOf[Long], r(1).asInstanceOf[Long]))
    assert(sortedRows(full, "shard", "pack") == expected)
  }

  test("sequencePack: nShards only re-buckets docs, totals are preserved") {
    import spark.implicits._
    val docs = (0L until 45L).map(i => (i, 3L + i % 11)).toDF("doc_id", "n")
    val a = operators.TextOps.sequencePack(docs, budget = 32L, nShards = 3)
    val b = operators.TextOps.sequencePack(docs, budget = 32L, nShards = 9)
    def totals(df: DataFrame) = df.agg(sum("n_docs"), sum("n_tokens"))
      .collect().head.toSeq
    assert(totals(a) == totals(b))
  }

  test("modalityInterleave: each shard's batches are invariant to other shards") {
    import spark.implicits._
    val mods = Seq("text", "image", "audio")
    val df = (0L until 90L)
      .map(i => (i, mods(((i * 13) % 3).toInt))).toDF("doc_id", "modality")
    val n = 5
    val full = operators.MultimodalOps
      .modalityInterleave(df, mods, nShards = n, batchSize = 6)
    (0 until n).foreach { k =>
      val slice = full.filter(col("shard") === k)
        .select("batch", "n_text", "n_image", "n_audio", "n_total")
      val solo = operators.MultimodalOps
        .modalityInterleave(df.filter(pmod(col("doc_id"), lit(n)) === k),
          mods, nShards = 1, batchSize = 6)
        .select("batch", "n_text", "n_image", "n_audio", "n_total")
      assert(sortedRows(slice, "batch") == sortedRows(solo, "batch"),
        s"shard $k interleaved differently when isolated")
    }
  }

  test("modalityInterleave: rows with unlisted modalities are excluded, not corrupted") {
    import spark.implicits._
    val mods = Seq("text", "image", "audio")
    val base = (0L until 30L).map(i => (i, mods((i % 3).toInt)))
    val withVideo = base ++ Seq((100L, "video"), (101L, "video"))
    val clean = operators.MultimodalOps
      .modalityInterleave(base.toDF("doc_id", "modality"), mods, 2, 6)
    val mixed = operators.MultimodalOps
      .modalityInterleave(withVideo.toDF("doc_id", "modality"), mods, 2, 6)
    // the unlisted rows must change NOTHING: without the filter they got
    // m_idx = -1 and collided with text's interleave slots
    assert(sortedRows(mixed, "shard", "batch") == sortedRows(clean, "shard", "batch"))
  }

  test("modalityInterleave: full batches are balanced across modalities") {
    import spark.implicits._
    val mods = Seq("text", "image", "audio")
    // equal thirds → every full batch must be a perfect 1:1:1 interleave
    val df = (0L until 90L).map(i => (i, mods((i % 3).toInt))).toDF("doc_id", "modality")
    val out = operators.MultimodalOps
      .modalityInterleave(df, mods, nShards = 2, batchSize = 6)
    val fullBatches = out.filter(col("n_total") === 6).collect()
    assert(fullBatches.nonEmpty)
    fullBatches.foreach { r =>
      assert(r.getAs[Long]("n_text") == 2 && r.getAs[Long]("n_image") == 2 &&
        r.getAs[Long]("n_audio") == 2,
        s"unbalanced full batch: $r")
    }
  }
}
