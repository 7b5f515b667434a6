package graft

import graft.functions.VectorFunctions.cosine_similarity
import graft.operators.SimilarityOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Build-once / probe-many ANN: s03 computes cell assignments inline per
  * query, which is right for a one-shot; a production vector store
  * PERSISTS the inverted file. Written `partitionBy(cell)`, the index
  * makes each probe a partition-pruned scan — the 2-of-k cell routing
  * becomes "read 2 directories", enforced here at the file-metrics level,
  * and the probe result is pinned identical to the inline s03 answer. */
class IvfIndexSpec extends AnyFunSuite {

  lazy val spark = Session.builder("graft-test").master("local[4]")
    .config("spark.sql.shuffle.partitions", "4").getOrCreate()

  val sf = "/root/testdata/sf0.001"

  test("persisted cell-partitioned index reproduces s03 via pruned scans") {
    val e = SimilarityOps.emb(spark, sf)
    val centroids = SimilarityOps.ivfCentroids(e)
    val idxDir = Files.createTempDirectory("graft-ivf-index").toString + "/index"

    // ---- build once: the inverted file IS a partitioned layout
    e.withColumn("cell", SimilarityOps.nearestCellExpr(centroids, "v"))
      .write.partitionBy("cell").parquet(idxDir)

    // ---- probe many: each query reads only its 2 routed cells
    val index = spark.read.parquet(idxDir)
    val q = index.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("cell"))
      .withColumn("cell2", SimilarityOps.secondCellExpr(centroids, "qv"))
      .collect()
    val got = q.map { row =>
      val qid = row.getLong(0)
      val cells = Seq(row.getInt(row.fieldIndex("cell")),
        row.getInt(row.fieldIndex("cell2")))
      val qv = row.getSeq[Double](1)
      val probe = index.where(col("cell").isin(cells: _*))
        .filter(col("vec_id") =!= qid)
        .withColumn("cosine",
          cosine_similarity(typedLit(qv), col("v")))
        .orderBy(col("cosine").desc, col("vec_id"))
        .limit(5)
      // partition pruning must reach the scan: only the routed cells' files
      val plan = probe.queryExecution.executedPlan
      probe.collect()
      val files = plan.collectLeaves().collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.metrics("numFiles").value
      }.get
      val allFiles = {
        val full = index.groupBy().count(); full.collect()
        spark.read.parquet(idxDir).inputFiles.length.toLong
      }
      assert(files < allFiles, s"query $qid read $files of $allFiles files — not pruned")
      qid -> probe.collect().map(r =>
        (r.getLong(r.fieldIndex("vec_id")),
          math.rint(r.getDouble(r.fieldIndex("cosine")) * 1e4) / 1e4)).toSeq
    }.toMap

    // ---- ground truth: the inline s03 answer
    val want = Queries.byName("s03_ann_ivf").build(spark, sf)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (qid, rows) =>
        qid -> rows.sortBy(_.getInt(1)).map(r =>
          (r.getLong(2), r.getDouble(3))).toSeq
      }
    assert(got.keySet == want.keySet)
    got.foreach { case (qid, neighbors) =>
      assert(neighbors == want(qid), s"query $qid: $neighbors vs ${want(qid)}")
    }
  }
}
