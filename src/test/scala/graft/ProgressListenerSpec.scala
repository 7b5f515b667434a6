package graft

import graft.progress.ProgressListener
import org.scalatest.funsuite.AnyFunSuite

/** The listener must report reference-style {done}/{total} phase progress
  * after a job completes (JobExecution parity, SURVEY §1.4). */
class ProgressListenerSpec extends AnyFunSuite {

  lazy val spark = Session.builder("graft-test").master("local[4]")
    .config("spark.sql.shuffle.partitions", "4").getOrCreate()

  test("listener sees completed stages and jobs") {
    val l = ProgressListener.attach(spark)
    spark.range(1000).selectExpr("id % 7 AS k", "id AS v")
      .groupBy("k").count().collect()
    // listener bus is async; poll until the terminal events drain
    val deadline = System.currentTimeMillis() + 30000
    while (l.jobCounts._2 < 1 && System.currentTimeMillis() < deadline)
      Thread.sleep(100)

    val snap = l.snapshot()
    assert(snap.nonEmpty)
    snap.values.foreach { p =>
      assert(p.completed == p.total, s"incomplete phase: $p")
      assert(p.failed == 0)
    }
    val (active, completed, failed) = l.jobCounts
    assert(active == 0 && completed >= 1 && failed == 0)
  }
}
