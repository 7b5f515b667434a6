package graft.tools

import graft.Session
import org.apache.spark.scheduler.{SparkListener, SparkListenerExecutorRemoved}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.util.concurrent.atomic.AtomicInteger
import scala.sys.process._

/** Fault-injection receipt (r11 verdict ask #6, mirroring the
  * reference's worker-failure test): run a kernel-shaped query on a
  * REAL multi-JVM `local-cluster[2,4,4g]`, SIGKILL one executor JVM
  * mid-query, and assert the query completes with an output
  * fingerprint identical to the undisturbed run — the "Spark task
  * retry + stage resubmission subsume the reference's worker-failure
  * handling" divergence note in SURVEY §2.11, turned into a measured
  * receipt.
  *
  * The query is the pinned KernelCanary cell (deterministic output —
  * 375k pairs — shuffle-heavy, multi-stage), run under
  * `graft.materialize=reliable`: on a real cluster the eager
  * localCheckpoint mode stores its blocks ON executors, where they die
  * with the process and are non-recomputable by design (lineage is
  * truncated) — reliable mode's parquet round-trip on shared storage
  * is the documented multi-node setting (`Materialize` scaladoc), and
  * this tool is exactly the scenario that makes it so. Shuffle files
  * lost with the executor exercise the other recovery path:
  * FetchFailed → stage resubmission → deterministic recompute.
  *
  * Usage (the standalone Worker's launcher needs both envs to build
  * the executor command):
  *   SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
  *     tools/run.sh graft.tools.FaultInject
  * Prints one JSON line; exits nonzero on any mismatch.
  */
object FaultInject {

  /** A cell that crosses the GroupB salting threshold — the r12 verdict
    * note that the canary cell sits BELOW every salting threshold by
    * construction (deliberately, as a determinism pin), so no kill had
    * ever landed mid-flight in the group-salted enumeration / verify
    * stages that carry the production dedup path. A 1500-doc identical
    * clique forces every clique token's prefix posting list to
    * 1500 > 1024 = GroupB (g = 2): the hot-frame broadcast, the salted
    * (r, gx, gy) exchanges and the C(1500,2) ≈ 1.12M-pair enumeration
    * + exact verify all execute; 60k background family docs keep the
    * cold path busy alongside. Output is deterministic (same XOR
    * fingerprint contract as the canary cell). */
  def saltedCell(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    val cliqueText = (1 to 50).map(i => s"c$i").mkString(" ")
    val docs = spark.range(60000L).select(
      col("id").as("doc_id"),
      when(col("id") < 1500L, lit(cliqueText)).otherwise(expr(
        s"""array_join(concat(
           |  transform(sequence(0, 49),
           |    j -> concat('w', pmod(xxhash64(id div 4 * 2654435761L
           |                                   + j * 1315423911L), 50000))),
           |  transform(sequence(0, 2),
           |    j -> concat('w', pmod(xxhash64(id * 97L + j * 7919L
           |                                   + 1234567L), 50000)))
           |), ' ')""".stripMargin)).as("text"))
    graft.operators.DedupOps.prefixFilterPairsOn(
      graft.operators.DedupOps.hashedWordSetsOf(docs), 0.8)
  }

  def main(args: Array[String]): Unit = {
    // `salted`: run the kill through the group-salted kernel path
    // instead of the (below-threshold) canary cell
    val salted = args.headOption.contains("salted")
    val addOpens = Seq("java.lang", "java.lang.invoke", "java.lang.reflect",
      "java.io", "java.net", "java.nio", "java.util",
      "java.util.concurrent", "java.util.concurrent.atomic",
      "sun.nio.ch", "sun.nio.cs", "sun.security.action",
      "sun.util.calendar")
      .map(p => s"--add-opens java.base/$p=ALL-UNNAMED").mkString(" ")
    val cp = Seq(
      s"${System.getProperty("user.dir")}/target/scala-2.13/classes",
      s"${System.getProperty("user.dir")}/src/main/resources",
      "/opt/spark/jars/*").mkString(":")
    val spark = Session.builder("graft-faultinject")
      .master("local-cluster[2,4,4096]")
      .config("spark.executor.memory", "4g")
      .config("spark.executor.extraClassPath", cp)
      .config("spark.executor.extraJavaOptions", addOpens)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // multi-node discipline: executor-resident checkpoint blocks die
    // with the executor; route materialize through shared storage
    spark.conf.set("graft.materialize", "reliable")
    // pin the salt width: the salted cell's 1500-doc clique crosses the
    // threshold only because 1500 > 1024, and a leftover
    // SPARK_GRAFT_GROUPB from a sensitivity sweep (e.g. 2048) would
    // silently run the UNSALTED path while the JSON still says
    // cell:"salted" — a fault receipt for a path that never executed
    spark.conf.set("graft.dedup.groupB", "1024")

    val removed = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onExecutorRemoved(e: SparkListenerExecutorRemoved): Unit =
        removed.incrementAndGet()
    })

    // order-independent fingerprint of the deterministic cell (XOR, not
    // sum: summing 375k pseudo-random longs overflows under ANSI mode)
    def fingerprint(df: DataFrame): (Long, Long) = {
      val r = df.agg(
        count(lit(1)).as("n"),
        expr("bit_xor(xxhash64(doc_a, doc_b, cast(jac * 1e9 as long)))")
          .as("h")).head()
      (r.getLong(0), r.getLong(1))
    }

    def cell(): DataFrame =
      if (salted) saltedCell(spark) else KernelCanary.build(spark)

    def timedRun(): ((Long, Long), Double) = {
      val t0 = System.nanoTime()
      val fp = fingerprint(cell())
      (fp, (System.nanoTime() - t0) / 1e9)
    }

    // wait for executors to register, then baseline (undisturbed)
    while (spark.sparkContext.getExecutorMemoryStatus.size < 3)
      Thread.sleep(200) // driver + 2 executors
    val (fpBase, wallBase) = timedRun()

    // fault run: SIGKILL one executor JVM once the query is mid-flight
    val removedBefore = removed.get()
    @volatile var killedPid = ""
    // an executor JVM's comm is "java"; a bare `pgrep -f` would also
    // match this tool's own bash wrapper, whose cmdline contains the
    // pattern (first flaky run: killed pid 354, a non-executor). Filter
    // by THIS application's id too — local-cluster executors carry
    // `--app-id <appId>` on their cmdline — so a second Spark app on
    // the box can never lose one of its executors to this tool.
    val appId = spark.sparkContext.applicationId
    def executorPid(): String =
      try Seq("bash", "-c",
        "for p in $(pgrep -f CoarseGrainedExecutorBackend); do " +
          "[ \"$(cat /proc/$p/comm 2>/dev/null)\" = java ] " +
          s"&& tr '\\0' ' ' < /proc/$$p/cmdline 2>/dev/null " +
          s"| grep -q -- '$appId' " +
          "&& echo $p && break; done").!!.trim
      catch { case _: Throwable => "" }
    @volatile var queryDone = false
    @volatile var killAtS = -1.0
    @volatile var killStages = ""
    val killer = new Thread(() => {
      val tracker = spark.sparkContext.statusTracker
      while (tracker.getActiveJobIds().isEmpty && !queryDone)
        Thread.sleep(100)
      val tQ = System.nanoTime() // ≈ fault-run first job start
      // let some tasks finish so shuffle output exists and is then lost
      Thread.sleep(math.max(1000L, (wallBase * 0.3 * 1000).toLong))
      // kill, then verify the scheduler actually saw the removal —
      // retry on a fresh pid if not. Gate on the DONE flag, not on
      // getActiveJobIds(): the cell runs several jobs back-to-back and
      // the active list is momentarily empty between them (a prior run
      // exited here without ever killing).
      var attempts = 0
      while (removed.get() == removedBefore && attempts < 3 && !queryDone) {
        val p = executorPid()
        if (p.nonEmpty) {
          killedPid = p
          // timestamp + active stages at the kill, so the receipt can
          // show WHERE in the query the executor died (the salted cell's
          // window is dominated by the enumeration/verify stages)
          killAtS = (System.nanoTime() - tQ) / 1e9
          killStages = tracker.getActiveStageIds().sorted.mkString("+")
          Seq("kill", "-9", p).!
          val deadline = System.nanoTime() + 8L * 1000000000L
          while (removed.get() == removedBefore && !queryDone &&
              System.nanoTime() < deadline) Thread.sleep(200)
        } else Thread.sleep(500)
        attempts += 1
      }
    }, "executor-killer")
    killer.start()
    val (fpFault, wallFault) = timedRun()
    queryDone = true
    killer.join()

    val sawRemoval = removed.get() > removedBefore
    val ok = killedPid.nonEmpty && sawRemoval && fpBase == fpFault
    println(
      s"""{"metric":"faultinject","cluster":"local-cluster[2,4,4g]",""" +
        s""""cell":"${if (salted) "salted" else "canary"}",""" +
        f""""kill_at_s":$killAtS%.1f,"stages_at_kill":"$killStages",""" +
        s""""killed_pid":"$killedPid","executor_removed":$sawRemoval,""" +
        s""""rows_base":${fpBase._1},"rows_fault":${fpFault._1},""" +
        s""""hash_base":${fpBase._2},"hash_fault":${fpFault._2},""" +
        f""""wall_base_s":$wallBase%.1f,"wall_fault_s":$wallFault%.1f,""" +
        s""""identical":${fpBase == fpFault},"pass":$ok}""")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
