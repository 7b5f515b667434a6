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

  def main(args: Array[String]): Unit = {
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

    def timedRun(): ((Long, Long), Double) = {
      val t0 = System.nanoTime()
      val fp = fingerprint(KernelCanary.build(spark))
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
    val killer = new Thread(() => {
      val tracker = spark.sparkContext.statusTracker
      while (tracker.getActiveJobIds().isEmpty && !queryDone)
        Thread.sleep(100)
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
        s""""killed_pid":"$killedPid","executor_removed":$sawRemoval,""" +
        s""""rows_base":${fpBase._1},"rows_fault":${fpFault._1},""" +
        s""""hash_base":${fpBase._2},"hash_fault":${fpFault._2},""" +
        f""""wall_base_s":$wallBase%.1f,"wall_fault_s":$wallFault%.1f,""" +
        s""""identical":${fpBase == fpFault},"pass":$ok}""")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
