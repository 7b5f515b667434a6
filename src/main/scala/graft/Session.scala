package graft

import org.apache.spark.sql.SparkSession

/** Single place to build the engine's SparkSession with scale-appropriate
  * defaults. Local mode is a stand-in for a 1000-executor cluster: shuffle
  * partitions track cores (not the 200 default), AQE is on so skew/coalesce
  * re-planning behaves the same way it would at 100 TB.
  */
object Session {
  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  def builder(appName: String): SparkSession.Builder =
    SparkSession.builder()
      .withExtensions(new GraftExtensions) // native functions for SQL
      .appName(appName)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // Decouple the BIG-shuffle width from the core count: AQE plans
      // every exchange at `initialPartitionNum` and then coalesces by
      // observed bytes, so a 10-row group-by still collapses to a few
      // tasks while a 500M-row candidate-verify shuffle keeps 8×cores
      // of width instead of being capped at `shuffle.partitions`. This
      // was the round-7 sf1.0 finding: with both pinned to cores, the
      // heavy dedup/graph shuffles ran 32-wide at 10× data and went
      // superlinear from per-task spill (d09 23×, g01 18× at 10× data).
      // On a real cluster set this ~2-3× total executor cores.
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_INITIAL_PARTITIONS",
          (cpus.toInt * 8).toString))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      // Historic testdata wrote events.ts as TIMESTAMP(NANOS), which Spark's
      // parquet reader rejects by default; with this conf a NANOS column reads
      // as an epoch-nano long, which Tables.canonicalTs then converts. Current
      // testdata is TIMESTAMP(MICROS); keeping the conf keeps legacy files
      // readable (TsEncodingSpec pins all encodings).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // the sandboxed filesystem stalls whole-JVM for >10s at times, which
      // would kill the default 10s executor heartbeat in local mode
      .config("spark.executor.heartbeatInterval", "60s")
      .config("spark.network.timeout", "600s")
      // the dedup verify broadcasts the per-doc array frame when it fits
      // (DedupOps.exactVerify): at sf10 that is ~600 MB serialized, over
      // the 1g default that caps driver-side broadcast collection
      .config("spark.driver.maxResultSize", "4g")
      // Iterative operators (CC/LPA/k-core/PageRank) re-materialize their
      // frame each round; the previous round's checkpoint blocks and
      // shuffle files become garbage the moment the var is reassigned,
      // but the ContextCleaner only notices after a DRIVER GC — which a
      // large-heap driver may not run for the whole job. The default
      // periodic-GC interval (30min) let a 3-round peel over 800M edges
      // accumulate >200 GB of dead shuffle files on one box; 2min caps
      // disk at roughly one round's working set at negligible GC cost.
      .config("spark.cleaner.periodicGC.interval",
        sys.env.getOrElse("SPARK_GRAFT_PERIODIC_GC", "2min"))

  def get(appName: String = "graft"): SparkSession = {
    val spark = builder(appName).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
