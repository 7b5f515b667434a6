package graft

import org.apache.spark.sql.functions._

/** Isolate scheduling vs IO vs shuffle overhead. Temporary diagnostic. */
object MicroProbe {
  def main(args: Array[String]): Unit = {
    val spark = Session.get("graft-micro")
    import spark.implicits._
    def time(label: String)(f: => Any): Unit = {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        f
        println(f"[$label] iter $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    time("range-sum")(spark.range(100000000L).agg(sum("id")).collect())
    time("empty-job")(spark.range(16).repartition(16).count())
    val li = "/root/testdata/sf0.1/lineitem.parquet"
    time("scan-count")(spark.read.parquet(li).count())
    time("scan-agg")(spark.read.parquet(li).agg(sum("l_quantity")).collect())
    time("scan-groupby")(spark.read.parquet(li)
      .groupBy("l_returnflag").agg(sum("l_quantity")).collect())
    spark.stop()
  }
}
