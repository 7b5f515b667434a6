package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins Tables.adapt beyond events.ts (TsEncodingSpec): the round-7
  * regeneration moved THREE timestamp columns at once, so every table's
  * observed schema now canonicalizes at the loader. Safe coercions
  * (integral widening, float→double, array element width, epoch-long /
  * NTZ / DATE → timestamp) must be value-preserving; cross-family drift
  * (a string column arriving numeric) must fail loudly, never coerce.
  */
class SchemaDriftSpec extends AnyFunSuite {
  private lazy val spark = Session.get("schema-drift-spec")

  private def dir(): String = Files.createTempDirectory("drift").toString

  private def write(d: String, table: String, schema: StructType, rows: Seq[Row]): Unit =
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .write.mode("overwrite").parquet(s"$d/$table.parquet")

  test("integral keys widen to long, float money widens to double, values intact") {
    val d = dir()
    write(d, "customer", StructType(Seq(
      StructField("c_custkey", IntegerType), StructField("c_name", StringType),
      StructField("c_nationkey", ShortType), StructField("c_acctbal", FloatType),
      StructField("c_mktsegment", StringType))),
      Seq(Row(7, "Customer#7", 3.toShort, 123.25f, "BUILDING")))
    val out = Tables.df(spark, d, "customer")
    assert(out.schema("c_custkey").dataType === LongType)
    assert(out.schema("c_nationkey").dataType === LongType)
    assert(out.schema("c_acctbal").dataType === DoubleType)
    val r = out.collect()(0)
    assert(r.getLong(0) === 7L && r.getLong(2) === 3L && r.getDouble(3) === 123.25)
  }

  test("o_orderdate arriving as epoch-nano long canonicalizes to the same wall clock") {
    val d = dir()
    val us = 1709296496789012L // 2024-03-01 12:34:56.789012 UTC
    write(d, "orders", StructType(Seq(
      StructField("o_orderkey", LongType), StructField("o_orderdate", LongType))),
      Seq(Row(1L, us * 1000L)))
    val out = Tables.df(spark, d, "orders")
    assert(out.schema("o_orderdate").dataType === TimestampType)
    import org.apache.spark.sql.functions._
    assert(out.select(date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss.SSSSSS"))
      .collect()(0).getString(0) === "2024-03-01 12:34:56.789012")
  }

  test("embedding arriving as array<double> narrows losslessly back to array<float>") {
    val d = dir()
    write(d, "embeddings", StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(DoubleType)),
      StructField("label", LongType))),
      // doubles that came FROM floats — the real drift shape — cast back exactly
      Seq(Row(1L, Seq(0.5d, 0.25f.toDouble, 1.5d), 4L)))
    val out = Tables.df(spark, d, "embeddings")
    assert(out.schema("embedding").dataType === ArrayType(FloatType))
    assert(out.schema("label").dataType === IntegerType)
    val r = out.collect()(0)
    assert(r.getSeq[Float](1) === Seq(0.5f, 0.25f, 1.5f) && r.getInt(2) === 4)
  }

  test("documents.n_chars arriving int32 widens; extra producer columns pass through") {
    val d = dir()
    write(d, "documents", StructType(Seq(
      StructField("doc_id", IntegerType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", IntegerType),
      StructField("crawl_batch", StringType))), // additive evolution
      Seq(Row(1, "hello world", "en", "src0", 11, "b7")))
    val out = Tables.df(spark, d, "documents")
    assert(out.schema("doc_id").dataType === LongType)
    assert(out.schema("n_chars").dataType === LongType)
    assert(out.columns.contains("crawl_batch"), "extra columns must survive")
    assert(out.collect()(0).getLong(4) === 11L)
  }

  test("cross-family drift (string column arriving numeric) fails loudly") {
    val d = dir()
    write(d, "documents", StructType(Seq(
      StructField("doc_id", LongType), StructField("lang", IntegerType))),
      Seq(Row(1L, 42)))
    val err = intercept[RuntimeException](Tables.df(spark, d, "documents"))
    assert(err.getMessage.contains("documents.lang"))
    assert(err.getMessage.contains("refusing to coerce"))
  }
}
