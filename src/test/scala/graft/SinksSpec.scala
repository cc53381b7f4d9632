package graft

import graft.engine.{Sinks, Tables}
import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.Event
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Write sinks (partitioned parquet layout + pruning) and the
  * stream-static enrichment join. */
class SinksSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  test("partitioned parquet write prunes on the partition column") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val orders = Tables(spark, "/root/testdata/sf0.001", "orders")
    Sinks.writeParquet(orders, dir, partitionBy = Seq("o_orderpriority"))
    // layout: one subdir per priority value
    val subdirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("o_orderpriority=")).toSet
    assert(subdirs.size == 5)
    // reading back with a partition filter must show partition pruning
    val back = spark.read.parquet(dir).filter(col("o_orderpriority") === "1-URGENT")
    val scan = back.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(o_orderpriority"), scan)
    assert(back.count() ==
      orders.filter(col("o_orderpriority") === "1-URGENT").count())
  }

  test("csv sink round-trips through loadCsv-style read") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    val part = Tables(spark, "/root/testdata/sf0.001", "part")
      .select("p_partkey", "p_name", "p_retailprice")
    Sinks.writeCsv(part, dir)
    val back = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(dir)
    assert(back.count() == part.count())
    assert(back.schema.fieldNames.toSet == part.schema.fieldNames.toSet)
  }

  test("stream-static join enriches live events with a batch dimension") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val static = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val src = MemoryStream[Event]
    val q = StreamingOps.enrichWithStatic(src.toDF(), static, "user_id")
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    src.addData(
      Event(1, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1, "c", 1.0),
      Event(2, java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), 3, "c", 2.0))
    q.processAllAvailable()
    val rows = spark.table("enriched").select("event_id", "tier")
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    q.stop()
    assert(rows(1L).contains("gold"))
    assert(rows(2L).isEmpty) // left join keeps unmatched stream rows
  }
}
