package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** CSV malformed-row modes — the ingest-robustness surface a 100 TB
  * pipeline needs (a single bad row must not kill the job, but must
  * be observable): PERMISSIVE + corrupt-record column,
  * DROPMALFORMED, FAILFAST. */
class CsvModesSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  private lazy val dir = {
    val d = java.nio.file.Files.createTempDirectory("graft_badcsv")
    java.nio.file.Files.writeString(d.resolve("data.csv"),
      """id,price,name
        |1,9.99,good row
        |2,notanumber,bad price
        |3,5.50,another good row
        |""".stripMargin)
    d.toString
  }

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("price", DoubleType),
    StructField("name", StringType),
    StructField("_corrupt_record", StringType)))

  test("PERMISSIVE keeps bad rows with nulls + captures the raw record") {
    val df = spark.read.option("header", "true").option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(schema).csv(dir).cache()
    assert(df.count() == 3)
    val bad = df.filter(col("_corrupt_record").isNotNull).collect()
    assert(bad.length == 1)
    assert(bad.head.getAs[String]("_corrupt_record").contains("notanumber"))
    assert(bad.head.isNullAt(schema.fieldIndex("price")))
    df.unpersist()
  }

  // NB: a bare count() over CSV prunes all columns, so the parser
  // never attempts the failing conversion and malformation goes
  // undetected — the assertions below must actually read the typed
  // column to exercise the mode.

  test("DROPMALFORMED silently drops the bad row") {
    val rows = spark.read.option("header", "true").option("mode", "DROPMALFORMED")
      .schema(StructType(schema.fields.dropRight(1))).csv(dir)
      .select("id", "price").collect()
    assert(rows.map(_.getLong(0)).toSet == Set(1L, 3L))
    assert(rows.map(_.getDouble(1)).sum == 9.99 + 5.50)
  }

  test("FAILFAST raises on the bad row") {
    val ex = intercept[Exception] {
      spark.read.option("header", "true").option("mode", "FAILFAST")
        .schema(StructType(schema.fields.dropRight(1))).csv(dir)
        .select("price").collect()
    }
    assert(ex.getMessage.contains("MALFORMED") || ex.getCause != null,
      s"unexpected: ${ex.getMessage.take(200)}")
  }
}
