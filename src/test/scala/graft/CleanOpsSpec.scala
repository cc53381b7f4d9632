package graft

import graft.engine.CleanOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** P1 numeric-cleaning edge cases from the reference's dirty data
  * (`amazon1.py:42-59`, FIXTURES.md §A). */
class CleanOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session

  private def clean(values: Seq[String], allowDecimal: Boolean): Seq[Option[Double]] = {
    import spark.implicits._
    values.toDF("s")
      .select(CleanOps.cleanNumeric(col("s"), allowDecimal).as("v"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq
  }

  test("decimal cleaning: currency, grouping, junk, empties") {
    val got = clean(Seq("₹1,099", "4.2", "Get", "", null, "3..5", ".5", "₹2,499.00"),
      allowDecimal = true)
    assert(got == Seq(Some(1099.0), Some(4.2), None, None, None,
      Some(3.0), Some(0.5), Some(2499.0)))
  }

  test("integer cleaning drops dots") {
    val got = clean(Seq("1,234", "12", "", "many", "4.2"), allowDecimal = false)
    assert(got == Seq(Some(1234.0), Some(12.0), None, None, Some(42.0)))
  }

  test("fillClamp reproduces fillna(0).clip(0,100)") {
    import spark.implicits._
    val got = Seq[Option[Double]](Some(-3.0), Some(50.0), Some(250.0), None)
      .toDF("v")
      .select(CleanOps.fillClamp(col("v"), 0.0, 0.0, 100.0).as("c"))
      .collect().map(_.getDouble(0)).toSeq
    assert(got == Seq(0.0, 50.0, 100.0, 0.0))
  }
}
