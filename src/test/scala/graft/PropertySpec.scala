package graft

import graft.engine.{CleanOps, Stemmer}
import org.apache.spark.sql.functions.col
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property tests (SURVEY.md §5.3) via sampled scalacheck generators
  * (the scalatest-scalacheck bridge isn't in the offline cache):
  * cleaning never throws and is idempotent; stemming is total. */
class PropertySpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  private val dirtyGen: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr,
    Gen.listOf(Gen.oneOf("₹", ",", ".", "9", "1", "x", " ", "Get"))
      .map(_.mkString),
    Gen.const(""), Gen.const("..."), Gen.const("1.2.3.4"))

  test("cleanNumeric never throws and yields null or a finite double") {
    import spark.implicits._
    val samples = Gen.listOfN(200, dirtyGen).sample.get
    val out = samples.toDF("s")
      .select(CleanOps.cleanNumeric(col("s"), allowDecimal = true).as("v"))
      .collect()
    out.foreach { r =>
      if (!r.isNullAt(0)) assert(!r.getDouble(0).isNaN && !r.getDouble(0).isInfinite)
    }
  }

  test("cleanNumeric is idempotent on its own output") {
    import spark.implicits._
    val samples = Gen.listOfN(100, dirtyGen).sample.get
    // plain decimal rendering — scientific notation ('E17') would be
    // re-cleaned as digits, which is out of the operator's contract
    val once = samples.toDF("s")
      .select(CleanOps.cleanNumeric(col("s"), allowDecimal = true).as("v"))
      .collect().map(r => if (r.isNullAt(0)) null
        else new java.math.BigDecimal(r.getDouble(0)).toPlainString)
    val twice = once.toSeq.toDF("s")
      .select(CleanOps.cleanNumeric(col("s"), allowDecimal = true).as("v"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getDouble(0))
    once.zip(twice).foreach {
      case (null, b) => assert(b == null)
      case (a, b) => assert(a.toDouble == b)
    }
  }

  test("stemmer is total on lowercase words and output is shorter or equal") {
    val words = Gen.listOfN(500,
      Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)).sample.get
    words.foreach { w =>
      val s = Stemmer.stem(w)
      assert(s != null && s.nonEmpty, s"stem($w)")
      assert(s.length <= w.length + 1, s"stem($w) = $s") // step1b can append 'e'
    }
  }
}
