package graft

import graft.pipeline.{HtmlSink, ProductPipeline => P}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end reference replica (SURVEY.md §5.4): the dirty products
  * fixture through E1 clean → E2 index build → E3 recommend, with
  * golden assertions on the reference's dirty cases and the two
  * example-query shapes (`amazon1.py:205-210, 269-274`). */
class PipelineSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  private lazy val fixture =
    getClass.getResource("/products_dirty.csv").getPath

  private lazy val raw = P.loadCsv(spark, fixture)
  private lazy val cleaned = P.clean(raw)
  private lazy val (base, neighbors) = P.buildIndex(cleaned)

  test("E1: cleaning handles the reference's dirty cases") {
    val byName = cleaned.filter(col("name").isNotNull)
      .select("name", "ratings_cleaned", "no_of_ratings_cleaned",
        "actual_price_cleaned", "discount_pct")
      .collect().map(r => r.getString(0) -> r).toMap
    val dell = byName("Dell Wireless Mouse WM126")
    assert(dell.getDouble(1) == 4.2)
    assert(dell.getDouble(2) == 1234.0)
    assert(dell.getDouble(3) == 1099.0)
    // "Get" -> null
    assert(byName("OnePlus Nord CE 2 Lite 5G (Blue Tide, 6GB RAM)").isNullAt(1))
    // "" -> null
    assert(byName("Samsung Galaxy M13").isNullAt(1))
    // "3..5" -> leading valid prefix 3.0 (documented deviation)
    assert(byName("Sony WH-1000XM4 Headphones").getDouble(1) == 3.0)
    // zero actual price: guarded division -> fillna(0)
    assert(byName("Zero Price Gadget").getDouble(4) == 0.0)
  }

  test("E1: price decimal flags match the reference (amazon1.py:50-58)") {
    // columns_to_clean passes allow_decimal=False for both prices:
    // the dot is stripped like any non-digit, so "₹1,099.50" -> 109950.0.
    // Only `ratings` keeps its decimal point.
    val probe = cleaned.filter(col("name") === "Decimal Price Probe Cable")
      .select("ratings_cleaned", "discount_price_cleaned",
        "actual_price_cleaned")
      .collect().head
    assert(probe.getDouble(0) == 4.0)
    assert(probe.getDouble(1) == 54975.0)
    assert(probe.getDouble(2) == 109950.0)
  }

  test("E2: dedup keeps the first duplicate row") {
    assert(raw.count() == 21)
    assert(base.filter(col("name") === "Dell Wireless Mouse WM126").count() == 1)
    val kept = base.filter(col("name") === "Dell Wireless Mouse WM126")
      .select("row_id").collect().head.getLong(0)
    assert(kept == 0L) // first occurrence
    // null-name row dropped (F1)
    assert(base.filter(col("name").isNull).count() == 0)
  }

  test("E2: URL shortening (P7/P8)") {
    val row = base.filter(col("name") === "Dell Wireless Mouse WM126")
      .select("image_id", "link_id").collect().head
    assert(row.getString(0) == "IMGDELL1")
    assert(row.getString(1) == "dell-wireless-mouse-wm126/dp/B01")
    // non-matching URLs pass through un-shortened
    val ext = base.filter(col("name") === "External Site Widget")
      .select("image_id", "link_id").collect().head
    assert(ext.getString(1) == "http://example.com/widget")
  }

  test("E2: identical search_terms rank each other at cos 1.0, no self") {
    // the three Acme rows normalize+stem to identical token multisets
    val acmeIds = base.filter(lower(col("name")).startsWith("acme"))
      .select("row_id").collect().map(_.getLong(0)).toSet
    assert(acmeIds.size == 3)
    val among = neighbors
      .filter(col("i").isin(acmeIds.toSeq: _*) && col("rn") <= 2)
      .collect()
    for (r <- among) {
      assert(r.getLong(0) != r.getLong(1), "self excluded")
      assert(acmeIds.contains(r.getLong(1)))
      assert(r.getDouble(3) == 1.0)
    }
  }

  test("E3: exact-name query returns similar mice (reference example shape)") {
    val rec = P.recommend(base, neighbors, "Dell Wireless Mouse WM126", k = 5)
    val names = rec.select("name").collect().map(_.getString(0)).toSeq
    assert(names.nonEmpty && names.size <= 5)
    assert(!names.contains("Dell Wireless Mouse WM126"), "self not recommended")
    // mouse products should dominate the top results
    assert(names.count(_.toLowerCase.contains("mouse")) >= 2)
  }

  test("E3: substring-link fallback and no-match") {
    val byLink = P.recommend(base, neighbors, "oneplus-nord-ce-2-lite", k = 3)
    assert(byLink.count() > 0)
    val none = P.recommend(base, neighbors, "no-such-product-xyz", k = 3)
    assert(none.count() == 0)
  }

  test("S3/S4: HTML sinks render bounded results") {
    val html = HtmlSink.tableHtml(P.top10(base), 10)
    assert(html.contains("<table>") && html.contains("no_of_ratings_cleaned"))
    assert(html.contains("boAt Airdopes 141™ Bluetooth TWS Earbuds!"))
    val report = HtmlSink.reportHtml("Similar to Dell Mouse",
      P.recommend(base, neighbors, "Dell Wireless Mouse WM126"))
    assert(report.startsWith("<!DOCTYPE html>") && report.contains("<h1>"))
  }

  test("E2: persisted index round-trips and serves recommendations") {
    val dir = java.nio.file.Files.createTempDirectory("graft_idx").toString
    P.saveIndex(neighbors, dir)
    val loaded = P.loadIndex(spark, dir)
    val direct = P.recommend(base, neighbors, "Dell Wireless Mouse WM126")
      .collect().map(_.toSeq).toSeq
    val viaDisk = P.recommend(base, loaded, "Dell Wireless Mouse WM126")
      .collect().map(_.toSeq).toSeq
    assert(direct == viaDisk)
  }

  test("S2: multi-file load assigns deterministic dense row_ids, no global window") {
    // split the fixture into 3 single-row-group CSV parts; row_ids must
    // stay a dense 0..n-1 permutation in (file, offset) order on both
    // loads, and the plan must not contain the old single-task
    // no-partition window
    val lines = scala.io.Source.fromFile(fixture, "UTF-8").getLines().toVector
    val (header, body) = (lines.head, lines.tail)
    val dir = java.nio.file.Files.createTempDirectory("graft_multicsv")
    body.grouped((body.size + 2) / 3).zipWithIndex.foreach { case (part, i) =>
      java.nio.file.Files.write(dir.resolve(f"part-$i%03d.csv"),
        (header +: part).mkString("\n").getBytes("UTF-8"))
    }
    val a = P.loadCsv(spark, dir.toString)
    val b = P.loadCsv(spark, dir.toString)
    val n = body.count(_.nonEmpty)
    val idsA = a.select("row_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(idsA == (0L until n).toSeq, "dense 0..n-1 ids")
    val keyA = a.select("name", "row_id").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val keyB = b.select("name", "row_id").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(keyA == keyB, "row_id assignment deterministic across loads")
    val plan = a.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "no global window at ingest")
    // r22: row_id derivation is Catalyst-native — the CSV file-source
    // relation must survive (column pruning reaches the scan) instead
    // of being swallowed by an RDD round-trip
    assert(!plan.contains("ExistingRDD") && !plan.contains("Scan rdd"),
      "no RDD scan at ingest")
    assert(plan.contains("Scan csv"), "CSV file-source scan survives")
  }

  test("E1: top-10 sorts by count desc with nulls last") {
    val counts = P.top10(base).select("no_of_ratings_cleaned")
      .collect().map(r => if (r.isNullAt(0)) -1.0 else r.getDouble(0))
    val nonNull = counts.filter(_ >= 0)
    assert(nonNull.toSeq == nonNull.sortBy(-(_: Double)).toSeq)
  }
}
