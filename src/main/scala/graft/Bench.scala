package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times every registered query at
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line. Each query is warmed
  * up once at sf0.001 first so timings measure steady-state execution,
  * not first-plan JVM/codegen compilation (~5-20 s one-time cost —
  * see .claude/skills/verify/SKILL.md gotchas). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
    queries.foreach { case (_, fn) =>
      try fn(spark, warmDir).count() catch { case _: Throwable => () }
      spark.catalog.clearCache() // drop per-query persists between runs
    }
    val results = queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
        catch { case _: Throwable => false }
      // failed queries report -1.0, not their time-to-crash
      val dt = if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      spark.catalog.clearCache()
      name -> dt
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
