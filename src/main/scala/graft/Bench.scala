package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times every registered query at
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Timing methodology — steady-state, best of two:
  *  - every query first runs once at sf0.001 (JVM classloading + first
  *    codegen of each expression family, a 5-20 s one-time cost);
  *  - then each query runs TWICE at the target SF and the faster run is
  *    reported. The first target-SF run still pays plan-shape-specific
  *    codegen (AQE picks different joins at sf0.1 than sf0.001, so the
  *    sf0.001 warmup does not warm those plans) plus any JIT recompile;
  *    the second run is the steady-state number a long-lived cluster
  *    session would see. Round-1 showed 2-5x per-query run-to-run noise
  *    on this VM when timing cold single runs. */
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
    // SPARK_GRAFT_ONLY=q23,q24 restricts to a subset — local iteration
    // aid; the driver leaves it unset and runs all. An element matches a
    // query by its full name or its id (the part before the first '_'),
    // never by bare prefix: "q2" selects nothing, "q22" selects exactly
    // q22_lsh_neardup.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) =>
        only.forall(_.exists(e => e == n || e == n.takeWhile(_ != '_')))
      }
    queries.foreach { case (_, fn) =>
      try fn(spark, warmDir).count() catch { case _: Throwable => () }
      spark.catalog.clearCache() // drop per-query persists between runs
    }
    def timedRun(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
        catch { case _: Throwable => false }
      // failed queries report -1.0, not their time-to-crash
      val dt = if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      spark.catalog.clearCache()
      dt
    }
    val results = queries.map { case (name, fn) =>
      val first = timedRun(fn)
      // a failed SECOND run must not discard a valid first measurement
      val dt = if (first < 0) first else {
        val second = timedRun(fn)
        if (second < 0) first else math.min(first, second)
      }
      name -> dt
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
