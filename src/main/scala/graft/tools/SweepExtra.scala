package graft.tools

import org.apache.spark.sql.SparkSession

/** Times selected SparkEntry queries with the frozen bench's exact protocol
  * (same session config, same `toRdd.count()` action, best-of-N) without
  * running the flagship/dedup phases — the per-query iteration loop of the
  * round-6 optimization work. Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS,
  * SPARK_GRAFT_SWEEP (comma name-prefixes; default all), SPARK_GRAFT_REPS. */
object SweepExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val only = sys.env.get("SPARK_GRAFT_SWEEP").map(_.split(",").toSeq)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sel = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.exists(n.startsWith)) }
    val res = sel.map { case (name, fn) =>
      val secs = (1 to reps).map { _ =>
        spark.sparkContext.setJobDescription(s"sweep: $name")
        val t0 = System.nanoTime()
        try fn(spark, sfDir).queryExecution.toRdd.count()
        catch { case e: Throwable => System.err.println(s"[sweep] $name FAILED: $e") }
        val s = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        s
      }
      println(f"[sweep] $name%-28s min=${secs.min}%8.3f all=${secs.map(x => f"$x%.3f").mkString(",")}")
      name -> secs.min
    }
    println(res.sortBy(-_._2).take(25)
      .map { case (k, v) => f"$k:$v%.2f" }.mkString("[sweep] top: ", "  ", ""))
    spark.stop()
  }
}
