package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time one named query N times (warm JVM) and print the plan.
  * Usage: runMain graft.TimeOne <name> [sfDir] [reps]
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    if (sys.env.contains("GRAFT_EXPLAIN"))
      fn(spark, sfDir).explain("formatted")
    // GRAFT_NOOP=1 measures like Bench does (noop write materializes all
    // rows+columns incl. final sort); default count() lets Catalyst
    // delete sorts — useful for isolating where time goes
    val noop = sys.env.contains("GRAFT_NOOP")
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      val n = if (noop) {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save(); -1L
      } else fn(spark, sfDir).count()
      println(f"[time] $name rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
