package graft.serving

import org.apache.spark.sql.SparkSession

/** Standalone launcher for the serving API (README quickstart):
  * `runMain graft.serving.ServeMain <sfDir> [port]` — prints the bound
  * address and blocks until killed.
  */
object ServeMain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val port = if (args.length > 1) args(1).toInt else 8080
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val server = Api.start(spark, sfDir, port)
    println(s"[serve] listening on http://${server.getAddress.getHostString}:" +
      s"${server.getAddress.getPort} over $sfDir")
    Thread.currentThread().join()
  }
}
