package graft
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val s = SparkSpec.session
    def p(n: String) = SparkEntry.queries(n)(s, "/root/testdata/sf0.001")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    args.foreach { n =>
      println(s"===== $n =====")
      println(p(n).split("\n").takeWhile(!_.startsWith("(1) ")).mkString("\n"))
    }
    s.stop()
  }
}
