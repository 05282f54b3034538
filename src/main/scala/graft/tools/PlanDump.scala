package graft.tools

/** Dev tool: print executed plans for named queries (same session
  * config as Bench/Verify so the plans match what they run). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.01"
    for (name <- args) {
      println(s"===== $name =====")
      val df = graft.SparkEntry.queries(name)(spark, sf)
      println(df.queryExecution.executedPlan.toString.take(3500))
    }
    spark.stop()
  }
}
