package graft.tools

object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(args(0))(spark, args(1))
    df.count() // let AQE finalize
    val p = df.queryExecution.executedPlan.toString
    println("=== REUSED: " + "ReusedExchange".r.findAllIn(p).size +
      " exchanges: " + "Exchange".r.findAllIn(p).size +
      " scans: " + "Scan parquet".r.findAllIn(p).size)
    spark.stop()
  }
}
