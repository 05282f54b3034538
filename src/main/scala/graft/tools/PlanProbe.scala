package graft.tools

object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(args(0))(spark, args(1))
    df.count() // let AQE finalize
    val p = df.queryExecution.executedPlan.toString
    // boundary-aware: a bare "Exchange" count would also match every
    // "ReusedExchange" occurrence and double-count reused exchanges
    val reused = "ReusedExchange".r.findAllIn(p).size
    val exchanges = "Exchange".r.findAllIn(p).size - reused
    println("=== REUSED: " + reused +
      " exchanges: " + exchanges +
      " scans: " + "Scan parquet".r.findAllIn(p).size)
    spark.stop()
  }
}
