package graft.tools


/** Dev tool: run one named query N times in one session and print
  * per-iteration seconds (usage: BenchOne <name> [reps] [sfDir]). */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 5
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val spark = graft.GraftSession.local() // same config as Bench/Verify
    spark.sparkContext.setLogLevel("WARN")
    // dev escape hatch: SPARK_GRAFT_SET="k=v;k2=v2" applies runtime SQL
    // confs for A/B experiments (static confs can't be overridden here)
    sys.env.get("SPARK_GRAFT_SET").foreach(_.split(";").filter(_.nonEmpty)
      .foreach { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => spark.conf.set(k, v)
          case _ => sys.error(s"SPARK_GRAFT_SET segment without '=': '$kv'")
        }
      })
    val fn = graft.SparkEntry.queries(name)
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[benchone] $name iter $i: ${(System.nanoTime() - t0) / 1e9}%.2f s (rows=$n)")
    }
    spark.stop()
  }
}
