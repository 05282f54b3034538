package graft.tools

import java.nio.file.{Files, Paths}

/** Dev tool: write each named query's `.explain("formatted")` output
  * to <outDir>/<name><suffix>.txt (usage: PlanExplain <outDir> <suffix>
  * <sfDir> <name> [name...]) — the before/after plan evidence the
  * optimization rounds commit under plans/. */
object PlanExplain {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val sfDir = args(2)
    val names = args.drop(3).toSeq
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val df = graft.SparkEntry.benchQueries(name)(spark, sfDir)
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(outDir, s"$name$suffix.txt"), formatted)
      println(s"[planexplain] wrote $outDir/$name$suffix.txt")
    }
    spark.stop()
  }
}
