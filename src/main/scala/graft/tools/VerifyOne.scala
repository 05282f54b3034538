package graft.tools

import java.nio.file.{Files, Paths}

/** Dev tool: Verify for a SUBSET of queries (usage:
  * VerifyOne <outDir> <sfDir> <name> [name...]) — writes each named
  * query's parquet plus the filtered oracle_sql.json/queries.json, so
  * `python3 tools/check_oracle.py <sfDir> <outDir>` gates just those. */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val sfDir = args(1)
    val names = args.drop(2).toSeq
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      graft.SparkEntry.queries(name)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val oracle = graft.SparkEntry.oracleSql.filter(kv => names.contains(kv._1))
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"),
      oracle.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))
    Files.writeString(Paths.get(s"$outDir/queries.json"),
      names.sorted.map(q).mkString("[", ",", "]"))
    spark.stop()
  }
}
