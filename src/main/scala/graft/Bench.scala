package graft
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: absorbs one-time session costs (BlockManager,
    // Janino/codegen framework, parquet reader init, JIT of shared
    // infra) so per-query numbers reflect steady state.
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    val failed = scala.collection.mutable.ListBuffer.empty[String]
    def timed(name: String, fn: (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"BENCH FAILURE $name: ${e.getClass.getName}: ${e.getMessage}")
          // a failure in EITHER pass lands in `failed` (deduped) — a
          // query that runs cold but dies warm must not read as green
          if (!failed.contains(name)) failed += name
          false
        }
      // A failed query records -1, never a fake wall time.
      val sec = if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      // progress to stderr (stdout stays the one-line JSON channel)
      System.err.println(f"[bench] $name%-24s $sec%8.2f s")
      sec
    }
    // Two timed passes per query, reported separately: the cold pass
    // carries that query's one-time plan/Janino/JIT compile cost (noisy
    // — WHICH shared generated classes are already hot depends on map
    // order), the warm pass is steady-state execution. `queries`/`total`
    // stay the cold pass for round-over-round driver comparability; the
    // warm numbers are the signal for plan-quality regressions.
    val cold = SparkEntry.queries.map { case (name, fn) =>
      name -> timed(name, fn) }
    val warm = SparkEntry.queries.map { case (name, fn) =>
      name -> timed(name, fn) }
    def obj(m: Map[String, Double]) =
      m.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = cold.values.filter(_ >= 0).sum
    val totalWarm = warm.values.filter(_ >= 0).sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":${obj(cold)},"queries_warm":${obj(warm)},"total_warm":$totalWarm,"failed":$failedJson,"sf":"$sfDir"}"""
    // stdout carries sbt [info] prefixes and any log noise; the file is
    // the unambiguous machine-readable channel for the driver.
    Files.write(Paths.get("BENCH.json"), (json + "\n").getBytes(StandardCharsets.UTF_8))
    println(json)
    spark.stop()
  }
}
