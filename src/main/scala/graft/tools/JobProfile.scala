package graft.tools

import org.apache.spark.scheduler._
import scala.collection.mutable

/** Dev tool: run one named query and print a per-job wall/stage/task
  * breakdown (usage: JobProfile <name> [reps] [sfDir]). Answers "where
  * do a small-data query's seconds actually go" — job count × launch
  * overhead vs genuine stage compute — which explain() cannot show. */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    sys.env.get("SPARK_GRAFT_SET").foreach(_.split(";").filter(_.nonEmpty)
      .foreach { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => spark.conf.set(k, v)
          case _ => sys.error(s"SPARK_GRAFT_SET segment without '=': '$kv'")
        }
      })
    final case class JobRec(id: Int, t0: Long, var t1: Long = -1L,
        var stages: Int = 0, var tasks: Int = 0, var desc: String = "")
    final case class StageRec(id: Int, name: String, tasks: Int, ms: Long)
    val jobs = mutable.LinkedHashMap.empty[Int, JobRec]
    val stages = mutable.ArrayBuffer.empty[StageRec]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val r = JobRec(e.jobId, e.time)
        r.stages = e.stageInfos.size
        r.tasks = e.stageInfos.map(_.numTasks).sum
        r.desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        jobs.synchronized { jobs(e.jobId) = r }
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized { jobs.get(e.jobId).foreach(_.t1 = e.time) }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        val ms = (for {a <- i.completionTime; b <- i.submissionTime}
          yield a - b).getOrElse(-1L)
        stages.synchronized {
          stages += StageRec(i.stageId, i.name.takeWhile(_ != '@') + " @ " +
            i.details.linesIterator.filter(_.contains("graft."))
              .take(2).mkString(" <- "),
            i.numTasks, ms)
        }
      }
    }
    val fn = graft.SparkEntry.benchQueries(name)
    for (i <- 1 to reps) {
      jobs.synchronized { jobs.clear() }
      stages.synchronized { stages.clear() }
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      val js = jobs.synchronized { jobs.values.toSeq }
      val jobWall = js.filter(_.t1 > 0).map(j => (j.t1 - j.t0) / 1e3).sum
      println(f"[jobprofile] $name iter $i: wall $wall%.2f s rows=$n " +
        f"jobs=${js.size} stages=${js.map(_.stages).sum} tasks=${js.map(_.tasks).sum} " +
        f"sum-job-wall ${jobWall}%.2f s (gaps = driver/planning ${wall - jobWall}%.2f s)")
      if (i == reps) {
        js.foreach { j =>
          println(f"  job ${j.id}%3d ${if (j.t1 > 0) (j.t1 - j.t0) / 1e3 else -1.0}%6.2f s " +
            f"stages=${j.stages}%2d tasks=${j.tasks}%4d ${j.desc.take(80)}")
        }
        val ss = stages.synchronized { stages.toSeq }
        println("  --- slowest stages ---")
        ss.sortBy(-_.ms).take(20).foreach { s =>
          println(f"  stage ${s.id}%4d ${s.ms / 1e3}%6.2f s tasks=${s.tasks}%4d ${s.name.take(140)}")
        }
      }
    }
    spark.stop()
  }
}
