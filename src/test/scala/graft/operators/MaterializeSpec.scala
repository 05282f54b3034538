package graft.operators

import graft.SparkSpec
import graft.operators.Materialize.MatOps

/** The reliable-materialization seam (r18): localCheckpoint in local
  * mode, reliable checkpoint when the deployment configured a
  * checkpoint dir — values identical either way. */
class MaterializeSpec extends SparkSpec {
  import spark.implicits._

  test("no checkpoint dir -> localCheckpoint path, values intact") {
    assert(spark.sparkContext.getCheckpointDir.isEmpty,
      "precondition: suite session has no checkpoint dir")
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val out = df.seamCheckpoint(false)
    assert(!out.queryExecution.analyzed.toString.contains("Checkpoint"))
    assert(out.as[(Long, String)].collect().sortBy(_._1).toSeq ==
      Seq((1L, "a"), (2L, "b")))
    // lineage is truncated exactly like a direct localCheckpoint
    assert(out.queryExecution.optimizedPlan.collectLeaves().size == 1)
  }

  test("checkpoint dir configured -> reliable checkpoint, values intact") {
    val sc = spark.sparkContext
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt-spec")
    sc.setCheckpointDir(dir.toString)
    try {
      val df = Seq((3L, "c"), (4L, "d")).toDF("id", "v")
      val out = df.seamCheckpoint(true)
      assert(out.as[(Long, String)].collect().sortBy(_._1).toSeq ==
        Seq((3L, "c"), (4L, "d")))
      // the reliable path wrote checkpoint data under the dir
      val wrote = java.nio.file.Files.walk(dir).iterator()
      var files = 0
      while (wrote.hasNext) { wrote.next(); files += 1 }
      assert(files > 1, s"expected checkpoint files under $dir")
    } finally {
      // restore the no-dir state for subsequent suites (private var —
      // the public API has no unset; reflection on the generated
      // accessor keeps this test hermetic)
      val m = sc.getClass.getMethods
        .find(_.getName == "checkpointDir_$eq")
        .getOrElse(sys.error("SparkContext.checkpointDir_$eq not found"))
      m.invoke(sc, None)
      assert(sc.getCheckpointDir.isEmpty, "checkpoint dir must be restored")
    }
  }
}
