package graft

import org.apache.spark.sql.functions._

/** Regression pin for a Spark 4.1 planner defect this engine must
  * stay immune to: with `spark.sql.unionOutputPartitioning=true` (the
  * 4.1.2 DEFAULT), UnionExec claims its children's common hash
  * partitioning while execution concatenates their partitions — so a
  * groupBy/aggregation over a union of two same-bucketed scans elides
  * its Exchange and emits one group set PER CHILD (measured: 7 keys ×
  * 2 tables → 14 groups). Every store-merge shape in this engine
  * (KTable merge: bucketed table ∪ same-key Exchange; probe shapes:
  * store scan ∪ derived rows) is a union whose children CAN align, so
  * GraftSession and the test session pin the flag off. This spec
  * fails if either pin is lost. */
class UnionPartitioningSpec extends SparkSpec {

  // a previous JVM's managed-table directory survives as an orphan the
  // new session has no catalog entry for — saveAsTable then refuses the
  // location; clear both sides before writing
  private def freshTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val p = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), name)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }

  test("session pins unionOutputPartitioning off") {
    assert(spark.conf.get("spark.sql.unionOutputPartitioning") == "false")
  }

  test("aligned union of bucketed scans aggregates to GLOBAL groups") {
    val s = spark
    import s.implicits._
    val a = (1 to 100).map(i => (i.toLong, s"k${i % 7}")).toDF("id", "key")
    val b = (101 to 200).map(i => (i.toLong, s"k${i % 7}")).toDF("id", "key")
    freshTable("upp_s1")
    freshTable("upp_s2")
    a.write.mode("overwrite").bucketBy(4, "key").sortBy("key").saveAsTable("upp_s1")
    b.write.mode("overwrite").bucketBy(4, "key").sortBy("key").saveAsTable("upp_s2")
    val agg = spark.table("upp_s1").unionByName(spark.table("upp_s2"))
      .groupBy("key").count()
    val rows = agg.collect()
    assert(rows.length == 7,
      s"union of same-bucketed scans must aggregate globally, got " +
        s"${rows.length} groups (per-child duplicates = the 4.1 defect)")
    assert(rows.map(_.getLong(1)).sum == 200)
  }

  test("KTable-merge shape: bucketed table ∪ aggregated increment merges globally") {
    val s = spark
    import s.implicits._
    // bucket count == shuffle partition count is the alignment trigger
    val n = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val cur = (1 to 50).map(i => (i.toLong, i * 10L)).toDF("ad_id", "imps")
    freshTable("upp_ctr")
    cur.write.mode("overwrite").bucketBy(n, "ad_id").sortBy("ad_id")
      .saveAsTable("upp_ctr")
    val inc = (30 to 80).map(i => (i.toLong, 1L)).toDF("ad_id", "imps")
      .groupBy("ad_id").agg(sum("imps").as("imps"))
    val merged = spark.table("upp_ctr").unionByName(inc)
      .groupBy("ad_id").agg(sum("imps").as("imps"))
    assert(merged.count() == 80,
      "the store-merge union must produce one row per key, never one per child")
  }
}
