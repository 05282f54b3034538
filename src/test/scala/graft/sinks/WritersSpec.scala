package graft.sinks

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class WritersSpec extends SparkSpec {
  import spark.implicits._

  test("partitioned parquet write prunes partitions on read") {
    val dir = Files.createTempDirectory("graft_part").toString + "/out"
    val df = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "a", 3.0))
      .toDF("id", "k", "v")
    Writers.partitionedParquet(df, dir, Seq("k"))
    val back = spark.read.parquet(dir)
    assert(back.count() == 3)
    val pruned = back.filter(col("k") === "a")
    assert(pruned.count() == 2)
    // partition filter must appear as PartitionFilters, not a data filter
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(k"), plan)
  }

  test("bucketed table join on the bucket key has no shuffle on the bucketed side") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val wh = Files.createTempDirectory("graft_wh")
      val df = (1L to 100L).map(i => (i, s"name$i")).toDF("id", "name")
      Writers.bucketedTable(df, "bucketed_t", "id", 4)
      val other = (1L to 50L).map(i => (i, i * 2.0)).toDF("id", "x")
        .repartition(4, col("id"))
      val joined = spark.table("bucketed_t").join(other, "id")
      assert(joined.count() == 50)
      val plan = joined.queryExecution.executedPlan.toString
      // the bucketed scan side must not re-Exchange
      assert(!plan.contains("Exchange hashpartitioning(id#") ||
        "Exchange".r.findAllIn(plan).length <= 1,
        s"bucketed side must avoid shuffle:\n$plan")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS bucketed_t")
    }
  }

  test("orc roundtrip: values exact, partition pruning and column pushdown work") {
    val dir = Files.createTempDirectory("graft_orc").toString + "/out"
    val df = graft.Tables.documents(spark, sf).select("doc_id", "lang", "text")
    Writers.partitionedOrc(df, dir, Seq("lang"))
    val back = spark.read.orc(dir)
    // exact value roundtrip (ORC string/long codecs lossless)
    assert(back.select("doc_id", "text").as[(Long, String)].collect().sorted.toSeq
      == df.select("doc_id", "text").as[(Long, String)].collect().sorted.toSeq)
    val pruned = back.filter(col("lang") === "en").select("doc_id")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"), plan)
    // column pruning must reach the ORC scan — text not read
    assert(plan.contains("ReadSchema: struct<doc_id:bigint>"), plan)
  }

  test("permissive decode null-fills malformed rows instead of failing") {
    import graft.sources.DelimitedCodec
    val df = Seq("0,1,apples,10.0", "garbage,without,enough").toDF("value")
    val out = df.select(
      DelimitedCodec.decodePermissive(col("value"), DelimitedCodec.orderSchema)
        .as("r"))
      .select(col("r.*"))
    assert(out.count() == 2)
    assert(out.filter(col("orderValue").isNull).count() == 1)
  }

  test("trainingShards: one directory per shard, rows in pos order inside each file") {
    import graft.operators.TextAnalysis
    import graft.packs.TextOps
    val dir = Files.createTempDirectory("graft_shards").toString + "/out"
    val packed = TextAnalysis.packSequences(
      graft.Tables.documents(spark, sf), "doc_id", "text",
      TextOps.NumShards, TextOps.PackBudget)
    Writers.trainingShards(packed, dir)

    val dirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("shard=")).map(_.getName).sorted
    assert(dirs.length == TextOps.NumShards,
      s"one directory per shard, got ${dirs.toSeq}")

    // every shard directory's file(s) hold rows already in pos order —
    // a sequential reader needs no sort; read file-by-file, one
    // partition each, so scan order == file order
    var total = 0L
    dirs.foreach { d =>
      val files = new java.io.File(s"$dir/$d").listFiles()
        .filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"$d: one writer task -> one file")
      val pos = spark.read.parquet(files.head.getPath).coalesce(1)
        .select(col("pos")).as[Long].collect()
      assert(pos.length > 0)
      assert(pos.toSeq == pos.sorted.toSeq, s"$d: rows must be in pos order")
      assert(pos.toSeq == (1L to pos.length).toSeq, s"$d: positions 1..n")
      total += pos.length
    }
    assert(total == packed.count(), "every packed row lands exactly once")
  }
}
