package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are contributed by QueryPacks (graft.packs.*); this object
  * just concatenates them.
  */
object SparkEntry {

  private val packs: Seq[QueryPack] = Seq(
    graft.packs.ReferencePipelines,
    graft.packs.RelationalOps,
    graft.packs.DedupOps,
    graft.packs.SimilarityOps,
    graft.packs.TextOps,
    graft.packs.ClassifierOps,
    graft.packs.SqlSurfaceOps,
    graft.packs.WindowOps,
    graft.packs.PipelineOps
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("windowed_avg")(spark, "/root/testdata/sf0.001")

  /** Merge pack maps, refusing silent last-wins shadowing on duplicate
    * query names (a shadowed query would drop out of verification while
    * the gate stays green). */
  private def merged[T](f: QueryPack => Seq[(String, T)]): Map[String, T] = {
    val all = packs.flatMap(f)
    val dups = all.groupBy(_._1).collect { case (k, vs) if vs.size > 1 => k }
    require(dups.isEmpty, s"duplicate query names across packs: $dups")
    all.toMap
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    merged(_.queries.toSeq)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    merged(_.oracleSql.toSeq)

  /** The benchmark set: every gated query PLUS the bench-only twins
    * (engine-hash variants with no DuckDB oracle, value-gated by their
    * oracle-verified siblings). `graft.Bench` times this superset so
    * re-pointing a gated name at its oracle twin never silently drops
    * the engine-native form from the performance record. */
  def benchQueries: Map[String, (SparkSession, String) => DataFrame] =
    merged(p => p.queries.toSeq ++ p.benchOnly.toSeq)
}
