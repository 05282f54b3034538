package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each probe row, the most recent build row with
  * build.ts <= probe.ts for the same key (the time-series enrichment
  * join Spark lacks as a built-in logical operator).
  *
  * Implementation is the union-tag single-sort formulation, not a
  * join: tag build rows 0 and probe rows 1, sort each key partition by
  * (ts, tag) — build-before-probe at equal timestamps gives inclusive
  * <= semantics — and carry the latest non-null build payload forward
  * with last(ignoreNulls) over an unbounded-preceding frame.
  *
  * Scale: ONE shuffle on the key + one sort — same cost as a regular
  * sort-merge join, no range-condition blow-up, no per-probe scan of
  * the build side. Skewed keys shard like any sort (AQE); memory is
  * O(1) per row since the running frame keeps only the last payload.
  */
object AsOfJoin {

  /** `probe`: (key, ts, probe cols); `build`: (key, ts, one value col).
    * Returns probe rows + asof_<valueCol> and asof_ts (null when no
    * prior build row). */
  def asOf(
      probe: DataFrame,
      build: DataFrame,
      keyCol: String,
      tsCol: String,
      buildValueCol: String): DataFrame = {
    val probeCols = probe.columns.filterNot(c => c == keyCol || c == tsCol)
    val buildSide = build.select(
      (Seq(col(keyCol), col(tsCol), lit(0).as("__tag"),
        col(buildValueCol).as("__bv"), col(tsCol).as("__bts")) ++
        probeCols.map(c => lit(null).cast(probe.schema(c).dataType).as(c))): _*)
    val probeSide = probe.select(
      (Seq(col(keyCol), col(tsCol), lit(1).as("__tag"),
        lit(null).cast(build.schema(buildValueCol).dataType).as("__bv"),
        lit(null).cast(build.schema(tsCol).dataType).as("__bts")) ++
        probeCols.map(c => col(c))): _*)
    val tagged = buildSide.unionByName(probeSide)
    // Third order key: among build rows sharing (key, ts) the sort order
    // would otherwise be partitioning-dependent and last() would pick an
    // arbitrary one — a nondeterministic result (and a flaky oracle).
    // Ordering by the build value makes the pick the MAX value of the
    // tied build rows, deterministically. Probe rows all carry null __bv
    // and nulls sort first under asc, so their relative order stays
    // irrelevant (each probe row's frame adds only nulls past the last
    // build row, and last(ignoreNulls) skips them).
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col("__tag").asc, col("__bv").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    tagged
      .withColumn(s"asof_$buildValueCol", last(col("__bv"), ignoreNulls = true).over(w))
      .withColumn("asof_ts", last(col("__bts"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .drop("__tag", "__bv", "__bts")
  }
}
