package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** ALTER-mutation surface — ClickHouse's heavy mutations
  * (`ALTER TABLE t DELETE WHERE p`, ClickHouseParser.py:2324-2344;
  * `ALTER TABLE t UPDATE c = e, ... WHERE p`, ClickHouseParser.py:2242-2263)
  * and the lightweight `DELETE FROM t WHERE p` statement, re-expressed as
  * Spark batch rewrite jobs.
  *
  * ClickHouse executes a mutation by rewriting every affected data part in
  * the background; the Spark-native equivalent is exactly the same shape —
  * a distributed read-transform-write over the table files:
  *
  *  - the TRANSFORM is a row-local `filter` / conditional `withColumn`
  *    (no shuffle, stays inside whole-stage codegen, scales linearly);
  *  - the WRITE preserves the physical layout (partition columns pass
  *    through `partitionBy`), so downstream pruning is unaffected;
  *  - at 100 TB the predicate prunes the rewrite itself: partitions whose
  *    min/max stats cannot match the WHERE are copied by reference (here:
  *    rewritten, since local parquet has no snapshot metadata layer —
  *    with a table format the unmatched-file skip is metadata-only).
  *
  * Lightweight DELETE (the `_row_exists` mask in ClickHouse) maps to a mask
  * column instead of a rewrite: [[lightweightDelete]] adds the mask,
  * [[compactDeletes]] is the background merge that makes it physical.
  */
object Mutations {

  /** `ALTER TABLE ... DELETE WHERE pred` applied to a snapshot: keep the
    * rows the predicate does NOT match. */
  def delete(df: DataFrame, pred: Column): DataFrame =
    df.filter(!coalesce(pred, lit(false)))

  /** `ALTER TABLE ... UPDATE c = e, ... WHERE pred`: conditional column
    * replacement; non-matching rows pass through untouched. */
  def update(df: DataFrame, assignments: Seq[(String, Column)], pred: Column): DataFrame =
    assignments.foldLeft(df) { case (d, (c, e)) =>
      d.withColumn(c, when(coalesce(pred, lit(false)), e).otherwise(col(c)))
    }

  /** The mutation job itself: read the table directory, apply the
    * transform, write the rewritten table. Distributed end to end — the
    * driver never sees a row. */
  def rewriteTable(
      spark: SparkSession, inPath: String, outPath: String,
      transform: DataFrame => DataFrame,
      partitionBy: Seq[String] = Nil
  ): Unit = {
    val w = transform(spark.read.parquet(inPath)).write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(outPath)
  }

  /** `ALTER TABLE ... RENAME COLUMN a TO b` (AlterTableClause,
    * ClickHouseParser.py:2178-2896). On an immutable-file layout this is a
    * rewrite; on a table format (Delta/Iceberg) the same transform is
    * metadata-only — the operator is the transform either way. */
  def renameColumn(df: DataFrame, from: String, to: String): DataFrame =
    df.withColumnRenamed(from, to)

  /** `ALTER TABLE ... DROP COLUMN c`. */
  def dropColumn(df: DataFrame, c: String): DataFrame = df.drop(c)

  /** `ALTER TABLE ... MODIFY COLUMN c type`: a cast rewrite — the only
    * ALTER variant that always touches data, on any storage format. */
  def modifyColumnType(df: DataFrame, c: String,
      to: org.apache.spark.sql.types.DataType): DataFrame =
    df.withColumn(c, col(c).cast(to))

  /** `ALTER TABLE ... COMMENT COLUMN c 'text'`: metadata-only. */
  def commentColumn(df: DataFrame, c: String, comment: String): DataFrame = {
    val meta = new org.apache.spark.sql.types.MetadataBuilder()
      .putString("comment", comment).build()
    df.withColumn(c, col(c).as(c, meta))
  }

  /** Lightweight `DELETE FROM t WHERE pred`: O(changed rows) — a boolean
    * `_row_exists` mask column, false where deleted. Readers must filter on
    * it (ClickHouse does this implicitly; [[readVisible]] is that reader). */
  def lightweightDelete(df: DataFrame, pred: Column): DataFrame = {
    val existing = if (df.columns.contains("_row_exists"))
      col("_row_exists") else lit(true)
    df.withColumn("_row_exists", existing && !coalesce(pred, lit(false)))
  }

  /** The implicit visibility filter over a lightweight-deleted table. */
  def readVisible(df: DataFrame): DataFrame =
    if (df.columns.contains("_row_exists"))
      df.filter(col("_row_exists")).drop("_row_exists")
    else df

  /** Background compaction: make lightweight deletes physical (the merge
    * that ClickHouse runs on its own schedule). */
  def compactDeletes(df: DataFrame): DataFrame = readVisible(df)
}
