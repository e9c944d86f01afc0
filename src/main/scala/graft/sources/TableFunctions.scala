package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table functions as FROM sources (tableFunctionExpr,
  * ClickHouseParser.py:17027-17087) — the grammar treats `numbers(...)`,
  * `file(...)`, `s3(...)`, `url(...)`, `remote(...)` as first-class
  * relations. Spark equivalents:
  *
  *  - `numbers(n)` / `numbers(start, n)` → `spark.range` — a parallel
  *    range source with known partitioning (no data materialized on the
  *    driver; numPartitions makes generation itself distributed);
  *  - `zeros(n)` → range projected to a constant;
  *  - `one()` → the 1-row dummy relation (CH's `system.one`);
  *  - `file/s3/url('path', FORMAT)` → `spark.read.format(...)` — the
  *    format names map as in [[Sinks.intoOutfile]]; s3/http paths are just
  *    Hadoop filesystem URIs on a real cluster;
  *  - `generateRandom(schema, seed)` → deterministic pseudo-random columns
  *    derived from `id` (portable: any engine re-derives the same values).
  *
  * The lineage extractor deliberately EXCLUDES these from dependency
  * edges (paren rule, ch_view_dependencies.py:219-220) — they are sources,
  * not catalog objects; this object is their execution mapping.
  */
object TableFunctions {

  /** `numbers(n)` — column name matches CH's (`number`). */
  def numbers(spark: SparkSession, n: Long, numPartitions: Int = 0): DataFrame = {
    val r = if (numPartitions > 0) spark.range(0, n, 1, numPartitions)
            else spark.range(n)
    r.select(col("id").as("number"))
  }

  /** `numbers(start, n)` — CH semantics: n values beginning at start.
    * (Distinct name: an overload would be ambiguous with `numbers(n,
    * numPartitions)` under Int→Long widening.) */
  def numbersFrom(spark: SparkSession, start: Long, n: Long): DataFrame =
    spark.range(start, start + n).select(col("id").as("number"))

  /** `zeros(n)`: n rows of the constant 0 (CH uses it as a cheap row
    * generator). */
  def zeros(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(lit(0).as("zero"))

  /** `one()` / `system.one`: the single-row dummy relation behind
    * table-less SELECTs. */
  def one(spark: SparkSession): DataFrame =
    spark.range(1).select(lit(0).cast("tinyint").as("dummy"))

  /** `file('path', 'Format')` / `s3('uri', 'Format')` / `url(...)`: a
    * format-dispatched read. On a cluster the URI scheme (s3a://, hdfs://,
    * https:// via a custom FS) picks the filesystem — same entry point. */
  def fileSource(spark: SparkSession, path: String, format: String = "parquet",
      options: Map[String, String] = Map.empty): DataFrame = {
    val fmt = format.toLowerCase match {
      case "csvwithnames" => "csv"
      case "jsoneachrow" => "json"
      case f => f
    }
    val r0 = spark.read.options(options)
    val r1 = if (format.toLowerCase == "csvwithnames")
      r0.option("header", "true") else r0
    r1.format(fmt).load(path)
  }

  /** `generateRandom` stand-in: deterministic pseudo-random doubles in
    * [0,1) per (row id, column index), from a splitmix-style integer mix —
    * reproducible on any engine, unlike engine-native rand(). */
  def generateRandom(spark: SparkSession, n: Long, cols: Int): DataFrame = {
    val base = spark.range(n)
    val m = 1L << 31
    (0 until cols).foldLeft(base.toDF()) { (df, c) =>
      // Mix the column index into the LCG STATE before multiplying (not as
      // a post-hoc additive constant, which left r0..rN spaced ~5.7e-6
      // apart and near-perfectly correlated). Two LCG rounds over Z_2^31;
      // every intermediate stays < 2^62 (ANSI mode: no silent overflow).
      val seeded = pmod(col("id") + lit((c + 1) * 2654435761L), lit(m))
      val r1 = pmod(seeded * lit(1103515245L) + lit(12345L), lit(m))
      val r2 = pmod(r1 * lit(32310901L) + lit(11L), lit(m))
      df.withColumn(s"r$c", r2.cast("double") / lit(m.toDouble))
    }.withColumnRenamed("id", "number")
  }
}
