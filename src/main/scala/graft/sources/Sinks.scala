package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Output sinks — the `INTO OUTFILE 'f' [FORMAT fmt]` surface
  * (ClickHouseParser.py:1765-1775) and MV `TO target` destinations mapped
  * to `df.write`. Partitioning/bucketing options are exposed because at
  * 100 TB the write layout IS the read performance of every downstream
  * consumer. */
object Sinks {

  /** INTO OUTFILE: write in the given format. The CH FORMAT family
    * (formatClause, ClickHouseParser.py:1765-1775) maps onto Spark
    * datasources where a faithful twin exists:
    *  - Parquet / Native → parquet (Native is CH's binary columnar wire
    *    format; parquet is the Spark-native columnar equivalent)
    *  - CSV / CSVWithNames → csv (header on for WithNames)
    *  - TabSeparated|TSV / TabSeparatedWithNames|TSVWithNames → csv with
    *    a tab separator (CH's default text format)
    *  - JSONEachRow → json (newline-delimited objects, same contract)
    * `Pretty*` is a terminal rendering, not a storage format — use
    * [[pretty]]. */
  def intoOutfile(
      df: DataFrame, path: String, format: String = "parquet",
      partitionBy: Seq[String] = Nil,
      mode: SaveMode = SaveMode.Overwrite,
      options: Map[String, String] = Map.empty
  ): Unit = {
    val lower = format.toLowerCase
    val fmt = lower match {
      case "csvwithnames" => "csv"
      case "tabseparated" | "tsv" | "tabseparatedwithnames" |
           "tsvwithnames" => "csv"
      case "jsoneachrow" => "json"
      case "native" => "parquet"
      case f => f
    }
    val extra: Map[String, String] = lower match {
      case "csvwithnames" => Map("header" -> "true")
      case "tabseparated" | "tsv" => Map("sep" -> "\t")
      case "tabseparatedwithnames" | "tsvwithnames" =>
        Map("sep" -> "\t", "header" -> "true")
      case _ => Map.empty
    }
    val w0 = df.write.mode(mode).options(options ++ extra)
    val w1 = if (partitionBy.nonEmpty) w0.partitionBy(partitionBy: _*) else w0
    w1.format(fmt).save(path)
  }

  /** CH `FORMAT Pretty` twin: the bordered ASCII table as a string (CH
    * renders to the terminal; Spark's showString is the same contract).
    * Driver-side by design — a terminal rendering is inherently a
    * small-result surface, so `maxRows` caps the collect. */
  def pretty(df: DataFrame, maxRows: Int = 100): String =
    org.apache.spark.sql.graftbridge.ColumnBridge.showString(df, maxRows, 0)

  /** MV `TO db.table` destination: append into a (bucketed/partitioned)
    * table — the batch leg of StreamingOps.MaterializedView. */
  def toTable(df: DataFrame, table: String,
      mode: SaveMode = SaveMode.Append): Unit =
    df.write.mode(mode).saveAsTable(table)

  /** MergeTree `ORDER BY` mapping (engineClause,
    * ClickHouseParser.py:5807-5962): sort within partitions before writing
    * so parquet row-group min/max stats become selective — the Spark
    * equivalent of ClickHouse's primary-key data skipping. Combine with
    * `partitionBy` for the PARTITION BY clause. */
  def writeSorted(
      df: DataFrame, path: String, sortCols: Seq[String],
      partitionBy: Seq[String] = Nil,
      mode: SaveMode = SaveMode.Overwrite
  ): Unit = {
    val sorted = df.sortWithinPartitions(
      sortCols.map(org.apache.spark.sql.functions.col): _*)
    val w = sorted.write.mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** MergeTree `TTL` mapping (ttlClause, ClickHouseParser.py:6113): a
    * retention job over a date-partitioned layout — partitions older than
    * the cutoff are dropped wholesale (directory delete, no data rewrite;
    * O(partitions) driver work, zero executor work). `partitionCol` must be
    * the physical partition column (e.g. written via partitionBy("dt")). */
  def applyTtl(spark: org.apache.spark.sql.SparkSession, path: String,
      partitionCol: String, cutoff: String): Seq[String] = {
    val root = new java.io.File(path)
    val victims = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory)
      .filter(_.getName.startsWith(s"$partitionCol="))
      .filter(_.getName.stripPrefix(s"$partitionCol=") < cutoff)
    victims.foreach { d =>
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete(); ()
      }
      rm(d)
    }
    victims.map(_.getName).toSeq.sorted
  }
}
