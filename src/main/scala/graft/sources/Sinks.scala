package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Output sinks — the `INTO OUTFILE 'f' [FORMAT fmt]` surface
  * (ClickHouseParser.py:1765-1775) and MV `TO target` destinations mapped
  * to `df.write`. Partitioning/bucketing options are exposed because at
  * 100 TB the write layout IS the read performance of every downstream
  * consumer. */
object Sinks {

  /** INTO OUTFILE: write in the given format; CH FORMAT names map to Spark
    * datasource names (Parquet/CSV[WithNames]/JSONEachRow → json). */
  def intoOutfile(
      df: DataFrame, path: String, format: String = "parquet",
      partitionBy: Seq[String] = Nil,
      mode: SaveMode = SaveMode.Overwrite,
      options: Map[String, String] = Map.empty
  ): Unit = {
    val fmt = format.toLowerCase match {
      case "csvwithnames" => "csv"
      case "jsoneachrow" => "json"
      case f => f
    }
    val w0 = df.write.mode(mode).options(options)
    val w1 = if (format.toLowerCase == "csvwithnames")
      w0.option("header", "true") else w0
    val w2 = if (partitionBy.nonEmpty) w1.partitionBy(partitionBy: _*) else w1
    w2.format(fmt).save(path)
  }

  /** MV `TO db.table` destination: append into a (bucketed/partitioned)
    * table — the batch leg of StreamingOps.MaterializedView. */
  def toTable(df: DataFrame, table: String,
      mode: SaveMode = SaveMode.Append): Unit =
    df.write.mode(mode).saveAsTable(table)
}
