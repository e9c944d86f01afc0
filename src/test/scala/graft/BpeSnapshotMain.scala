package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Regenerates the t28 merge-table snapshot: trains
  * [[graft.operators.TextAnalysis.trainBpe]] on the sf-dir's English
  * documents and prints the merge list as Scala/SQL-pasteable lines.
  * Usage: Test/runMain graft.BpeSnapshotMain /root/testdata/sf0.01 12 */
object BpeSnapshotMain {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val n = args(1).toInt
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .appName("bpe-snapshot").getOrCreate()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("lang") === "en")
    val merges = graft.operators.TextAnalysis.trainBpe(docs, "text", n)
    println("MERGES_SCALA: Seq(" + merges.map { case (a, b) =>
      s"""("$a", "$b")""" }.mkString(", ") + ")")
    spark.stop()
  }
}
