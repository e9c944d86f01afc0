package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Scratch dev probe (r15): isolate where the logistic-trainer steps
  * spend time — per-step wall, codegen compile counts/time. */
object TrainerProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def cgStats(): (Long, Double, Long) = {
      import org.apache.spark.metrics.source.CodegenMetrics._
      (METRIC_SOURCE_CODE_SIZE.getCount,
        METRIC_COMPILATION_TIME.getSnapshot.getMean,
        METRIC_COMPILATION_TIME.getCount)
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("lang"),
        TextAnalysis.mixedScriptFixture(col("text"), col("lang")).as("text"))
    val langs = Seq("de", "en", "es", "fr", "zh")
    val seed = docs.filter(col("doc_id") < 250)
    var t0 = System.nanoTime()
    var cg0 = cgStats()
    val models = TextAnalysis.trainLogisticMulti(seed, "doc_id", "text",
      langs.map(l => l -> (col("lang") === l)), buckets = 64, steps = 8,
      lr = 256.0)
    var cg1 = cgStats()
    println(f"train: ${(System.nanoTime() - t0) / 1e9}%.3f s  " +
      s"codegen compiles ${cg1._3 - cg0._3}, mean ${cg1._2}ms")
    t0 = System.nanoTime(); cg0 = cgStats()
    val models2 = TextAnalysis.trainLogisticMulti(seed, "doc_id", "text",
      langs.map(l => l -> (col("lang") === l)), buckets = 64, steps = 8,
      lr = 256.0)
    cg1 = cgStats()
    println(f"train2: ${(System.nanoTime() - t0) / 1e9}%.3f s  " +
      s"codegen compiles ${cg1._3 - cg0._3}, mean ${cg1._2}ms")
    require(models.map(_._2.toSeq) == models2.map(_._2.toSeq), "trajectory drift!")
    t0 = System.nanoTime()
    val served = TextAnalysis.langIdTrained(docs, "doc_id", "text", models)
    served.queryExecution.toRdd.count()
    println(f"serve: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    spark.stop()
  }
}
