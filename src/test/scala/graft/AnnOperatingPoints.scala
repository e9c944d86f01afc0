package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** ANN recall-vs-cost operating-point harness (VERDICT r9 §next-3): the
  * `annRecall` evaluator exists, but v12 measures ONE configuration at
  * ONE scale — this main measures the whole trade surface so the
  * recommended operating point is a MEASUREMENT, not an assertion:
  *
  *   exact brute force (ground truth + its own cost) vs
  *   ivfTopKFixedC  c ∈ {10, 32} × nprobe ∈ {1, 2}   (constant codebook)
  *   pqTopK         m=4, C=10/subspace               (v8 tier)
  *   ivfPqTopK      m=4, both codebooks C=10, nprobe ∈ {1, 2} (v9 tier)
  *
  * at every supplied scale directory (sf0.1 and the derived sf1), k=10
  * over 50 query vectors. Wall time is min-of-2 full materializations;
  * recall@10 is the mean per-query overlap with the exact top-10.
  *
  * Usage: Test/runMain graft.AnnOperatingPoints OUT.json \
  *          sf0.1=/root/testdata/sf0.1 sf1=/tmp/graft_sf1
  */
object AnnOperatingPoints {
  def main(args: Array[String]): Unit = {
    val out = args(0)
    val dirs = args.drop(1).map { a =>
      val Array(l, p) = a.split("=", 2); (l, p)
    }
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "16g")
      .appName("ann-operating-points").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val k = 10
    val qPred = col("id") < 50

    def timed(mk: () => DataFrame): (Double, DataFrame) = {
      def once(): (Double, DataFrame) = {
        val t0 = System.nanoTime()
        val df = mk()
        df.count() // materialize the whole result
        ((System.nanoTime() - t0) / 1e9, df)
      }
      val a = once(); val b = once()
      (math.min(a._1, b._1), b._2)
    }

    def meanRecall(exact: DataFrame, approx: DataFrame): Double =
      Similarity.annRecall(exact, approx)
        .agg(avg("recall")).head().getDouble(0)

    val sb = new StringBuilder
    sb.append("{\n \"round\": 10,\n")
    sb.append(" \"purpose\": \"recall@10 vs wall-time for the ANN tiers " +
      "across configurations and scales (VERDICT r9 next-3)\",\n")
    sb.append(" \"protocol\": \"k=10, 50 query vectors, min-of-2 full " +
      "materializations per cell; recall vs exact cosine top-10\",\n")
    sb.append(" \"scales\": {\n")

    val scaleJson = dirs.map { case (label, dir) =>
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        .persist()
      val n = emb.count()
      System.err.println(s"== $label: $n vectors ==")

      val (exactSec, exactDf) = timed(() =>
        Similarity.topKNeighbors(emb.filter(qPred), emb, "vec_id",
          "embedding", k))
      val exact = exactDf.persist()
      exact.count()

      val cells = Seq.newBuilder[String]
      cells += s"""  "exact_bruteforce": {"sec": ${f"$exactSec%.3f"}, "recall_at_10": 1.0}"""

      for (c <- Seq(10, 32); np <- Seq(1, 2)) {
        val (sec, df) = timed(() =>
          Similarity.ivfTopKFixedC(emb, "vec_id", "embedding", c = c,
            queryPred = qPred, k = k, nprobe = np, knownN = n))
        val r = meanRecall(exact, df)
        cells += s"""  "ivf_fixedC_c${c}_nprobe$np": {"sec": ${f"$sec%.3f"}, "recall_at_10": ${f"$r%.4f"}}"""
        System.err.println(s"  ivf c=$c np=$np: ${f"$sec%.3f"}s recall=${f"$r%.4f"}")
      }

      val every = math.max(1L, n / 10).toInt
      val (pqSec, pqDf) = timed(() =>
        Similarity.pqTopK(emb, "vec_id", "embedding", m = 4,
          centroidEvery = every, queryPred = qPred, k = k))
      val pqR = meanRecall(exact, pqDf)
      cells += s"""  "pq_m4_C10": {"sec": ${f"$pqSec%.3f"}, "recall_at_10": ${f"$pqR%.4f"}}"""
      System.err.println(s"  pq: ${f"$pqSec%.3f"}s recall=${f"$pqR%.4f"}")

      for (np <- Seq(1, 2)) {
        val (sec, df) = timed(() =>
          Similarity.ivfPqTopK(emb, "vec_id", "embedding", m = 4,
            pqCentroidEvery = every, coarseCentroidEvery = every,
            queryPred = qPred, k = k, nprobe = np))
        val r = meanRecall(exact, df)
        cells += s"""  "ivfpq_m4_C10_nprobe$np": {"sec": ${f"$sec%.3f"}, "recall_at_10": ${f"$r%.4f"}}"""
        System.err.println(s"  ivfpq np=$np: ${f"$sec%.3f"}s recall=${f"$r%.4f"}")
      }

      exact.unpersist(); emb.unpersist()
      s""" "$label": {\n  "n_vectors": $n,\n${cells.result().mkString(",\n")}\n }"""
    }
    sb.append(scaleJson.mkString(",\n"))
    sb.append("\n }\n}\n")
    val w = new java.io.PrintWriter(out)
    w.write(sb.toString); w.close()
    println(s"Wrote $out")
    spark.stop()
  }
}
