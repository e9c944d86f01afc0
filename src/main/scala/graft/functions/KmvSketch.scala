package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** KMV (k-minimum-values) distinct-count sketch as a typed Spark
  * [[Aggregator]] — the custom-aggregation tier of the CH `uniq` family
  * (between exact `count_distinct` and HLL `approx_count_distinct`).
  *
  * Estimator: keep the k smallest *distinct* hash values; if fewer than k
  * distinct hashes exist the count is exact; otherwise
  * `(k-1) · M / h_k` where `h_k` is the k-th smallest and M the hash
  * modulus. With [[PortableHash.charFold]] as the hash the whole sketch is
  * deterministic and re-derivable in SQL — unlike HLL, the oracle can
  * hash-match it (query `q42_kmv_distinct`).
  *
  * Merge is associative/commutative (sorted-array union, keep k smallest),
  * so partial aggregation works map-side like any built-in agg.
  */
object KmvSketch {

  /** Sketch buffer: sorted ascending, ≤ k distinct hash values. */
  final case class Buf(values: Array[Long])

  final class KmvAggregator(k: Int, mod: Long) extends Aggregator[Long, Buf, Double] {

    override def zero: Buf = Buf(Array.empty)

    private def insert(sorted: Array[Long], h: Long): Array[Long] = {
      val pos = java.util.Arrays.binarySearch(sorted, h)
      if (pos >= 0) sorted // already present
      else {
        val ins = -pos - 1
        if (sorted.length >= k && ins >= k) sorted // larger than current k-th
        else {
          val merged = new Array[Long](math.min(sorted.length + 1, k))
          System.arraycopy(sorted, 0, merged, 0, ins)
          merged(ins) = h
          val tail = math.min(sorted.length - ins, merged.length - ins - 1)
          if (tail > 0) System.arraycopy(sorted, ins, merged, ins + 1, tail)
          merged
        }
      }
    }

    override def reduce(b: Buf, h: Long): Buf = Buf(insert(b.values, h))

    override def merge(a: Buf, b: Buf): Buf = {
      var acc = a.values
      var i = 0
      while (i < b.values.length) { acc = insert(acc, b.values(i)); i += 1 }
      Buf(acc)
    }

    override def finish(b: Buf): Double =
      if (b.values.length < k) b.values.length.toDouble
      else (k - 1).toDouble * mod.toDouble / b.values(k - 1).toDouble

    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Column form over a pre-hashed long column:
    * `df.agg(KmvSketch.kmvDistinct(PortableHash.charFold(col), 256))`. */
  def kmvDistinct(hashCol: Column, k: Int, mod: Long = PortableHash.Mod): Column =
    udaf(new KmvAggregator(k, mod)).apply(hashCol)
}
