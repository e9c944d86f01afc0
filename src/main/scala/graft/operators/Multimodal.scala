package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata extracted by a *batched* per-
  * partition decode — the Scala analog of `mapInPandas` (buffer a batch,
  * run the codec over the batch, emit rows). The decode itself is STUBBED
  * (this container has no image/audio libraries): [[StubCodec.decode]] is a
  * deterministic fake keyed on the payload bytes. The Spark-side plumbing —
  * schema, binary column, batch shape, partition parallelism — is real and
  * oracle-tested (the stub's arithmetic is reproducible in SQL).
  */
object Multimodal {

  /** Typed metadata row produced by the decode stage. */
  final case class MediaMeta(
      doc_id: Long, format: String, width: Int, height: Int, n_bytes: Long)

  /** STUB codec — stands in for an image decoder. Deterministic pure
    * function of the payload so results are verifiable; swap the body for
    * a real codec (JNI/javax.imageio) without touching the plumbing. */
  object StubCodec {
    def decode(payload: Array[Byte]): (String, Int, Int) = {
      val n = payload.length.toLong
      val format = (n % 3) match {
        case 0 => "png"
        case 1 => "jpeg"
        case _ => "webp"
      }
      (format, (n % 640 + 1).toInt, (n * 7 % 480 + 1).toInt)
    }
  }

  /** Attach the opaque binary payload column (here derived from text —
    * in production this is the raw media bytes column). */
  def withPayload(df: DataFrame, srcCol: String): DataFrame =
    df.withColumn("payload", col(srcCol).cast("binary"))

  /** Batched metadata extraction: partitions stream through the codec in
    * `batchSize` groups (bounded memory per batch, codec amortization —
    * the mapInPandas batch shape). One task per input partition; no
    * shuffle. */
  def extractMeta(df: DataFrame, idCol: String, batchSize: Int = 256): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // batch boundary = codec invocation boundary (stub decodes
          // element-wise; a real vectorized codec would take the batch)
          batch.iterator.map { case (id, payload) =>
            val (fmt, w, h) = StubCodec.decode(payload)
            MediaMeta(id, fmt, w, h, payload.length.toLong)
          }
        }
      }
  }
}
