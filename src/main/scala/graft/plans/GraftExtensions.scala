package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.PortableHash

/** SQL registration of the engine's native expressions, so plain Spark SQL
  * can call them:
  * {{{
  *   SELECT graft_char_fold(text)        -- portable document fingerprint
  *   SELECT graft_dot(a, b)              -- embedding dot product
  *   SELECT graft_minhash(hashes, 16)    -- minhash signature
  * }}}
  *
  * Two entry points:
  *  - [[GraftExtensions]] for `SparkSession.builder.withExtensions(...)` /
  *    `spark.sql.extensions=graft.plans.GraftExtensions` (cluster config);
  *  - [[GraftFunctions.register]] for a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.builders.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftFunctions {
  import NativeExpressions._

  type Builder = Seq[Expression] => Expression

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft.plans.NativeExpressions", null, name, usage, "")

  val builders: Seq[(String, ExpressionInfo, Builder)] = Seq(
    ("graft_char_fold",
      info("graft_char_fold", "portable polynomial string hash"),
      (es: Seq[Expression]) =>
        CharFoldHash(es.head, PortableHash.Mult, PortableHash.Mod)),
    ("graft_dot",
      info("graft_dot", "sequential-fold dot product of double arrays"),
      (es: Seq[Expression]) => DotProduct(es(0), es(1))),
    ("graft_minhash",
      info("graft_minhash", "minhash signature of a hash array"),
      (es: Seq[Expression]) => MinHashSignature(es(0),
        es(1).eval().asInstanceOf[Int], PortableHash.Mod)),
    ("graft_simhash",
      info("graft_simhash", "32-bit simhash of a token-hash array"),
      (es: Seq[Expression]) => SimHash32(es(0))),
    ("graft_shingle_hashes",
      info("graft_shingle_hashes", "hashed word n-gram shingles of a text"),
      (es: Seq[Expression]) => ShingleHashes(es(0),
        es(1).eval().asInstanceOf[Int], PortableHash.Mult, PortableHash.Mod)),
    ("graft_funnel_level",
      info("graft_funnel_level",
        "funnel depth over a sorted (ts*10+step)-encoded event array"),
      (es: Seq[Expression]) => WindowFunnelLevel(es(0),
        es(1).eval().asInstanceOf[Int],
        es(2).eval() match { case i: Int => i.toLong; case l: Long => l })),
    ("graft_sequence_count",
      info("graft_sequence_count",
        "non-overlapping complete-chain count over a sorted encoded event array"),
      (es: Seq[Expression]) => SequenceCountAgg(es(0),
        es(1).eval().asInstanceOf[Int])),
    ("graft_top_k",
      info("graft_top_k",
        "k most frequent values (freq desc, value asc) — CH topK exact tier"),
      (es: Seq[Expression]) => TopKAgg(es(0),
        es(1).eval().asInstanceOf[Int]).toAggregateExpression()))

  /** Register into a live session's function registry. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
}
