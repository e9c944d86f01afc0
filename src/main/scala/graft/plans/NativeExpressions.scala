package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd Catalyst expressions for the hot inner loops of the dedup /
  * similarity operators. Each is semantically identical to the
  * higher-order-function formulation it replaces (same fold order, same
  * arithmetic) — the HOF versions are interpreted per element, which
  * dominated the profile (~90 s of a 143 s bench run at sf0.1); these
  * run inside whole-stage codegen as a single tight loop.
  */
object NativeExpressions {

  /** Polynomial char-fold hash — identical to
    * `aggregate(transform(split(s,''), ascii), 0, (a,c) -> (a*mult+c) % mod)`
    * over unicode code points. */
  def charFoldCompute(s: UTF8String, mult: Long, mod: Long): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      acc = java.lang.Math.floorMod(acc * mult + cp, mod)
      i += Character.charCount(cp)
    }
    acc
  }

  /** Sequential-fold dot product of two double arrays — identical to
    * `aggregate(zip_with(a,b,*), 0.0, +)` (left-to-right accumulation,
    * shorter-array excess treated as absent, null elements as 0). */
  def dotCompute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  /** MinHash signature inner loop: for perm i in [0,k):
    * min over hashes of (h·(2i+1) + 12345·i + 1) mod `mod`. */
  def minhashCompute(hashes: ArrayData, k: Int, mod: Long): ArrayData = {
    val out = new Array[Long](k)
    val n = hashes.numElements()
    var i = 0
    while (i < k) {
      val a = 2L * i + 1
      val b = 12345L * i + 1
      var best = Long.MaxValue
      var j = 0
      while (j < n) {
        val v = java.lang.Math.floorMod(hashes.getLong(j) * a + b, mod)
        if (v < best) best = v
        j += 1
      }
      out(i) = best
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  /** Word n-gram shingle hashes straight from text: tokenize on single
    * spaces (Java split semantics: trailing empties kept, like the SQL
    * `split(text,' ')`), first-occurrence-distinct the shingle *strings*,
    * charFold-hash each — identical to
    * `transform(array_distinct(shingles(text,n)), charFold)` but in one
    * pass without materializing shingle strings per row twice. Collision
    * semantics preserved: distinctness is by string, so two distinct
    * shingles hashing equal still contribute two array entries. */
  def shingleHashesCompute(text: UTF8String, n: Int, mult: Long, mod: Long): ArrayData = {
    val tokens = text.toString.split(" ", -1)
    val last = math.max(tokens.length - n, 0)
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i <= last) {
      val end = math.min(i + n, tokens.length)
      val sb = new java.lang.StringBuilder()
      var j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(tokens(j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) {
      out(k) = charFoldCompute(UTF8String.fromString(it.next()), mult, mod)
      k += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  /** The shingle *strings* (for exact-Jaccard verification) — same
    * tokenization/distinctness as [[shingleHashesCompute]]. */
  def wordShinglesCompute(text: UTF8String, n: Int): ArrayData = {
    val tokens = text.toString.split(" ", -1)
    val last = math.max(tokens.length - n, 0)
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i <= last) {
      val end = math.min(i + n, tokens.length)
      val sb = new java.lang.StringBuilder()
      var j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(tokens(j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[UTF8String](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
    override def dataType: DataType = org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StringType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override protected def nullSafeEval(input: Any): Any =
      wordShinglesCompute(input.asInstanceOf[UTF8String], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.plans.NativeExpressions.wordShinglesCompute($c, $n)")
    override protected def withNewChildInternal(newChild: Expression): WordShingles =
      copy(child = newChild)
  }

  case class ShingleHashes(child: Expression, n: Int, mult: Long, mod: Long)
      extends UnaryExpression {
    override def dataType: DataType =
      org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override protected def nullSafeEval(input: Any): Any =
      shingleHashesCompute(input.asInstanceOf[UTF8String], n, mult, mod)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.plans.NativeExpressions.shingleHashesCompute($c, $n, ${mult}L, ${mod}L)")
    override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
      copy(child = newChild)
  }

  case class CharFoldHash(child: Expression, mult: Long, mod: Long)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullIntolerant: Boolean = true
    override protected def nullSafeEval(input: Any): Any =
      charFoldCompute(input.asInstanceOf[UTF8String], mult, mod)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.plans.NativeExpressions.charFoldCompute($c, ${mult}L, ${mod}L)")
    override protected def withNewChildInternal(newChild: Expression): CharFoldHash =
      copy(child = newChild)
  }

  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true
    override protected def nullSafeEval(a: Any, b: Any): Any =
      dotCompute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) =>
        s"graft.plans.NativeExpressions.dotCompute($a, $b)")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): DotProduct =
      copy(left = newLeft, right = newRight)
  }

  case class MinHashSignature(child: Expression, k: Int, mod: Long)
      extends UnaryExpression {
    override def dataType: DataType =
      org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override protected def nullSafeEval(input: Any): Any =
      minhashCompute(input.asInstanceOf[ArrayData], k, mod)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.plans.NativeExpressions.minhashCompute($c, $k, ${mod}L)")
    override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
      copy(child = newChild)
  }

  // Column wrappers
  def char_fold(c: Column, mult: Long, mod: Long): Column =
    ColumnBridge.column(CharFoldHash(ColumnBridge.expression(c), mult, mod))
  def dot_product(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def minhash_signature(hashes: Column, k: Int, mod: Long): Column =
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(hashes), k, mod))
  def shingle_hashes(text: Column, n: Int, mult: Long, mod: Long): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(text), n, mult, mod))
  def word_shingles(text: Column, n: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(text), n))
}
