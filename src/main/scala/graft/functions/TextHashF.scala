package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native row-at-a-time implementations of the hot text-signature
  * builders. The HOF formulations in `graft.text.TextOps` /
  * `TextQueries` are the executable SPEC (readable, engine-portable,
  * oracle-mirrored); these are the fast path: the HOF chains are
  * CodegenFallback and pay per-element closure dispatch + boxed array
  * churn on every token × bit / shingle × seed, which made the
  * signature artifacts the most expensive build in the suite (~12 s of
  * bench warm-up at sf0.1). Each method reproduces the corresponding
  * HOF output BIT-FOR-BIT (property-tested in Round3Spec, and the
  * DuckDB oracles — derived from the HOF spec — still hash-match):
  *
  *  - same tokenization (`split(" ", -1)`, trailing empties kept);
  *  - same character-based substring semantics
  *    (`UTF8String.substringSQL` — what Spark's `substr` uses);
  *  - md5 over UTF-8 bytes, hex lowercase, string-lexicographic min.
  */
object TextHashOps {

  private val hexChars = "0123456789abcdef".toCharArray

  private def md5hex(md: MessageDigest, bytes: Array[Byte]): String = {
    val h = md.digest(bytes) // digest() resets the instance
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexChars((h(i) >> 4) & 0xF)
      out(2 * i + 1) = hexChars(h(i) & 0xF)
      i += 1
    }
    new String(out)
  }

  /** Equals `TextOps.simhash(text, nBits)`: duplicate-weighted SimHash,
    * bit b from hex digit b/4 of each token's md5, ties to 0.
    */
  def simhash(text: UTF8String, nBits: Int): Long = {
    val md = MessageDigest.getInstance("MD5")
    val toks = text.toString.split(" ", -1)
    val w = new Array[Int](nBits)
    var t = 0
    while (t < toks.length) {
      val h = md.digest(toks(t).getBytes("UTF-8"))
      var b = 0
      while (b < nBits) {
        val c = b / 4 // 0-based hex-digit index
        val digit =
          if ((c & 1) == 0) (h(c / 2) >> 4) & 0xF else h(c / 2) & 0xF
        w(b) += ((digit >> (b % 4)) & 1) * 2 - 1
        b += 1
      }
      t += 1
    }
    var acc = 0L
    var b = 0
    while (b < nBits) {
      if (w(b) > 0) acc |= 1L << b
      b += 1
    }
    acc
  }

  /** Equals the `TextQueries.signatures` array: for each seed 0..n-1,
    * min over k-shingles (stride `stride`, positions 1, 1+stride, …
    * ≤ max(len−k+1, 1)) of md5("<seed>:" ++ shingle).
    */
  def minhashSig(text: UTF8String, k: Int, stride: Int,
      nSeeds: Int): ArrayData = {
    val md = MessageDigest.getInstance("MD5")
    val prefixes = Array.tabulate(nSeeds)(s => (s + ":").getBytes("UTF-8"))
    val best = new Array[String](nSeeds)
    val stop = math.max(text.numChars() - (k - 1), 1)
    var i = 1
    while (i <= stop) {
      val sh = text.substringSQL(i, k).getBytes
      var s = 0
      while (s < nSeeds) {
        val p = prefixes(s)
        val buf = new Array[Byte](p.length + sh.length)
        System.arraycopy(p, 0, buf, 0, p.length)
        System.arraycopy(sh, 0, buf, p.length, sh.length)
        val hx = md5hex(md, buf)
        if (best(s) == null || hx.compareTo(best(s)) < 0) best(s) = hx
        s += 1
      }
      i += stride
    }
    val out = new Array[Any](nSeeds)
    var s = 0
    while (s < nSeeds) {
      out(s) = UTF8String.fromString(best(s))
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Equals `TextOps.shingleSet(text, k, stride)`: distinct k-shingles
    * in first-occurrence order (what transform + array_distinct
    * produces).
    */
  def shingleSet(text: UTF8String, k: Int, stride: Int): ArrayData = {
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val stop = math.max(text.numChars() - (k - 1), 1)
    var i = 1
    while (i <= stop) {
      seen.add(text.substringSQL(i, k))
      i += stride
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) {
      out(j) = it.next()
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** Shared shape for the unary string-input signature expressions:
  * null-safe, codegen = one static call per row (whole-stage-friendly —
  * no interpreted expression tree, no per-element closures).
  */
trait TextHashExpr extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${other.sql}")
    }
  /** The generated-code call on input variable `c`. */
  protected def staticCall(c: String): String
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = ${staticCall(c)};")
}

case class SimhashF(child: Expression, nBits: Int) extends TextHashExpr {
  require(nBits >= 1 && nBits <= 60, s"nBits out of BIGINT-safe range: $nBits")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"
  override protected def nullSafeEval(input: Any): Any =
    TextHashOps.simhash(input.asInstanceOf[UTF8String], nBits)
  override protected def staticCall(c: String): String =
    s"graft.functions.TextHashOps$$.MODULE$$.simhash($c, $nBits)"
  override protected def withNewChildInternal(n: Expression): Expression =
    copy(child = n)
}

case class MinhashSigF(child: Expression, k: Int, stride: Int,
    nSeeds: Int) extends TextHashExpr {
  // Plan-time gate: SQL registration passes literal ints straight here,
  // and stride <= 0 would loop `i += stride` forever per row — a silent
  // executor hang rather than an error.
  require(k >= 1 && stride >= 1 && nSeeds >= 1,
    s"graft_minhash_sig: k=$k, stride=$stride, nSeeds=$nSeeds must all be >= 1")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"
  override protected def nullSafeEval(input: Any): Any =
    TextHashOps.minhashSig(input.asInstanceOf[UTF8String], k, stride, nSeeds)
  override protected def staticCall(c: String): String =
    s"graft.functions.TextHashOps$$.MODULE$$.minhashSig($c, $k, $stride, $nSeeds)"
  override protected def withNewChildInternal(n: Expression): Expression =
    copy(child = n)
}

case class ShingleSetF(child: Expression, k: Int, stride: Int)
    extends TextHashExpr {
  require(k >= 1 && stride >= 1,
    s"graft_shingle_set: k=$k, stride=$stride must both be >= 1")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingle_set"
  override protected def nullSafeEval(input: Any): Any =
    TextHashOps.shingleSet(input.asInstanceOf[UTF8String], k, stride)
  override protected def staticCall(c: String): String =
    s"graft.functions.TextHashOps$$.MODULE$$.shingleSet($c, $k, $stride)"
  override protected def withNewChildInternal(n: Expression): Expression =
    copy(child = n)
}

/** Column-level entry points. */
object TextHashF {
  import org.apache.spark.sql.GraftBridge

  def simhash(text: Column, nBits: Int): Column =
    GraftBridge.column(SimhashF(GraftBridge.expression(text), nBits))

  def minhashSig(text: Column, k: Int, stride: Int, nSeeds: Int): Column =
    GraftBridge.column(
      MinhashSigF(GraftBridge.expression(text), k, stride, nSeeds))

  def shingleSet(text: Column, k: Int, stride: Int): Column =
    GraftBridge.column(
      ShingleSetF(GraftBridge.expression(text), k, stride))
}
