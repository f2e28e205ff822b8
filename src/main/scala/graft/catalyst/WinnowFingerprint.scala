package graft.catalyst

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowing fingerprint (MOSS scheme, Schleimer et al. SIGMOD'03 —
  * public algorithm): md5 every 8-char k-gram, take the minimum hash of each
  * 4-hash window, emit the sorted distinct minima joined with '|'.
  *
  * Why a custom Expression (preference order (b) in the build brief): the
  * composed higher-order-function form must re-evaluate the k-gram hash
  * array INSIDE the per-window lambda — Catalyst cannot hoist a common
  * subexpression out of a `LambdaFunction`, so the built-in form costs
  * O(len·w) md5 calls per document (O(len²)-ish for small w is the visible
  * symptom; the real issue is recomputing a len-sized array len times).
  * This expression hashes each k-gram exactly ONCE and slides the window —
  * O(len) md5 calls — while staying inside whole-stage codegen via a static
  * call, like [[TokenizeStem]]. Semantics are identical to the composed
  * form and to the DuckDB oracle (verified by the unchanged
  * `dd_winnow_fingerprint` hash check).
  */
case class WinnowFingerprint(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"winnow_fingerprint expects STRING, got ${child.dataType.sql}")

  override def dataType: DataType = StringType

  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    WinnowFingerprintUtil.eval(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.catalyst.WinnowFingerprintUtil.eval($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : WinnowFingerprint = copy(child = newChild)

  override def prettyName: String = "winnow_fingerprint"
}

object WinnowFingerprintUtil {
  private val K = 8 // k-gram length in characters
  private val W = 4 // winnow window in hashes
  private val HexDigits = "0123456789abcdef".toCharArray

  // One digest per thread, reused across the O(len) k-grams of every doc —
  // getInstance per k-gram costs a provider lookup + allocation that
  // partially offsets the hash-once win this expression exists for.
  private val mdLocal: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() =>
      java.security.MessageDigest.getInstance("MD5"))

  private def md5Hex(s: String): String = {
    val md = mdLocal.get()
    md.reset()
    val d = md.digest(s.getBytes(UTF_8))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexDigits((d(i) >> 4) & 0xf)
      out(2 * i + 1) = HexDigits(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Mirrors the composed form exactly: n = max(len-7, 1) k-gram hashes
    * (substring clamps at the end like SQL `substr`), m = max(n-3, 1)
    * windows, each contributing min(hs[j..j+3]) (clamped slice), then
    * sorted distinct minima joined with '|'. Lengths and substrings count
    * CODE POINTS, matching SQL `length`/`substr` (a UTF-16 `String.length`
    * would drift on supplementary characters).
    */
  def eval(input: UTF8String): UTF8String = {
    val text = input.toString
    val cpLen = text.codePointCount(0, text.length)
    val starts = new Array[Int](cpLen + 1) // UTF-16 offset of code point i
    var cp = 0
    var off = 0
    while (cp < cpLen) {
      starts(cp) = off
      off = text.offsetByCodePoints(off, 1)
      cp += 1
    }
    starts(cpLen) = text.length
    val n = math.max(cpLen - (K - 1), 1)
    val hs = new Array[String](n)
    var i = 0
    while (i < n) { // each k-gram hashed exactly once
      hs(i) = md5Hex(
        text.substring(starts(i), starts(math.min(i + K, cpLen))))
      i += 1
    }
    val m = math.max(n - (W - 1), 1)
    val mins = new java.util.TreeSet[String]()
    var j = 0
    while (j < m) {
      var best = hs(j)
      var t = j + 1
      val end = math.min(j + W, n)
      while (t < end) {
        if (hs(t).compareTo(best) < 0) best = hs(t)
        t += 1
      }
      mins.add(best)
      j += 1
    }
    val sb = new java.lang.StringBuilder(mins.size * 33)
    val it = mins.iterator()
    while (it.hasNext) {
      if (sb.length > 0) sb.append('|')
      sb.append(it.next())
    }
    UTF8String.fromString(sb.toString)
  }
}

object WinnowFingerprint {
  /** Column-API form; requires [[register]] once per session. */
  def winnow(c: Column): Column =
    org.apache.spark.sql.functions.call_function("winnow_fingerprint", c)

  /** Register `winnow_fingerprint` for spark.sql usage. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "winnow_fingerprint", exprs => WinnowFingerprint(exprs.head),
      "scala_udf")
}
