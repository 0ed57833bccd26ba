package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** JVM-side kernel for [[WinnowFps]]. One call per document: hash every
  * k-char gram (60-bit md5 prefix, byte-identical to
  * `conv(substring(md5(gram), 1, 15), 16, 10)`), slide the w-gram
  * window taking minima, and return the DISTINCT selected fingerprints.
  * Thread-reused digest; ASCII fast path hashes grams straight out of
  * the UTF8String bytes. */
object WinnowFpsUtil {
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 15 hex chars of the digest as a non-negative long: the
    * big-endian first 8 bytes shifted down 4 bits. */
  private def digest60(d: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  def fingerprints(s: UTF8String, k: Int, w: Int): GenericArrayData = {
    val md = md5.get()
    val ascii = s.numBytes == s.numChars
    val bytes = if (ascii) s.getBytes else null
    // CODE POINTS, not UTF-16 units: Spark's substr/length and DuckDB's
    // SUBSTR both count code points, so supplementary-plane chars
    // (emoji) are one position — String.substring would count them as
    // two and shear every window after the first astral char
    val cps = if (ascii) null else s.toString.codePoints().toArray
    val nChars = if (ascii) bytes.length else cps.length
    val n = nChars - k + 1 // gram count
    // Inputs shorter than k code points have no k-gram: empty set, not
    // NegativeArraySizeException — the expression is public via
    // TextFunctions.winnowFps, so it cannot rely on callers pre-filtering
    if (n <= 0) return new GenericArrayData(Array.empty[Any])
    val h = new Array[Long](n)
    var i = 0
    while (i < n) {
      md.reset()
      if (ascii) md.update(bytes, i, k)
      else md.update(new String(cps, i, k)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      h(i) = digest60(md.digest())
      i += 1
    }
    val out = new java.util.LinkedHashSet[Any]()
    val starts = math.max(n - w + 1, 1)
    var j = 0
    while (j < starts) {
      var m = h(j)
      var t = j + 1
      val end = math.min(j + w, n)
      while (t < end) { if (h(t) < m) m = h(t); t += 1 }
      out.add(m)
      j += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** Winnowing fingerprint selection as a native `Expression` — the
  * per-document inner loop of the q63 dedup tier
  * (Schleimer/Wilkerson/Aiken SIGMOD'03). The composed formulation
  * (explode every gram position → codegen md5 → window min over a
  * doc-partitioned sort → distinct) is plan-shaped correctly but
  * materializes a corpus×doc-length gram stream through a sort and two
  * aggregates; ONE call per document runs the same hash + sliding-min
  * + distinct in a JVM kernel and emits only the selected fingerprint
  * set (~2/(w+1) of the grams). Same (b)-tier custom-expression path
  * as [[CdcBoundaries]]; a differential spec pins kernel ≡ composed.
  */
case class WinnowFps(child: Expression, k: Int, w: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && k >= 1 && w >= 1)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"winnow_fps requires a string input and k, w >= 1, got " +
        s"${child.dataType.catalogString}, k=$k, w=$w")

  override def nullSafeEval(input: Any): Any =
    WinnowFpsUtil.fingerprints(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.WinnowFpsUtil.fingerprints($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFps =
    copy(child = newChild)
}
