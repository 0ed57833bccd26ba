package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The broadcast-ready merge-table holder generated code references: a
  * packed (char, char) → ranks hash plus the priority-ordered pair/sym
  * arrays. One instance per plan, shipped once per executor inside the
  * serialized expression — the "broadcast priority-ordered merge table"
  * a production tokenizer model is. A duplicate pair keeps ALL its
  * ranks (ascending): the later duplicate is usually a chain no-op (the
  * pair was replaced away globally), but when the pair contains an
  * earlier merge's SYMBOL an intermediate merge can RE-CREATE it, and
  * the chain then applies the later rank — the kernel must see that
  * rank past its floor (BpeKernelSpec's random differential caught
  * exactly this). */
final class BpeTable(val pairs: Array[String], val syms: Array[String])
    extends Serializable {
  require(pairs.length == syms.length)
  pairs.foreach { p =>
    require(p.length == 2 && !p.contains(' '),
      s"merge pairs must be 2 symbols and never the separator: '$p'")
  }
  syms.foreach { s =>
    require(s.length == 1 && s != " ",
      s"merge symbols must be 1 char and never the separator: '$s'")
  }
  val rank = new java.util.HashMap[Integer, Array[Int]](pairs.length * 2)
  pairs.zipWithIndex.foreach { case (p, i) =>
    val k: Integer = (p.charAt(0) << 16) | p.charAt(1)
    val old = rank.get(k)
    rank.put(k, if (old == null) Array(i) else old :+ i)
  }
}

/** JVM-side encode kernel, separated so generated code can call it
  * through the Scala static forwarder.
  *
  * CONTRACT: bit-identical to the K-step replace chain
  * `merges.foldLeft(text){ (t, (pair, sym)) => replace(t, pair, sym) }`
  * (greedy left-to-right non-overlapping global replace per merge, in
  * priority order) — BpeKernelSpec differential-tests the equivalence,
  * including adversarial tables whose pairs contain earlier merges'
  * SYMBOLS. The difference is cost: the chain evaluates K replace
  * passes per document (fine at the demo's K=8, impossible as a plan at
  * a production table's 32k merges — 32k nested expressions), while the
  * kernel runs per TOKEN and only ever touches the merges whose pair is
  * PRESENT in that token:
  *
  *  - per token, scan its adjacent symbol pairs against the rank hash
  *    and pick the minimal applicable rank >= the floor (the rank after
  *    the last applied merge — chain passes already behind can never
  *    rerun, so a lower-ranked pair CREATED by a later merge is dead,
  *    exactly as in the chain);
  *  - apply that ONE merge as the same greedy global replace, raise the
  *    floor, rescan.
  *
  * Every skipped rank's pair is absent at its turn, i.e. the chain's
  * no-op pass — so applying only the ascending present-rank subsequence
  * reproduces the chain state exactly (induction on the floor). Each
  * application shortens the token, so a token of L symbols costs
  * O(L) applications of O(L) scans — INDEPENDENT of K, the property
  * that makes a 32k-merge table feasible.
  *
  * Tokens are processed independently: pairs and symbols never contain
  * the space separator (enforced by [[BpeTable]]), so no match can span
  * or manufacture a token boundary — the same argument that makes the
  * chain's text-level replace equal token-level replaces.
  */
object BpeEncodeUtil {
  def encode(s: UTF8String, t: BpeTable): UTF8String = {
    val str = s.toString
    val out = new java.lang.StringBuilder(str.length)
    var start = 0
    var i = 0
    val n = str.length
    while (i <= n) {
      if (i == n || str.charAt(i) == ' ') {
        if (start < i) encodeToken(out, str, start, i, t)
        if (i < n) out.append(' ')
        start = i + 1
      }
      i += 1
    }
    // avoid re-allocating when no merge applied anywhere
    if (out.length == n) s else UTF8String.fromString(out.toString)
  }

  private def encodeToken(
      out: java.lang.StringBuilder, str: String, from: Int, to: Int,
      t: BpeTable): Unit = {
    var cur: String = null
    var floor = 0
    var done = false
    while (!done) {
      val len = if (cur == null) to - from else cur.length
      def at(j: Int): Char = if (cur == null) str.charAt(from + j) else cur.charAt(j)
      var best = Int.MaxValue
      var j = 0
      while (j < len - 1) {
        val rs = t.rank.get((at(j) << 16) | at(j + 1))
        if (rs != null) {
          // first rank >= floor for this pair (ranks ascending;
          // duplicate counts are tiny, linear scan)
          var x = 0
          while (x < rs.length && rs(x) < floor) x += 1
          if (x < rs.length && rs(x) < best) best = rs(x)
        }
        j += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        if (cur == null) cur = str.substring(from, to)
        cur = cur.replace(t.pairs(best), t.syms(best))
        floor = best + 1
      }
    }
    if (cur == null) out.append(str, from, to) else out.append(cur)
  }
}

/** Priority-ordered BPE merge-table application as a native codegen
  * `Expression` — the production encode kernel behind q159 (the demo's
  * K=8 replace chain is the differential baseline; a realistic 32k-merge
  * tokenizer cannot be an expression chain). The (b)-tier
  * custom-expression path of the build plan, like [[NfcNormalize]]:
  * the merge table rides the expression as one broadcast reference
  * object, the kernel stays inside whole-stage codegen, and per-row
  * cost is independent of the table size (see [[BpeEncodeUtil]]).
  */
case class BpeEncode(child: Expression, pairs: Seq[String], syms: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bpe_encode requires a string input, got ${child.dataType.catalogString}")

  @transient private lazy val table = new BpeTable(pairs.toArray, syms.toArray)

  override def nullSafeEval(input: Any): Any =
    BpeEncodeUtil.encode(input.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table,
      classOf[BpeTable].getName)
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.BpeEncodeUtil.encode($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}
