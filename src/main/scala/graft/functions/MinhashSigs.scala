package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused MinHash signature kernel: tokenize → 3-gram shingle → md5 →
  * 60-bit fold mod p → 8 affine-family minima, in ONE row-local pass.
  * Static-forwarder object so generated code calls
  * `graft.functions.MinhashSigsKernel.compute(...)` directly (the
  * [[ShingleMd5]] shape).
  *
  * Contract is bit-identical to the engine's HOF composition (see
  * `TextQueries.minhashSigs`):
  *
  * {{{ tk = filter(split(lower(text), '[^a-z0-9]+'), t -> t != '')
  *     hs = transform(sequence(1, greatest(size(tk)-2, 1), 2),
  *            i -> pmod(cast(conv(substring(md5(concat_ws(' ',
  *                   element_at(tk,i), element_at(tk,i+1), element_at(tk,i+2))),
  *                 1, 15), 16, 10) AS BIGINT), 1000000007L))
  *     sig_f = array_min(transform(hs, h -> (h*(2f+1) + f) % 1000000007L)) }}}
  *
  * replicated detail by detail:
  *  - tokens: maximal `[a-z0-9]` byte runs over the CollationSupport
  *    lowering (see [[SimhashTextKernel]] for why the byte scan equals
  *    the regex split);
  *  - shingle starts run i = 1, 3, 5, … up to `greatest(#tokens−2, 1)`
  *    — so a 0/1/2-token document still yields ONE shingle, built from
  *    whatever tokens exist: `concat_ws(' ', …)` skips the NULL
  *    `element_at` lookups past the end (empty doc → md5 of "");
  *  - the 15-hex-char prefix of the digest is 15 nibbles folded
  *    big-endian (60 bits, always non-negative), then mod p;
  *  - family f (0..7): min over shingles of `(h·(2f+1) + f) mod p`.
  */
object MinhashSigsKernel {

  final val P = 1000000007L
  final val Families = 8

  def compute(text: UTF8String, useICU: Boolean): ArrayData = {
    val bytes = TextKernel.lowered(text, useICU).getBytes
    // token spans: (start, end) byte offsets of each [a-z0-9] run
    val spans = TextKernel.tokenSpans(bytes)
    val (starts, ends, nTok) = (spans.starts, spans.ends, spans.n)
    val mins = new Array[Long](Families)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val md = TextKernel.md5()
    val lastStart = math.max(nTok - 2, 1) // 1-based shingle-start bound
    var s = 1
    while (s <= lastStart) {
      md.reset()
      // concat_ws(' ', tok_s, tok_s+1, tok_s+2): present tokens joined
      // by single spaces, absent (NULL) ones skipped entirely
      var wrote = false
      var t = s - 1
      val tEnd = math.min(s + 2, nTok)
      while (t < tEnd) {
        if (wrote) md.update(TextKernel.space, 0, 1)
        md.update(bytes, starts(t), ends(t) - starts(t))
        wrote = true
        t += 1
      }
      val dig = md.digest()
      // first 15 hex digits = 15 nibbles big-endian (shared fold)
      val v = TextKernel.foldNibbles(dig, 15)
      val h = v % P // v >= 0 (60 bits), so % == pmod
      var f = 0
      while (f < Families) {
        val a = (h * (2 * f + 1) + f) % P
        if (a < mins(f)) mins(f) = a
        f += 1
      }
      s += 2
    }
    new GenericArrayData(mins)
  }
}

/** Native fused MinHash signatures — `minhash_sigs(text)`, registered by
  * [[graft.GraftSparkExtensions]]: array<bigint>[8], element f being the
  * family-f MinHash minimum. One codegen'd call per document replaces
  * the interpreted HOF pipeline (a transform lambda per shingle building
  * a concat string, an md5 hex round-trip, and 8 more array transforms)
  * that fed `TextQueries.minhashSigs` — the signature table behind the
  * whole LSH dedup family. Row-local: computing signatures where the
  * text lives keeps the corpus shuffle-free up to the band-key join.
  */
case class MinhashSigs(child: Expression,
    useICU: Boolean = TextKernel.sessionUseICU) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sigs"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string input, got ${other.catalogString}")
  }

  // useICU: case-class parameter defaulted at construction — see
  // TextKernel.sessionUseICU for the equality/copy() rationale

  override protected def nullSafeEval(input: Any): Any =
    MinhashSigsKernel.compute(input.asInstanceOf[UTF8String], useICU)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinhashSigsKernel.compute($c, $useICU)")

  override protected def withNewChildInternal(newChild: Expression): MinhashSigs =
    copy(child = newChild)
}
