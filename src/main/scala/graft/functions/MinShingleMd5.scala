package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared fused kernel for the winnowing fingerprint: the min md5 over
  * fixed-length shingles of the lowercased text. Top-level object with no
  * companion class so the compiler emits a static forwarder — generated
  * whole-stage code calls `graft.functions.ShingleMd5.compute(...)`
  * directly (the same shape as Spark's own `Md5`, which calls
  * `DigestUtils.md5Hex` from codegen).
  */
object ShingleMd5 {

  /** Numeric/text contract is IDENTICAL to the built-in composition
    *
    * {{{ array_min(transform(sequence(1, greatest(numChars(text) - (L-1), 1), S),
    *               i -> md5(substring(lower(text), i, L)))) }}}
    *
    * replicated detail by detail:
    *  - the shingle-start bound uses the RAW text's character count
    *    (lowercasing is not length-preserving in Unicode: İ → i̇), while
    *    the shingles slice the LOWERED text — exactly what the hoisted
    *    HOF form computes;
    *  - `substring(lt, i, L)` counts code points and clamps at the end
    *    (a start past the lowered length yields the empty string, md5'd
    *    like any other shingle);
    *  - md5 output is lowercase hex, and `array_min`'s string ordering
    *    over lowercase hex equals unsigned byte order over the raw
    *    digests — so the loop compares 16-byte digests and hex-encodes
    *    only the winner.
    */
  def compute(text: UTF8String, shingleLen: Int, stride: Int, useICU: Boolean): UTF8String = {
    val rawChars = text.numChars()
    val lt = TextKernel.lowered(text, useICU)
    val bytes = lt.getBytes
    // byte offset of each code point of lt (offs(numChars) = total bytes):
    // O(n) once, so every shingle slice is O(shingleLen) — never the
    // O(n) rescan substring() pays per call
    val ltChars = lt.numChars()
    val offs = new Array[Int](ltChars + 1)
    var k = 0
    var bo = 0
    while (k < ltChars) {
      offs(k) = bo
      bo += UTF8String.numBytesForFirstByte(bytes(bo))
      k += 1
    }
    offs(ltChars) = bytes.length
    val last = math.max(rawChars - (shingleLen - 1), 1)
    val md = TextKernel.md5()
    var best: Array[Byte] = null
    var i = 1
    while (i <= last) {
      val s0 = offs(math.min(i - 1, ltChars))
      val s1 = offs(math.min(i - 1 + shingleLen, ltChars))
      md.reset()
      md.update(bytes, s0, s1 - s0)
      val dig = md.digest()
      if (best == null || unsignedLess(dig, best)) best = dig
      i += stride
    }
    UTF8String.fromBytes(TextKernel.hex32(best))
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val ai = a(i) & 0xff
      val bi = b(i) & 0xff
      if (ai != bi) return ai < bi
      i += 1
    }
    false
  }
}

/** Native fused shingle fingerprint — `min_shingle_md5(text[, len, stride])`,
  * registered by [[graft.GraftSparkExtensions]]. One codegen'd call per row
  * replaces the interpreted HOF pipeline (transform + per-shingle lambda
  * dispatch + an intermediate md5-string array + array_min), which was the
  * engine's #1 bench line: higher-order functions never enter whole-stage
  * codegen and re-pay expression-tree dispatch per shingle. Used by
  * `text_fingerprint` and the incremental-dedup index
  * ([[graft.ops.TextQueries.fingerprintFrame]]); equivalence against the
  * HOF composition is property-tested in ExtensionsSpec.
  */
case class MinShingleMd5(child: Expression, shingleLen: Int, stride: Int,
    useICU: Boolean = TextKernel.sessionUseICU)
    extends UnaryExpression {

  require(shingleLen >= 1, "shingle length must be >= 1")
  require(stride >= 1, "stride must be >= 1")

  override def dataType: DataType = StringType
  override def prettyName: String = "min_shingle_md5"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string input, got ${other.catalogString}")
  }

  // useICU is a case-class PARAMETER defaulted at construction (analysis
  // time, on the driver — exactly like the built-in Lower), never a
  // constructor-body val: see TextKernel.sessionUseICU for why it must
  // ride expression equality and survive copy() unchanged

  override protected def nullSafeEval(input: Any): Any =
    ShingleMd5.compute(input.asInstanceOf[UTF8String], shingleLen, stride, useICU)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleMd5.compute($c, $shingleLen, $stride, $useICU)")

  override protected def withNewChildInternal(newChild: Expression): MinShingleMd5 =
    copy(child = newChild)
}
