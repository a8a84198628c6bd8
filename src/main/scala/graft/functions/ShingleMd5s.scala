package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused 8-token-shingle digest kernel: tokenize → stride-1 8-token
  * shingles → md5 hex, in ONE row-local pass. Static-forwarder object so
  * generated code calls `graft.functions.ShingleMd5sKernel.compute(...)`
  * directly (the [[MinhashSigsKernel]] shape).
  *
  * Contract is bit-identical to the engine's HOF composition (the
  * `text_boilerplate_ngrams` pass-1 pipeline):
  *
  * {{{ tk = filter(split(lower(text), '[^a-z0-9]+'), t -> t != '')
  *     CASE WHEN size(tk) >= 8
  *       THEN transform(sequence(1, size(tk) - 7),
  *              i -> md5(array_join(slice(tk, i, 8), ' ')))
  *       ELSE array() END }}}
  *
  * replicated detail by detail:
  *  - tokens: maximal `[a-z0-9]` byte runs over the CollationSupport
  *    lowering (see [[SimhashTextKernel]] for why the byte scan equals
  *    the regex split);
  *  - shingle i (1-based) joins tokens i..i+7 with single spaces — all
  *    8 always present because i ≤ #tokens − 7; fewer than 8 tokens →
  *    EMPTY array (unlike the minhash kernel, which pads short docs);
  *  - digest: lowercase 32-hex-char md5 of the joined UTF-8 bytes,
  *    byte-identical to `md5()` in Spark and DuckDB.
  */
object ShingleMd5sKernel {

  final val ShingleTokens = 8

  def compute(text: UTF8String, useICU: Boolean): ArrayData = {
    val bytes = TextKernel.lowered(text, useICU).getBytes
    val spans = TextKernel.tokenSpans(bytes)
    val (starts, ends, nTok) = (spans.starts, spans.ends, spans.n)
    val nShingles = nTok - ShingleTokens + 1
    if (nShingles <= 0) return new GenericArrayData(Array.empty[Any])
    val md = TextKernel.md5()
    val out = new Array[Any](nShingles)
    var s = 0
    while (s < nShingles) {
      md.reset()
      var t = s
      val tEnd = s + ShingleTokens
      while (t < tEnd) {
        if (t > s) md.update(TextKernel.space, 0, 1)
        md.update(bytes, starts(t), ends(t) - starts(t))
        t += 1
      }
      out(s) = UTF8String.fromBytes(TextKernel.hex32(md.digest()))
      s += 1
    }
    new GenericArrayData(out)
  }
}

/** Native fused shingle digests — `shingle_md5s(text)`, registered by
  * [[graft.GraftSparkExtensions]]: array&lt;string&gt; of the lowercase md5
  * hex of every 8-token shingle (stride 1). One codegen'd call per
  * document replaces the interpreted HOF pipeline (a transform lambda
  * per shingle materializing the joined string, then md5) that fed
  * `text_boilerplate_ngrams`' digest pass. Row-local: digests are
  * computed where the text lives, so the mining shuffle carries only
  * digest-width rows.
  */
case class ShingleMd5s(child: Expression,
    useICU: Boolean = TextKernel.sessionUseICU) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingle_md5s"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string input, got ${other.catalogString}")
  }

  // useICU: case-class parameter defaulted at construction — see
  // TextKernel.sessionUseICU for the equality/copy() rationale

  override protected def nullSafeEval(input: Any): Any =
    ShingleMd5sKernel.compute(input.asInstanceOf[UTF8String], useICU)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleMd5sKernel.compute($c, $useICU)")

  override protected def withNewChildInternal(newChild: Expression): ShingleMd5s =
    copy(child = newChild)
}
