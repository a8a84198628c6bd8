package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Fixed-width SimHash vote-vector aggregate —
  * `simhash_votes(h1, h2) -> array<bigint>[64]`, registered by
  * [[graft.GraftSparkExtensions]]. The two inputs are the 32-bit halves of
  * a token's md5 digest (hex digits 1-8 and 9-16, folded to BIGINT); bit
  * `b = 4*(d-1)+k` (bit `k` of hex digit `d`) votes +1/−1 per token, and
  * `votes(b)` accumulates the per-document sum — the signature bit is
  * `sign(votes(b))`, assembled by the caller.
  *
  * This replaces `dedup_simhash`'s 64 separate `sum(CASE WHEN
  * shiftright(h, s) & 1 ...)` aggregate columns — the engine's widest
  * hash-aggregate state (64 independent agg expressions evaluated per
  * row, 64 buffer slots plus null bits per group) — with ONE aggregate
  * whose update is a compiled 64-iteration shift/mask loop over a
  * `long[64]` buffer. Runs under `ObjectHashAggregateExec`; merge is
  * elementwise addition, so partial (map-side) aggregation is preserved.
  * Sessions should raise
  * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold` past its
  * 128-group default (the engine's entry points use 65536): the buffers
  * are small and fixed-size, so hashing tens of thousands of groups per
  * partition is cheap, while the default threshold degrades the partial
  * aggregation to sort-based almost immediately (measured 2× slower).
  * The vote sums are bit-for-bit identical to the column form (integer
  * arithmetic only), so the DuckDB oracle's digit-wise form is unchanged
  * — including the empty-group case: sum over zero rows is NULL, so a
  * global aggregate over an empty input evals NULL here too (slot 64 of
  * the buffer counts contributing rows to witness it).
  *
  * Null semantics match the column form exactly: in `sum(CASE WHEN
  * shiftright(h, s) & 1 = 1 THEN 1 ELSE -1 END)` a null hash half makes
  * the predicate null, which takes the ELSE branch — a −1 vote — so a
  * null half here votes −1 on each of its 32 bits (the other half still
  * votes normally). The md5-fold inputs are provably non-null in the
  * engine's own pipeline (md5 of a non-null token), but if that contract
  * ever weakens the two paths stay bit-identical instead of silently
  * diverging.
  */
case class SimhashVotes(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with BinaryLike[Expression] {

  override def prettyName: String = "simhash_votes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // nullable like the column form it mirrors: 64 sum(CASE ...) columns
  // over ZERO rows are 64 NULLs (sum's empty-group result), so a global
  // aggregate over an empty input must yield NULL here too — an all-zero
  // vote vector would assemble a spurious '0000000000000000' signature
  // where the composed path assembles none
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (bigint, bigint), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  // slot 64 counts contributing rows — the witness that distinguishes a
  // genuinely all-balanced vote vector from the zero-row case (which
  // must eval to NULL, matching sum's empty-group semantics)
  override def createAggregationBuffer(): Array[Long] = new Array[Long](65)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v1 = left.eval(input)
    val v2 = right.eval(input)
    var b = 0
    while (b < 64) {
      // bit b = 4*(d-1)+k: digit d sits at nibble 8-d of its 8-digit half
      val d = (b >> 2) + 1
      val k = b & 3
      // a null half votes −1 on its 32 bits, matching the CASE fallback
      // (null predicate -> ELSE -1); the other half is unaffected
      val bit =
        if (d <= 8) {
          if (v1 == null) 0L
          else (v1.asInstanceOf[Long] >>> (4 * (8 - d) + k)) & 1L
        } else {
          if (v2 == null) 0L
          else (v2.asInstanceOf[Long] >>> (4 * (16 - d) + k)) & 1L
        }
      buf(b) += (bit << 1) - 1L // 1 -> +1, 0 -> -1
      b += 1
    }
    buf(64) += 1L
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var b = 0
    while (b < 65) { buf(b) += other(b); b += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    if (buf(64) == 0L) null
    else new GenericArrayData(java.util.Arrays.copyOf(buf, 64))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(65 * 8)
    var b = 0
    while (b < 65) { bb.putLong(buf(b)); b += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](65)
    var b = 0
    while (b < 65) { buf(b) = bb.getLong(); b += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimhashVotes =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimhashVotes =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SimhashVotes =
    copy(left = newLeft, right = newRight)
}
