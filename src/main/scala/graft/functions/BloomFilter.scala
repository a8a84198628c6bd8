package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Shared probe/update kernel for the engine's Bloom filter — static
  * methods so generated code can call them without boxing. Double
  * hashing (Kirsch–Mitzenmacher): bit i = (h1 + i*h2) mod m, with h1/h2
  * derived from one splitmix64 finalizer pass — the standard
  * construction (same family Spark's own runtime-filter bloom and
  * Guava's BloomFilter use), k independent-enough probes from two
  * hashes.
  */
object BloomProbe {
  /** splitmix64 finalizer — full-avalanche 64-bit mix. */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def set(bits: Array[Long], key: Long, numHashes: Int): Unit = {
    val m = bits.length.toLong * 64L
    val h1 = mix64(key)
    val h2 = mix64(h1) | 1L
    var i = 0
    while (i < numHashes) {
      val idx = java.lang.Long.remainderUnsigned(h1 + i * h2, m)
      bits((idx >>> 6).toInt) |= (1L << (idx & 63L).toInt)
      i += 1
    }
  }

  def contains(bits: Array[Long], key: Long, numHashes: Int): Boolean = {
    val m = bits.length.toLong * 64L
    val h1 = mix64(key)
    val h2 = mix64(h1) | 1L
    var i = 0
    while (i < numHashes) {
      val idx = java.lang.Long.remainderUnsigned(h1 + i * h2, m)
      if ((bits((idx >>> 6).toInt) & (1L << (idx & 63L).toInt)) == 0L) return false
      i += 1
    }
    true
  }

  /** Blob layout: [numHashes: int32][bit words: int64...]. */
  def serialize(numHashes: Int, bits: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + bits.length * 8)
    bb.putInt(numHashes)
    var i = 0
    while (i < bits.length) { bb.putLong(bits(i)); i += 1 }
    bb.array()
  }

  def deserializeHashes(bytes: Array[Byte]): Int =
    ByteBuffer.wrap(bytes).getInt()

  def deserializeBits(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    bb.getInt() // skip numHashes header
    val bits = new Array[Long]((bytes.length - 4) / 8)
    var i = 0
    while (i < bits.length) { bits(i) = bb.getLong(); i += 1 }
    bits
  }
}

/** `bloom_bits_agg(key[, numBits, numHashes]) -> binary` — build one
  * Bloom filter blob over a BIGINT key column, registered by
  * [[graft.GraftSparkExtensions]]. The aggregate is MERGEABLE (merge =
  * bitwise OR), so it runs as a partial map-side aggregate per
  * partition followed by one tiny final merge: at 100 TB the build side
  * never shuffles its rows — only fixed-size bit blocks (numBits/8
  * bytes each) travel, whatever the build-side row count. The blob then
  * BROADCASTS to prefilter a fact scan via [[BloomMightContain]] before
  * any join shuffle — the runtime-filter pattern, made an explicit
  * operator (sizing rule: numBits ≈ 10× expected distinct keys for
  * ~1% false positives at numHashes=5; false positives only ever cost
  * a wasted row through the residual exact join, never a wrong result).
  *
  * Null keys are skipped (a Bloom of a key set; SQL semi-join semantics
  * never match NULL anyway). Empty input → all-zero bits → probe
  * rejects everything, the correct semi-join-with-empty-build result.
  */
case class BloomBitsAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(numBits >= 64 && numBits % 64 == 0,
    s"bloom_bits_agg numBits must be a positive multiple of 64, got $numBits")
  require(numHashes >= 1 && numHashes <= 16,
    s"bloom_bits_agg numHashes must be in [1,16], got $numHashes")

  override def prettyName: String = "bloom_bits_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a BIGINT key, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomProbe.set(buf, v.asInstanceOf[Long], numHashes)
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = BloomProbe.serialize(numHashes, buf)

  override def serialize(buf: Array[Long]): Array[Byte] =
    BloomProbe.serialize(numHashes, buf)

  override def deserialize(bytes: Array[Byte]): Array[Long] =
    BloomProbe.deserializeBits(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBitsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBitsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomBitsAgg =
    copy(child = newChild)
}

/** `bloom_might_contain(blob, key) -> boolean` — probe a
  * [[BloomBitsAgg]] blob. The blob argument must be FOLDABLE (a literal
  * carrying the collected ~numBits/8-byte filter): it deserializes ONCE
  * per task into a plain `long[]` referenced from generated code, and
  * the per-row cost is numHashes word probes inside whole-stage codegen
  * — cheap enough to run on every row of a 100 TB fact scan before the
  * shuffle it exists to shrink. No false negatives (every inserted key
  * probes true — property-tested); false positives fall out in the
  * residual exact join.
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "bloom_might_contain"
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (!left.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a foldable (literal) bloom blob — collect the " +
          "aggregated filter and pass it as a literal")
    else if (left.dataType != BinaryType || right.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (binary, bigint), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
    else TypeCheckResult.TypeCheckSuccess

  // deserialized once per task (the case class ships serialized to
  // executors; lazy vals re-materialize on first probe there)
  @transient private lazy val blob: Array[Byte] =
    left.eval(null).asInstanceOf[Array[Byte]]
  // null-tolerant: a foldable-but-NULL blob (CAST(NULL AS BINARY)) is a
  // legal input whose answer is NULL. nullSafeCodeGen never EXECUTES the
  // probe for a null literal, but it does BUILD the code string, which
  // forces these lazy vals — deserializing null here would NPE at
  // codegen time, before a single row is processed.
  // Structural gate BEFORE any probe: a malformed blob must fail with
  // an error that names the function, not surface as a
  // BufferUnderflow/ArithmeticException from inside codegen — and a
  // garbage blob must never probe true for every key (numHashes <= 0
  // would make the contains loop vacuous). bloom_bits_agg's own output
  // always passes (numBits >= 64 => >= 12 bytes, word-aligned, k in
  // [1,16]); anything else was not built by it.
  @transient private lazy val bits: Array[Long] =
    if (blob == null) null
    else {
      if (blob.length < 12 || (blob.length - 4) % 8 != 0)
        throw new IllegalArgumentException(
          s"$prettyName: malformed bloom blob (${blob.length} bytes; " +
            "expected a 4-byte header plus >= 1 aligned 8-byte bit word) — " +
            "build it with bloom_bits_agg")
      BloomProbe.deserializeBits(blob)
    }
  @transient private lazy val k: Int =
    if (blob == null) 0
    else {
      val h = BloomProbe.deserializeHashes(blob)
      if (h < 1 || h > 16)
        throw new IllegalArgumentException(
          s"$prettyName: bloom blob declares numHashes $h outside [1,16] — " +
            "not a bloom_bits_agg blob")
      h
    }

  override protected def nullSafeEval(l: Any, r: Any): Any =
    BloomProbe.contains(bits, r.asInstanceOf[Long], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (_, keyVal) => {
      val bitsRef = ctx.addReferenceObj("bloomBits", bits, "long[]")
      s"${ev.value} = graft.functions.BloomProbe.contains($bitsRef, $keyVal, $k);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}
