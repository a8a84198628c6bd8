package graft.functions

import java.security.MessageDigest

import org.apache.spark.unsafe.types.UTF8String

/** Shared primitives of the fused text-hash kernels ([[ShingleMd5]],
  * [[ShingleMd5sKernel]], [[MinhashSigsKernel]], [[SimhashTextKernel]]).
  * ONE definition of the tokenizer, the lowering, the thread-local MD5
  * and the hex alphabet: the four kernels must stay digest-compatible
  * with each other and with the built-in compositions they replace, so
  * a tokenization or lowering fix must land everywhere at once — not in
  * four drifting copies.
  */
object TextKernel {

  private val mdLocal: ThreadLocal[MessageDigest] =
    new ThreadLocal[MessageDigest] {
      override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
    }

  /** Per-thread reusable MD5 instance (callers `reset()` before use). */
  def md5(): MessageDigest = mdLocal.get()

  /** Lowercase hex alphabet — the encoding `md5()`'s hex form uses. */
  val hexDigits: Array[Byte] = "0123456789abcdef".getBytes

  /** Single-space separator used when shingling token runs. */
  val space: Array[Byte] = Array[Byte](' ')

  /** Post-lowering token alphabet: [a-z0-9] byte runs are tokens. */
  @inline def isAlnum(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')

  /** The exact lowering the built-in `lower()` performs under the
    * default UTF8_BINARY collation (including its ICU toggle) — NOT
    * `UTF8String.toLowerCase`, which diverges on context-sensitive
    * mappings (Greek capital sigma in word-final position lowers to ς
    * under ICU, σ otherwise).
    */
  def lowered(text: UTF8String, useICU: Boolean): UTF8String =
    if (useICU) org.apache.spark.sql.catalyst.util.CollationSupport.Lower.execBinaryICU(text)
    else org.apache.spark.sql.catalyst.util.CollationSupport.Lower.execBinary(text)

  /** The session's ICU lowering toggle, read ONCE as a default for the
    * text natives' `useICU` case-class PARAMETER (never a constructor-
    * body val): as a parameter it participates in equals/semanticEquals
    * — two expressions built under opposite toggles must never be
    * substituted for each other by plan caching or exchange reuse — and
    * `copy()`/`withNewChildInternal` carries the CAPTURED value instead
    * of re-reading live conf mid-transform (an AQE re-optimization after
    * a conf change would otherwise flip the lowering mid-query). */
  def sessionUseICU: Boolean = org.apache.spark.sql.internal.SQLConf.get
    .getConf(org.apache.spark.sql.internal.SQLConf.ICU_CASE_MAPPINGS_ENABLED)

  /** Byte-offset spans of each [a-z0-9] token run in `bytes`:
    * `starts(i) until ends(i)` for `i < n`. Arrays may be longer than
    * `n` (grow-by-doubling) — read only the first `n` entries.
    */
  final class TokenSpans(val starts: Array[Int], val ends: Array[Int], val n: Int)

  def tokenSpans(bytes: Array[Byte]): TokenSpans = {
    val len = bytes.length
    var nTok = 0
    var cap = 16
    var starts = new Array[Int](cap)
    var ends = new Array[Int](cap)
    var i = 0
    while (i < len) {
      if (isAlnum(bytes(i))) {
        var j = i + 1
        while (j < len && isAlnum(bytes(j))) j += 1
        if (nTok == cap) {
          cap *= 2
          starts = java.util.Arrays.copyOf(starts, cap)
          ends = java.util.Arrays.copyOf(ends, cap)
        }
        starts(nTok) = i; ends(nTok) = j; nTok += 1
        i = j
      } else i += 1
    }
    new TokenSpans(starts, ends, nTok)
  }

  /** The first `n` hex digits of a digest folded big-endian into a
    * non-negative long — the numeric form of
    * `cast(conv(substring(md5(x), 1, n), 16, 10) AS BIGINT)` (n <= 15,
    * so the value fits 60 bits and `%` equals `pmod`). Whole bytes
    * first, then the high nibble of the next byte for odd n. One
    * definition for the MinHash (15-nibble) and hashing-vectorizer
    * (7-nibble) kernels — the shift arithmetic is off-by-one-prone
    * enough that two hand-rolled copies WILL drift.
    */
  def foldNibbles(dig: Array[Byte], n: Int): Long = {
    var v = 0L
    var b = 0
    while (b < n / 2) { v = (v << 8) | (dig(b) & 0xffL); b += 1 }
    if ((n & 1) == 1) v = (v << 4) | ((dig(n / 2) >> 4) & 0xfL)
    v
  }

  /** 32-char lowercase hex of a 16-byte digest — `md5()`'s text form. */
  def hex32(dig: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](32)
    var j = 0
    while (j < 16) {
      out(2 * j) = hexDigits((dig(j) >> 4) & 0xf)
      out(2 * j + 1) = hexDigits(dig(j) & 0xf)
      j += 1
    }
    out
  }
}
