package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregate — the `Aggregator` tier of the operator
  * preference order (SURVEY.md §4 names a TypedImperativeAggregate for
  * sketch-style state as the one candidate custom aggregate): element-wise
  * mean of `Array[Float]` vectors.
  *
  * The buffer is a running (sum-per-dimension, count) pair — constant
  * size per partition and MERGEABLE, so Spark computes partial buffers
  * map-side and folds them on the reduce side: the same dataflow shape a
  * minhash/HLL sketch aggregate uses, with no per-row shuffle of vector
  * elements (contrast the posexplode formulation in
  * `sim_label_centroids`, which shuffles (label, dim, value) rows).
  */
object VectorMean extends Aggregator[Array[Float], (Array[Double], Long), Array[Double]] {

  override def zero: (Array[Double], Long) = (Array.emptyDoubleArray, 0L)

  // Ragged inputs fail LOUDLY: the buffer takes the first vector's
  // dimension, and partition/merge order is nondeterministic, so
  // silently truncating a mismatched vector would make both the output
  // dimension and the per-dimension means vary run to run. A mean over
  // mixed-dimension vectors has no defined answer — reject it.
  // "Uninitialized" is count == 0, NOT an empty sums array: a
  // zero-LENGTH input vector is a legitimate 0-dim vector whose buffer
  // is (empty sums, n>0), and conflating it with the zero buffer would
  // let an empty-first partition skip the ragged check (silent
  // order-dependent skew) while an empty-last one aborted.
  override def reduce(b: (Array[Double], Long), v: Array[Float]): (Array[Double], Long) = {
    if (v == null) return b
    val sums = if (b._2 == 0) new Array[Double](v.length) else b._1
    require(v.length == sums.length,
      s"vector_mean over ragged dimensions: ${v.length} vs ${sums.length}")
    var i = 0
    while (i < v.length) { sums(i) += v(i); i += 1 }
    (sums, b._2 + 1)
  }

  override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
    if (a._2 == 0) return b
    if (b._2 == 0) return a
    require(a._1.length == b._1.length,
      s"vector_mean over ragged dimensions: ${a._1.length} vs ${b._1.length}")
    val out = a._1.clone()
    var i = 0
    while (i < out.length) { out(i) += b._1(i); i += 1 }
    (out, a._2 + b._2)
  }

  // NULL, not an empty array, for a group with NO non-null vectors: the
  // posexplode centroid formulation this aggregate is the mergeable twin
  // of produces no centroid for such a group at all, and an empty array
  // here would be indistinguishable from the legitimate mean of
  // zero-length vectors (count > 0, empty sums) — a reader could not
  // tell "no data" from "0-dim data". Callers filter nulls like any
  // other aggregate-over-nothing.
  override def finish(r: (Array[Double], Long)): Array[Double] =
    if (r._2 == 0) null else r._1.map(_ / r._2)

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Double], Long)]()

  override def outputEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}
