package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator
import scala.util.hashing.byteswap64

/** SURVEY.md §2.12 K4 — a MinHash sketch as a custom typed aggregate:
  * merges element hashes into an n-position signature (position i keeps
  * the min of the i-seeded rehash). Commutative + associative, so Spark
  * runs it partial/final (map-side combine) like any builtin aggregate —
  * the property that makes sketching scale: each partition ships one
  * n-long array, not its rows.
  *
  * Same estimator family as DedupOps.minhashSig (HOF form); the two are
  * cross-checked in MinHashAggSpec. Use the aggregator form when the
  * input is already exploded (e.g. streaming token feeds), the HOF form
  * when the document is a single array cell.
  */
class MinHashAgg(n: Int) extends Aggregator[Long, Array[Long], Array[Long]] {

  /** Position-seeded rehash of an element hash (cheap xorshift-multiply
    * family — deterministic, no RNG state).
    */
  @inline private def rehash(seed: Int, x: Long): Long =
    byteswap64(x ^ (seed.toLong * 0x9e3779b97f4a7c15L))

  def zero: Array[Long] = Array.fill(n)(Long.MaxValue)

  def reduce(buf: Array[Long], x: Long): Array[Long] = {
    var i = 0
    while (i < n) {
      val h = rehash(i, x)
      if (h < buf(i)) buf(i) = h
      i += 1
    }
    buf
  }

  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < n) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  def finish(buf: Array[Long]): Array[Long] = buf

  def bufferEncoder: Encoder[Array[Long]] = MinHashAgg.longArrayEnc
  def outputEncoder: Encoder[Array[Long]] = MinHashAgg.longArrayEnc
}

object MinHashAgg {
  /** Estimated Jaccard between two signatures = agreeing fraction. */
  def estimate(a: Array[Long], b: Array[Long]): Double =
    a.zip(b).count { case (x, y) => x == y }.toDouble / a.length

  private[functions] val longArrayEnc: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
