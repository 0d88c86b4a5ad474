package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** SimHash as a custom typed aggregate (SURVEY.md §2.12 K4 family):
  * accumulates the 64 per-bit votes of the token-hash stream — +1 when a
  * token hash has bit b set, −1 otherwise — and finishes to the 64-bit
  * sign fingerprint. Commutative + associative, so Spark runs it
  * partial/final (map-side combine): each partition ships one 64-int
  * vote vector per document.
  *
  * This replaces the collect_list + higher-order-lambda formulation in
  * the dedup path, which (a) materialized every document's full token
  * hash list in one array cell — unbounded per-doc memory — and (b) ran
  * 64×|tokens| interpreted lambda steps per document. The aggregator's
  * buffer is a fixed 64-int array regardless of document length, and the
  * inner loop is a JIT-compiled JVM loop. Bit-identical to the HOF
  * spelling (pinned by DedupSpec).
  */
class SimHashAgg extends Aggregator[Long, Array[Int], Long] {

  def zero: Array[Int] = new Array[Int](64)

  def reduce(votes: Array[Int], h: Long): Array[Int] = {
    var b = 0
    while (b < 64) {
      if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
      b += 1
    }
    votes
  }

  def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < 64) { a(i) += b(i); i += 1 }
    a
  }

  def finish(votes: Array[Int]): Long = {
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) fp |= (1L << b)
      b += 1
    }
    fp
  }

  def bufferEncoder: Encoder[Array[Int]] = SimHashAgg.intArrayEnc
  def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

object SimHashAgg {
  private[functions] val intArrayEnc: Encoder[Array[Int]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Int]]()
}
