package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Custom typed aggregation (SURVEY §2.5/§2.11): the one place the
  * built-in aggregate set genuinely runs out — element-wise vector
  * reductions over embedding columns.
  *
  * Implemented as an `Aggregator[IN, BUF, OUT]`: partial aggregation
  * (map-side combine) comes for free — each partition reduces to ONE
  * (sums, count) buffer of vector width, and only buffers cross the
  * shuffle. At 100 TB that's the difference between shuffling every
  * embedding and shuffling |groups|·|partitions| buffers.
  */
object VectorAggregates {

  final case class VecBuf(sums: Array[Double], n: Long)

  /** Element-wise mean (centroid) of `Array[Float]` embeddings.
    * Null/empty inputs are skipped; the first non-empty vector fixes
    * the dimensionality.
    */
  final class CentroidAggregator extends Aggregator[Seq[Float], VecBuf, Seq[Double]] {
    override def zero: VecBuf = VecBuf(Array.empty, 0L)

    override def reduce(b: VecBuf, a: Seq[Float]): VecBuf =
      if (a == null || a.isEmpty) b
      else if (b.n == 0L) VecBuf(a.map(_.toDouble).toArray, 1L)
      else {
        var i = 0
        while (i < b.sums.length) { b.sums(i) += a(i); i += 1 }
        VecBuf(b.sums, b.n + 1)
      }

    override def merge(x: VecBuf, y: VecBuf): VecBuf =
      if (x.n == 0L) y
      else if (y.n == 0L) x
      else {
        var i = 0
        while (i < x.sums.length) { x.sums(i) += y.sums(i); i += 1 }
        VecBuf(x.sums, x.n + y.n)
      }

    override def finish(r: VecBuf): Seq[Double] =
      if (r.n == 0L) Seq.empty else r.sums.map(_ / r.n).toSeq

    override def bufferEncoder: Encoder[VecBuf] = Encoders.product[VecBuf]
    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.AgnosticEncoders.IterableEncoder(
        scala.reflect.classTag[Seq[Double]],
        org.apache.spark.sql.catalyst.encoders.AgnosticEncoders.PrimitiveDoubleEncoder,
        containsNull = false, lenientSerialization = false)
  }

  /** Untyped-DataFrame handle: `df.groupBy("label").agg(centroid($"embedding"))`. */
  def centroid(c: Column): Column = udaf(new CentroidAggregator).apply(c)
}
