package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k as an AGGREGATE (SURVEY §2.5/§2.7): per-group top-k
  * rows without the window-sort shape. `row_number() OVER (PARTITION
  * BY g ORDER BY v)` shuffles and SORTS every row of every group; this
  * Aggregator keeps an O(k) sorted buffer per group, so partial
  * aggregation reduces each partition's contribution to ≤ k entries
  * before the shuffle — the map-side-combine form of top-k-per-group.
  * At 100 TB with millions of rows per group and k=5, the exchange
  * carries |groups|·|partitions|·k entries instead of every row.
  *
  * Ordering is (value DESC, id ASC) with the id as an explicit
  * tiebreak, so the result is deterministic and float-noise-free.
  */
object TopKAggregate {

  final case class TopKBuf(vs: Array[Double], ids: Array[Long])

  final class TopKAggregator(k: Int)
      extends Aggregator[(Double, Long), TopKBuf, TopKBuf] {
    require(k >= 1, "k must be positive")

    override def zero: TopKBuf = TopKBuf(Array.empty, Array.empty)

    private def better(v1: Double, id1: Long, v2: Double, id2: Long): Boolean =
      v1 > v2 || (v1 == v2 && id1 < id2)

    /** Insert (v, id) into the sorted-by-`better` buffer, capping at k. */
    private def insert(b: TopKBuf, v: Double, id: Long): TopKBuf = {
      val n = b.vs.length
      if (n == k && better(b.vs(n - 1), b.ids(n - 1), v, id)) return b
      var pos = 0
      while (pos < n && better(b.vs(pos), b.ids(pos), v, id)) pos += 1
      val m = math.min(n + 1, k)
      val vs = new Array[Double](m); val ids = new Array[Long](m)
      System.arraycopy(b.vs, 0, vs, 0, pos)
      System.arraycopy(b.ids, 0, ids, 0, pos)
      vs(pos) = v; ids(pos) = id
      val tail = m - pos - 1
      if (tail > 0) {
        System.arraycopy(b.vs, pos, vs, pos + 1, tail)
        System.arraycopy(b.ids, pos, ids, pos + 1, tail)
      }
      TopKBuf(vs, ids)
    }

    override def reduce(b: TopKBuf, a: (Double, Long)): TopKBuf =
      insert(b, a._1, a._2)

    override def merge(x: TopKBuf, y: TopKBuf): TopKBuf = {
      var acc = x
      var i = 0
      while (i < y.vs.length) { acc = insert(acc, y.vs(i), y.ids(i)); i += 1 }
      acc
    }

    override def finish(r: TopKBuf): TopKBuf = r

    override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
    override def outputEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  }

  /** Untyped handle: a struct (vs, ids) of the group's top-k, ready
    * for `posexplode(arrays_zip(...))`.
    */
  def topK(k: Int)(v: Column, id: Column): Column =
    udaf(new TopKAggregator(k)).apply(v, id)
}
