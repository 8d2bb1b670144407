package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One scored candidate neighbor. */
case class KnnRow(qid: Long, nid: Long, sim: Double)

/** Aggregation buffer: top candidates so far, sorted (sim desc, nid asc). */
case class TopBuf(items: Seq[KnnRow])

/** Bounded-memory per-group top-k by (sim desc, nid asc) — a typed
  * Aggregator, so Catalyst plans partial (per input partition) + final
  * aggregation and only ≤k rows per group ever cross the shuffle.
  *
  * The window alternative (`row_number().over(partitionBy(qid).orderBy(...))
  * .filter(rn <= k)`) shuffles and sorts EVERY scored pair — n²·log for
  * brute-force knn. This is the operator shape that survives scale; the
  * tiebreak (sim desc, nid asc) makes the result set deterministic and
  * equal to the window form.
  */
/** A generic lexicographic sort key (three longs, ascending). */
case class TupRow(k1: Long, k2: Long, k3: Long)

/** Aggregation buffer: bottom tuples so far, sorted ascending. */
case class TupBuf(items: Seq[TupRow])

/** Bounded-memory per-group BOTTOM-k by ascending (k1, k2, k3) — the
  * [[TopKNeighbors]] shape generalized to any ordering that can be
  * encoded into a lexicographic long tuple (null placement, DESC
  * directions, tiebreaks all fold into the key construction). Replaces
  * the `row_number().over(partitionBy(g).orderBy(...)).filter(rn <= k)`
  * window when |groups| is small: the window form sorts the ENTIRE
  * table inside |groups| partitions (2 partitions for a 2-value group
  * key — a 100 TB death sentence), while this plans partial+final hash
  * aggregation where each input partition contributes ≤k rows per group
  * to the shuffle.
  */
class BottomKTuples(k: Int) extends Aggregator[TupRow, TupBuf, TupBuf] with Serializable {
  override def zero: TupBuf = TupBuf(Vector.empty)

  private def lt(a: TupRow, b: TupRow): Boolean =
    a.k1 < b.k1 || (a.k1 == b.k1 && (a.k2 < b.k2 || (a.k2 == b.k2 && a.k3 < b.k3)))

  private def insert(buf: Seq[TupRow], r: TupRow): Seq[TupRow] =
    if (buf.size >= k && lt(buf.last, r)) buf
    else ((buf :+ r).sortBy(t => (t.k1, t.k2, t.k3))).take(k)

  override def reduce(b: TupBuf, a: TupRow): TupBuf = TupBuf(insert(b.items, a))
  override def merge(b1: TupBuf, b2: TupBuf): TupBuf = TupBuf(b2.items.foldLeft(b1.items)(insert))
  override def finish(r: TupBuf): TupBuf = r
  override def bufferEncoder: Encoder[TupBuf] = Encoders.product[TupBuf]
  override def outputEncoder: Encoder[TupBuf] = Encoders.product[TupBuf]
}

class TopKNeighbors(k: Int) extends Aggregator[KnnRow, TopBuf, TopBuf] with Serializable {
  override def zero: TopBuf = TopBuf(Vector.empty)

  private def insert(buf: Seq[KnnRow], r: KnnRow): Seq[KnnRow] =
    if (buf.size >= k && (buf.last.sim > r.sim || (buf.last.sim == r.sim && buf.last.nid < r.nid)))
      buf // not in the top k
    else
      ((buf :+ r).sortBy(s => (-s.sim, s.nid))).take(k)

  override def reduce(b: TopBuf, a: KnnRow): TopBuf = TopBuf(insert(b.items, a))
  override def merge(b1: TopBuf, b2: TopBuf): TopBuf = TopBuf(b2.items.foldLeft(b1.items)(insert))
  override def finish(r: TopBuf): TopBuf = r
  override def bufferEncoder: Encoder[TopBuf] = Encoders.product[TopBuf]
  override def outputEncoder: Encoder[TopBuf] = Encoders.product[TopBuf]
}
