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
