package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k state for [[TopKAggregator]]. Kept as a case class so the
  * buffer uses the product ExpressionEncoder (tungsten rows, no kryo). */
case class TopKBuffer(items: Seq[(Double, Long)])

/** Typed `Aggregator` computing the top-k (score, id) pairs per group with
  * a BOUNDED buffer — the one place the engine's zero-UDF rule yields to a
  * JVM aggregate on purpose: a window `row_number() <= k` plan must
  * shuffle and sort EVERY row of the group, while this aggregator is
  * partial-aggregatable (Spark plans it as ObjectHashAggregate
  * partial -> Exchange -> final), so each map task ships at most k rows
  * per group and the big sort never happens. At 100 TB top-k-per-group,
  * that is the difference between shuffling the corpus and shuffling
  * k x groups x partitions rows. Ties break on the id so results are
  * deterministic cross-engine (the DuckDB oracle replays the same order).
  *
  * This is deliberately an `Aggregator` and not a scalar UDF: it holds
  * per-group STATE, which no native expression composition can express,
  * and it participates in partial aggregation, which a window function
  * cannot. Scalar hot paths remain native codegen expressions
  * (plans/GraftExtensions). */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), TopKBuffer, Seq[(Double, Long)]] {

  private def keep(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
    s.sortBy(t => (-t._1, t._2)).take(k)

  override def zero: TopKBuffer = TopKBuffer(Nil)

  override def reduce(b: TopKBuffer, a: (Double, Long)): TopKBuffer =
    // keep() maintains the buffer sorted best-first, so once it is full
    // the common case — a row worse than the current k-th — is a single
    // comparison against items.last instead of a per-row sort
    if (b.items.length == k && {
      val worst = b.items.last
      a._1 < worst._1 || (a._1 == worst._1 && a._2 > worst._2)
    }) b
    else TopKBuffer(keep(a +: b.items))

  override def merge(x: TopKBuffer, y: TopKBuffer): TopKBuffer =
    TopKBuffer(keep(x.items ++ y.items))

  override def finish(r: TopKBuffer): Seq[(Double, Long)] = keep(r.items)

  override def bufferEncoder: Encoder[TopKBuffer] = Encoders.product[TopKBuffer]

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}
