package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed top-k aggregator (SURVEY §2.11 extension surface): keeps the k
  * highest-scored ids per group in a bounded buffer. Map-side partial
  * aggregation caps each partition's state at k entries per key, so the
  * shuffle carries O(groups × k) rows instead of O(rows) — the reason to use
  * an Aggregator here rather than sort + row_number when k ≪ group size.
  *
  * Ties break on id (ascending) for deterministic output; the result is the
  * id list ordered by (score desc, id asc).
  */
case class TopK(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[Long]] {

  private def keep(buf: Seq[(Double, Long)]): Seq[(Double, Long)] =
    buf.sortBy { case (score, id) => (-score, id) }.take(k)

  override def zero: Seq[(Double, Long)] = Seq.empty

  override def reduce(buf: Seq[(Double, Long)],
                      in: (Double, Long)): Seq[(Double, Long)] =
    keep(buf :+ in)

  override def merge(a: Seq[(Double, Long)],
                     b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    keep(a ++ b)

  override def finish(buf: Seq[(Double, Long)]): Seq[Long] =
    keep(buf).map(_._2)

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}
