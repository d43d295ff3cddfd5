package graft.operators

import org.apache.spark.sql.{Encoder, Encoders, functions}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import scala.collection.mutable

/** Space-Saving heavy hitters (Metwally et al.) as a typed Spark
  * `Aggregator` — the bounded-memory sketch a 100 TB pipeline uses to find
  * frequent values (domains, tokens, user agents) without shuffling every
  * distinct key: each partition keeps at most `capacity` counters, partial
  * sketches merge associatively, and any value with true frequency
  * > N/capacity is guaranteed to surface (with an overestimate bounded by
  * the smallest displaced counter).
  *
  * The buffer is a plain Map (count + max-error per key), kryo-encoded;
  * merge sums counts and errors then re-prunes to capacity with the
  * standard displaced-minimum accounting.
  */
class SpaceSaving(capacity: Int)
    extends Aggregator[String, mutable.Map[String, (Long, Long)], Seq[(String, Long, Long)]] {

  override def zero: mutable.Map[String, (Long, Long)] = mutable.Map.empty

  override def reduce(
      b: mutable.Map[String, (Long, Long)], v: String): mutable.Map[String, (Long, Long)] = {
    b.get(v) match {
      case Some((c, e)) => b.update(v, (c + 1, e))
      case None if b.size < capacity => b.update(v, (1L, 0L))
      case None =>
        // displace the minimum counter: new key inherits its count as error
        val (minK, (minC, _)) = b.minBy { case (k, (c, _)) => (c, k) }
        b.remove(minK)
        b.update(v, (minC + 1, minC))
    }
    b
  }

  override def merge(
      a: mutable.Map[String, (Long, Long)],
      b: mutable.Map[String, (Long, Long)]): mutable.Map[String, (Long, Long)] = {
    b.foreach { case (k, (c, e)) =>
      a.get(k) match {
        case Some((c0, e0)) => a.update(k, (c0 + c, e0 + e))
        case None => a.update(k, (c, e))
      }
    }
    // re-prune to capacity: displaced keys' counts become error mass of
    // the survivors' guarantee (standard merged-sketch accounting)
    while (a.size > capacity) {
      val (minK, _) = a.minBy { case (k, (c, _)) => (c, k) }
      a.remove(minK)
    }
    a
  }

  /** (value, estimated count, max overestimate), most frequent first. */
  override def finish(b: mutable.Map[String, (Long, Long)]): Seq[(String, Long, Long)] =
    b.toSeq.map { case (k, (c, e)) => (k, c, e) }
      .sortBy { case (k, c, _) => (-c, k) }

  override def bufferEncoder: Encoder[mutable.Map[String, (Long, Long)]] =
    Encoders.kryo[mutable.Map[String, (Long, Long)]]
  override def outputEncoder: Encoder[Seq[(String, Long, Long)]] =
    ExpressionEncoder[Seq[(String, Long, Long)]]()
}

object HeavyHitters {
  /** UDAF form for untyped DataFrames:
    * `df.agg(HeavyHitters.topValues(16)(col("domain")))` — yields an array
    * of (value, count, max_error) structs, most frequent first.
    */
  def topValues(capacity: Int): UserDefinedFunction =
    functions.udaf(new SpaceSaving(capacity), Encoders.STRING)
}
