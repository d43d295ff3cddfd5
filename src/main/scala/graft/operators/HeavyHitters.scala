package graft.operators

import org.apache.spark.sql.{Encoder, Encoders, functions}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import scala.collection.mutable

/** Sketch state: bounded counter map (count, max-overestimate per key) plus
  * a `floor` — the largest count ever discarded from this sketch, which
  * upper-bounds the true count of ANY key currently absent from the map.
  */
case class SSBuffer(
    counters: mutable.Map[String, (Long, Long)],
    floor: Long)

/** Space-Saving heavy hitters (Metwally et al.) as a typed Spark
  * `Aggregator` — the bounded-memory sketch a 100 TB pipeline uses to find
  * frequent values (domains, tokens, user agents) without shuffling every
  * distinct key: each partition keeps at most `capacity` counters and
  * partial sketches merge associatively.
  *
  * Error accounting: inserts that displace a counter inherit its count as
  * their max-overestimate (classic Space-Saving); merges that prune back
  * to capacity record the largest discarded count in `floor`, and later
  * re-insertions start from the floor — so a surviving key's reported
  * count NEVER underestimates its true count, and the overestimate is
  * bounded by the reported per-key error plus the final floor. Any value
  * with true frequency > N/capacity + floor is guaranteed to surface.
  */
class SpaceSaving(capacity: Int)
    extends Aggregator[String, SSBuffer, Seq[(String, Long, Long)]] {

  override def zero: SSBuffer = SSBuffer(mutable.Map.empty, 0L)

  private def insert(b: SSBuffer, v: String, c: Long, e: Long): SSBuffer = {
    val m = b.counters
    m.get(v) match {
      case Some((c0, e0)) => m.update(v, (c0 + c, math.max(e0, e))); b
      case None if m.size < capacity =>
        // an absent key may have held up to `floor` mass before discard
        m.update(v, (c + b.floor, math.max(e, b.floor))); b
      case None =>
        val (minK, (minC, _)) = m.minBy { case (k, (cc, _)) => (cc, k) }
        m.remove(minK)
        val base = math.max(minC, b.floor)
        m.update(v, (c + base, math.max(e, base)))
        b.copy(floor = math.max(b.floor, minC))
    }
  }

  override def reduce(b: SSBuffer, v: String): SSBuffer = insert(b, v, 1L, 0L)

  override def merge(a: SSBuffer, b: SSBuffer): SSBuffer = {
    // A key present in only one sketch may have held up to the OTHER
    // sketch's floor in discarded mass there — compensate one-sided keys
    // with that floor (mirroring what insert() does for absent keys), or
    // the merged count could underestimate the true count.
    val aFloor = a.floor
    val bFloor = b.floor
    var acc = SSBuffer(mutable.Map.empty, math.max(aFloor, bFloor))
    a.counters.foreach { case (k, (c, e)) =>
      b.counters.get(k) match {
        case Some((cb, eb)) => acc.counters.update(k, (c + cb, e + eb))
        case None => acc.counters.update(k, (c + bFloor, e + bFloor))
      }
    }
    b.counters.foreach { case (k, (c, e)) =>
      if (!a.counters.contains(k))
        acc.counters.update(k, (c + aFloor, e + aFloor))
    }
    // prune back to capacity: the discarded mass raises the floor instead
    // of vanishing, preserving the no-underestimate guarantee
    while (acc.counters.size > capacity) {
      val (minK, (minC, _)) =
        acc.counters.minBy { case (k, (c, _)) => (c, k) }
      acc.counters.remove(minK)
      acc = acc.copy(floor = math.max(acc.floor, minC))
    }
    acc
  }

  /** (value, estimated count, max overestimate), most frequent first. */
  override def finish(b: SSBuffer): Seq[(String, Long, Long)] =
    b.counters.toSeq.map { case (k, (c, e)) => (k, c, e) }
      .sortBy { case (k, c, _) => (-c, k) }

  override def bufferEncoder: Encoder[SSBuffer] = Encoders.kryo[SSBuffer]
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
