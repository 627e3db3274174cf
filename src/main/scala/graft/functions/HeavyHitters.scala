package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable

/** Misra–Gries heavy-hitters summary as a typed Spark `Aggregator`
  * (SURVEY §2.11's TypedImperativeAggregate tier, realized via the
  * user-facing Aggregator API).
  *
  * Why it exists: the exact token histogram (q47) shuffles the full
  * vocabulary. At corpus scale the vocabulary is billions of keys while
  * only the head matters; Misra–Gries keeps `k` counters per partition,
  * merges mergeable summaries (Agarwal et al. 2012), and guarantees every
  * key with frequency > n/k survives. Shuffle cost: O(k) per partition —
  * independent of data size.
  *
  * Guarantee: returned counts are underestimates, off by at most the total
  * decrement; all true heavy hitters (freq > n/(k+1)) are present.
  */
class MisraGries(k: Int) extends Aggregator[String, mutable.Map[String, Long], Map[String, Long]]
    with Serializable {

  override def zero: mutable.Map[String, Long] = mutable.Map.empty

  override def reduce(buf: mutable.Map[String, Long], key: String): mutable.Map[String, Long] = {
    if (buf.contains(key)) buf(key) += 1L
    else if (buf.size < k) buf(key) = 1L
    else {
      // decrement-all step; drop exhausted counters
      val dead = mutable.ArrayBuffer.empty[String]
      buf.keysIterator.foreach { kk =>
        val v = buf(kk) - 1L
        if (v <= 0L) dead += kk else buf(kk) = v
      }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def merge(a: mutable.Map[String, Long], b: mutable.Map[String, Long]): mutable.Map[String, Long] = {
    b.foreach { case (kk, v) => a(kk) = a.getOrElse(kk, 0L) + v }
    if (a.size > k) {
      // subtract the (k+1)-th largest count, keep positives (mergeable MG)
      val kth = a.values.toSeq.sorted(Ordering[Long].reverse)(k)
      val dead = a.iterator.collect { case (kk, v) if v - kth <= 0 => kk }.toSeq
      a.keysIterator.toSeq.foreach { kk =>
        val v = a(kk) - kth
        if (v > 0) a(kk) = v
      }
      dead.foreach(a.remove)
    }
    a
  }

  override def finish(buf: mutable.Map[String, Long]): Map[String, Long] = buf.toMap

  override def bufferEncoder: Encoder[mutable.Map[String, Long]] =
    Encoders.kryo[mutable.Map[String, Long]]
  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}

object HeavyHitters {
  /** Untyped-column form usable in `df.agg(...)`: partial aggregation
    * happens map-side (summaries merge), so only O(k) state shuffles.
    */
  def mgSummary(c: Column, k: Int): Column =
    org.apache.spark.sql.functions.udaf(new MisraGries(k), Encoders.STRING)(c)
      .as("mg_summary")
}
