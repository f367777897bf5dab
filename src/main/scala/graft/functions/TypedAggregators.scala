package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregator (the user-facing UDAF surface, SURVEY.md §2.6):
  * exact pricing stats over a typed Dataset via `Aggregator[IN, BUF, OUT]`.
  *
  * The buffer stores scaled-integer cents (the source doubles carry ≤2
  * decimals), so merging is associative/commutative integer addition —
  * exact under any partitioning — and the final division to double is a
  * single deterministic IEEE op. This is the pattern for exact money
  * aggregation at 100 TB without decimal-type overhead in the shuffle.
  */
object TypedAggregators {

  case class LineSlim(l_returnflag: String, l_quantity: Double,
      l_extendedprice: Double)
  case class PricingBuf(qtyCents: Long, priceCents: Long, n: Long)
  case class PricingStats(sum_qty: Double, sum_price: Double, n_rows: Long)

  /** round-to-cents: source values are 2-decimal reals stored as double,
    * so round(x*100) recovers the exact integer cents. */
  private def cents(x: Double): Long = math.round(x * 100)

  object PricingAgg extends Aggregator[LineSlim, PricingBuf, PricingStats] {
    override def zero: PricingBuf = PricingBuf(0L, 0L, 0L)
    override def reduce(b: PricingBuf, a: LineSlim): PricingBuf =
      PricingBuf(b.qtyCents + cents(a.l_quantity),
        b.priceCents + cents(a.l_extendedprice), b.n + 1)
    override def merge(x: PricingBuf, y: PricingBuf): PricingBuf =
      PricingBuf(x.qtyCents + y.qtyCents, x.priceCents + y.priceCents,
        x.n + y.n)
    override def finish(b: PricingBuf): PricingStats =
      PricingStats(b.qtyCents / 100.0, b.priceCents / 100.0, b.n)
    override def bufferEncoder: Encoder[PricingBuf] = Encoders.product
    override def outputEncoder: Encoder[PricingStats] = Encoders.product
  }
}
