package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Dataset-API aggregation surface (§2.9 breadth next to the
  * Catalyst expressions and the TypedImperativeAggregate): an
  * `Aggregator[IN, BUF, OUT]` usable both as a `TypedColumn` on
  * `Dataset[T]` and, via `.toColumn`, inside untyped `agg`.
  *
  * Determinism across partitionings: the buffer carries exact
  * integer-cent sums (never running float sums), count, min, max —
  * merge is associative+commutative, so results are identical for any
  * partition split; the single double division happens once in
  * `finish`.
  */
object TypedAggs {

  /** Exact running stats of a cent-quantized amount. */
  case class MoneyStats(cents: Long, n: Long, minCents: Long, maxCents: Long)

  /** Output: mean in currency units plus exact extremes. */
  case class MoneySummary(n: Long, total: Double, mean: Double,
      min: Double, max: Double)

  /** Aggregates cent-quantized long inputs (quantize BEFORE the
    * aggregator: `round(amount * 100)` — same rule as the embedding
    * kernels: exact integers inside, one division out).
    */
  object CentsSummary extends Aggregator[Long, MoneyStats, MoneySummary] {
    override def zero: MoneyStats =
      MoneyStats(0L, 0L, Long.MaxValue, Long.MinValue)
    override def reduce(b: MoneyStats, cents: Long): MoneyStats =
      MoneyStats(b.cents + cents, b.n + 1,
        math.min(b.minCents, cents), math.max(b.maxCents, cents))
    override def merge(a: MoneyStats, b: MoneyStats): MoneyStats =
      MoneyStats(a.cents + b.cents, a.n + b.n,
        math.min(a.minCents, b.minCents), math.max(a.maxCents, b.maxCents))
    override def finish(r: MoneyStats): MoneySummary =
      if (r.n == 0) MoneySummary(0L, 0.0, 0.0, 0.0, 0.0)
      else MoneySummary(r.n, r.cents / 100.0,
        r.cents / 100.0 / r.n, r.minCents / 100.0, r.maxCents / 100.0)
    override def bufferEncoder: Encoder[MoneyStats] = Encoders.product
    override def outputEncoder: Encoder[MoneySummary] = Encoders.product
  }
}
