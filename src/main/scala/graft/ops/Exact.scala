package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Engine-portable deterministic numerics.
  *
  * The correctness gate hash-compares our values against a DuckDB
  * oracle, so every emitted double must be bit-identical across
  * engines AND across runs. Two hazards are eliminated here:
  *
  *  1. Double-sum order: parallel aggregation sums in nondeterministic
  *     order → last-ulp noise. Fix: quantize each addend to a DECIMAL
  *     (exact integer arithmetic, order-independent) and convert the
  *     exact sum back to double (exact while |v·10^scale| < 2^53).
  *  2. round() semantics: Spark rounds via BigDecimal.valueOf (shortest
  *     decimal repr, HALF_UP) while DuckDB multiplies and rounds the
  *     binary value — they disagree on ties like 0.325. Fix: quantize
  *     with floor(x·s + 0.5)/s, which is pure IEEE arithmetic and
  *     therefore identical everywhere given identical input bits.
  *
  * The SQL twin of quant(x, s) is `floor(x * s + 0.5) / s`.
  */
object Exact {

  /** floor(x·scale + 0.5)/scale — portable quantization. */
  def quant(x: Column, scale: Double): Column =
    floor(x * lit(scale) + lit(0.5)) / lit(scale)

  def quant2(x: Column): Column = quant(x, 100.0)
  def quant4(x: Column): Column = quant(x, 10000.0)
  def quant6(x: Column): Column = quant(x, 1000000.0)

  /** Order-independent sum of a double expression: quantize per-row to
    * 4 decimals in PURE IEEE arithmetic — `floor(x·10⁴ + 0.5)` — THEN
    * cast the (exactly integral) double to DECIMAL(18,0) and sum. The
    * direct `cast(double as decimal(18,4))` is NOT portable: Spark
    * rounds the shortest decimal representation (BigDecimal.valueOf)
    * while DuckDB rounds the true binary value, and near-tie rows in
    * multi-factor products round differently (hazard #2 above —
    * round-1 q01 failed on exactly this). floor/·/+ are IEEE-identical
    * everywhere, and the integral-double→decimal cast is exact.
    * SQL twin:
    * `floor(CAST(sum(CAST(floor(x*10000.0+0.5) AS DECIMAL(18,0))) AS DOUBLE)/10000.0*100.0+0.5)/100.0`.
    */
  def moneySum(x: Column): Column =
    quant2(sum(floor(x * lit(10000.0) + lit(0.5)).cast(DecimalType(18, 0)))
      .cast("double") / lit(10000.0))

  /** Exact mean of a double expression, 4-dp output. Counts ALL rows in
    * the group (count(*) semantics) — callers must ensure non-null x.
    * Same pure-IEEE per-row quantization as [[moneySum]], at 6 dp.
    * SQL twin: `floor(CAST(sum(CAST(floor(x*1000000.0+0.5) AS DECIMAL(18,0))) AS DOUBLE)/1000000.0/count(*)*10000.0+0.5)/10000.0`.
    */
  def meanOf(x: Column): Column =
    quant4(sum(floor(x * lit(1000000.0) + lit(0.5)).cast(DecimalType(18, 0)))
      .cast("double") / lit(1000000.0) / count(lit(1)))

  /** Exact mean of an integral expression, 4-dp output.
    * SQL twin: `floor(CAST(sum(x) AS DOUBLE)/count(*)*10000.0+0.5)/10000.0`.
    */
  def meanOfLong(x: Column): Column =
    quant4(sum(x).cast("double") / count(lit(1)))

  /** [[meanOf]] at 6-dp output — centroid components for the
    * oracle-gated Lloyd refinement: grouped double means accumulate
    * in engine-chosen order, so the only gate-safe mean is this
    * quantize-sum-exactly-divide form (order-independent by
    * construction, identical in every engine).
    * SQL twin: `floor(CAST(sum(CAST(floor(x*1000000.0+0.5) AS DECIMAL(18,0))) AS DOUBLE)/1000000.0/count(*)*1000000.0+0.5)/1000000.0`.
    */
  def meanOf6(x: Column): Column =
    quant6(sum(floor(x * lit(1000000.0) + lit(0.5)).cast(DecimalType(18, 0)))
      .cast("double") / lit(1000000.0) / count(lit(1)))
}
