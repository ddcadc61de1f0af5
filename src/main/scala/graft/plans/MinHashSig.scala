package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the full k-wide MinHash signature of a
  * token ARRAY<STRING> in ONE pass — min over tokens of
  * (aᵢ·h + bᵢ) mod p for each seeded affine coefficient pair, where
  * h is the 60-bit md5 prefix of the token reduced mod p = 2³¹−1.
  *
  * This replaces the explode → 16-separate-`min`-aggregates signature
  * stage: that shape expanded every document into |tokens| rows and
  * pushed them through a hash aggregate (a full row-expansion plus a
  * shuffle of the exploded frame) just to compute what is really a
  * per-ROW fold. Here the signature is a narrow projection — no
  * explode, no aggregation, no shuffle — with one md5 per token and
  * k fused min-updates inside whole-stage codegen. At 100 TB the
  * signature stage becomes embarrassingly parallel map work.
  *
  * Bit-compatibility contract (the gate depends on it): h is EXACTLY
  * `conv(substring(md5(tok),1,15),16,10) % p` — the first 15 hex
  * chars (60 bits) of the md5, an unsigned value < 2⁶⁰ — and the
  * affine update is plain long arithmetic with a < p, h < p, so
  * a·h + b < 2⁶² never overflows. Null tokens are skipped (explode +
  * `min` ignored them); an all-null or EMPTY array yields NULL (the
  * aggregate form emitted no row for such documents — callers filter
  * empties, and null is the per-row equivalent).
  *
  * Coefficients derive from (k, seed) via the same generator the
  * DuckDB twin SQL serializes ([[MinHashSig.coefficients]] — the
  * single source of truth; `graft.ops.Dedup.minhashCoeffs` delegates
  * here).
  */
final case class MinHashSig(child: Expression, k: Int, seed: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_minhash_sig requires array<string>, got $t")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash_sig"

  @transient private lazy val (as: Array[Long], bs: Array[Long]) = {
    val cs = MinHashSig.coefficients(k, seed)
    (cs.map(_._1), cs.map(_._2))
  }

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    var any = false
    var i = 0
    while (i < n) {
      if (!xs.isNullAt(i)) {
        any = true
        val hb = MinHashSig.baseHash(xs.getUTF8String(i))
        var j = 0
        while (j < k) {
          val h = (as(j) * hb + bs(j)) % MinHashSig.P
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    if (any) new GenericArrayData(mins) else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val mins = ctx.freshName("mins")
      val any = ctx.freshName("any")
      val hb = ctx.freshName("hb")
      val h = ctx.freshName("h")
      val asRef = ctx.addReferenceObj("minhashAs", as, "long[]")
      val bsRef = ctx.addReferenceObj("minhashBs", bs, "long[]")
      s"""
         |int $n = $a.numElements();
         |long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |boolean $any = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    $any = true;
         |    long $hb = graft.plans.MinHashSig.baseHash($a.getUTF8String($i));
         |    for (int $j = 0; $j < $k; $j++) {
         |      long $h = ($asRef[$j] * $hb + $bsRef[$j]) % ${MinHashSig.P}L;
         |      if ($h < $mins[$j]) $mins[$j] = $h;
         |    }
         |  }
         |}
         |if ($any) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |} else {
         |  ${ev.isNull} = true;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  /** Prime modulus of the affine family: 2³¹ − 1. */
  val P: Long = 2147483647L

  /** Seeded affine coefficients (aᵢ, bᵢ), aᵢ ∈ [1, p), bᵢ ∈ [0, p) —
    * the single source of truth shared by this expression, the
    * Column-API pipelines, and the DuckDB twin SQL serialization.
    */
  def coefficients(k: Int, seed: Long = 7L): Array[(Long, Long)] = {
    val rng = new scala.util.Random(seed)
    def mod(x: Long, m: Long): Long = ((x % m) + m) % m
    Array.fill(k)((1L + mod(rng.nextLong(), P - 1), mod(rng.nextLong(), P)))
  }

  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** `conv(substring(md5(tok),1,15),16,10) % P` without the hex
    * round-trip: the first 15 hex chars are bytes 0..6 plus the high
    * nibble of byte 7 of the digest — 60 unsigned bits, always
    * non-negative in a long.
    */
  def baseHash(s: UTF8String): Long = {
    val d = mdLocal.get()
    d.reset()
    val dig = d.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (dig(i) & 0xffL); i += 1 }
    v = (v << 4) | ((dig(7) >> 4) & 0xfL)
    v % P
  }

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[MinHashSig].getName, "graft_minhash_sig")
}
