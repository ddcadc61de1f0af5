package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native Catalyst expression: sliding-window minima over an
  * ARRAY<BIGINT> — `graft_window_min(arr, w)` returns the minimum of
  * each length-`w` window (m−w+1 values), or the single overall
  * minimum when the array is shorter than one window (and an empty
  * array for an empty input). The winnowing fingerprint hot loop: the
  * composable form (`transform(sequence(...), i -> array_min(slice(
  * arr, i, w)))`) runs interpreted higher-order lambdas and copies a
  * w-element slice PER WINDOW — O(m·w) allocations outside codegen;
  * this compiles to bare loops over the unsafe array buffer inside
  * whole-stage codegen. Same values in the same order, so swapping it
  * into declared queries never moves a gate hash.
  *
  * Null elements are skipped (the hash inputs are non-null by
  * construction; skipping matches `array_min`'s null-ignoring fold
  * over the compacted sequence).
  */
final case class WindowMin(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_window_min requires (array<bigint>, int), got ($l, $r)")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_window_min"

  override def nullSafeEval(arr: Any, wAny: Any): Any = {
    val xs = arr.asInstanceOf[ArrayData]
    val w = math.max(wAny.asInstanceOf[Int], 1)
    val n = xs.numElements()
    val vals = new Array[Long](n)
    var m = 0
    var i = 0
    while (i < n) {
      if (!xs.isNullAt(i)) { vals(m) = xs.getLong(i); m += 1 }
      i += 1
    }
    if (m == 0) new GenericArrayData(Array.empty[Long])
    else if (m < w) {
      var mn = vals(0)
      var j = 1
      while (j < m) { if (vals(j) < mn) mn = vals(j); j += 1 }
      new GenericArrayData(Array(mn))
    } else {
      val out = new Array[Long](m - w + 1)
      var s = 0
      while (s <= m - w) {
        var mn = vals(s)
        var j = 1
        while (j < w) { if (vals(s + j) < mn) mn = vals(s + j); j += 1 }
        out(s) = mn
        s += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, wv) => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val w = ctx.freshName("w")
      val vals = ctx.freshName("vals")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val j = ctx.freshName("j")
      val mn = ctx.freshName("mn")
      val unsafeArr = classOf[UnsafeArrayData].getName
      s"""
         |int $n = $a.numElements();
         |int $w = $wv < 1 ? 1 : $wv;
         |long[] $vals = new long[$n];
         |int $m = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) { $vals[$m++] = $a.getLong($i); }
         |}
         |long[] $out;
         |if ($m == 0) {
         |  $out = new long[0];
         |} else if ($m < $w) {
         |  long $mn = $vals[0];
         |  for (int $j = 1; $j < $m; $j++) { if ($vals[$j] < $mn) $mn = $vals[$j]; }
         |  $out = new long[] { $mn };
         |} else {
         |  $out = new long[$m - $w + 1];
         |  for (int $s = 0; $s <= $m - $w; $s++) {
         |    long $mn = $vals[$s];
         |    for (int $j = 1; $j < $w; $j++) {
         |      if ($vals[$s + $j] < $mn) $mn = $vals[$s + $j];
         |    }
         |    $out[$s] = $mn;
         |  }
         |}
         |${ev.value} = $unsafeArr.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WindowMin =
    copy(left = newLeft, right = newRight)
}

object WindowMin {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[WindowMin].getName, "graft_window_min")
}
