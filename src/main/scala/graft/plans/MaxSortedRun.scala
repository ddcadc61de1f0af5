package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression: length of the longest run of EQUAL
  * consecutive elements in an ARRAY<STRING> — which, over a SORTED
  * array, equals the max multiplicity of any element. The repetition
  * scorer's hot loop: the composable form (an `aggregate()` fold with
  * a struct accumulator) walks interpreted higher-order-function
  * machinery and allocates a struct per element; this compiles to a
  * bare loop over the unsafe array buffer comparing adjacent
  * UTF8Strings, inside whole-stage codegen.
  *
  * Same left-to-right scan as the fold — identical results, so
  * swapping it into declared queries never moves a gate hash. Null
  * elements break runs (never count toward one).
  */
final case class MaxSortedRun(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_max_sorted_run requires array<string>, got $t")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_max_sorted_run"

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = xs.numElements()
    var best = 0L
    var run = 0L
    var prev: org.apache.spark.unsafe.types.UTF8String = null
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i)) { run = 0L; prev = null }
      else {
        val cur = xs.getUTF8String(i)
        run = if (prev != null && cur.equals(prev)) run + 1L else 1L
        if (run > best) best = run
        prev = cur
      }
      i += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val best = ctx.freshName("best")
      val run = ctx.freshName("run")
      val prev = ctx.freshName("prev")
      val cur = ctx.freshName("cur")
      val utf8 = "org.apache.spark.unsafe.types.UTF8String"
      s"""
         |int $n = $a.numElements();
         |long $best = 0L;
         |long $run = 0L;
         |$utf8 $prev = null;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { $run = 0L; $prev = null; }
         |  else {
         |    $utf8 $cur = $a.getUTF8String($i);
         |    $run = ($prev != null && $cur.equals($prev)) ? $run + 1L : 1L;
         |    if ($run > $best) $best = $run;
         |    $prev = $cur;
         |  }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MaxSortedRun =
    copy(child = newChild)
}

object MaxSortedRun {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[MaxSortedRun].getName, "graft_max_sorted_run")
}
