package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression: |a ∩ b| for two SORTED (ascending,
  * binary UTF8 order — what `array_sort` produces), DUPLICATE-FREE,
  * null-free ARRAY<STRING> inputs, by a two-pointer merge scan.
  *
  * This is the exact-Jaccard verify's hot loop. The alternatives both
  * lose at scale: the exploded-token equi-join fans every candidate
  * pair out to (pair, token) rows and pays a shuffle + aggregation
  * exchange proportional to Σ_pairs |toks|; `array_intersect` keeps
  * the per-pair shape but builds a fresh hash set per ROW (generic
  * object path for strings — allocation plus re-hashing of the same
  * set for every pair it appears in). The merge scan does O(|a|+|b|)
  * UTF8String comparisons on the unsafe buffers, no allocation, no
  * hashing, inside whole-stage codegen.
  *
  * CONTRACT (caller-enforced, like graft_max_sorted_run's sortedness):
  * both arrays sorted ascending and distinct — what
  * `array_sort(array_distinct(...))` yields. Unsorted input returns
  * an undercount, silently; every call site sorts per DOCUMENT (once,
  * narrow) before the per-PAIR join fan-in, so the sort amortizes
  * over a doc's candidate multiplicity. Null elements: array_sort
  * places nulls LAST; the scan stops at the first null on either
  * side (nulls never match anything, and nothing sorts after them).
  */
final case class SortedIntersect(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_sorted_inter requires (array<string>, array<string>), got ($l, $r)")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sorted_inter"

  override def nullSafeEval(input1: Any, input2: Any): Any = {
    val a = input1.asInstanceOf[ArrayData]
    val b = input2.asInstanceOf[ArrayData]
    val (na, nb) = (a.numElements(), b.numElements())
    var i = 0
    var j = 0
    var inter = 0L
    while (i < na && j < nb && !a.isNullAt(i) && !b.isNullAt(j)) {
      val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (c < 0) i += 1
      else if (c > 0) j += 1
      else { inter += 1L; i += 1; j += 1 }
    }
    inter
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val inter = ctx.freshName("inter")
      s"""
         |int $na = $a.numElements();
         |int $nb = $b.numElements();
         |int $i = 0;
         |int $j = 0;
         |long $inter = 0L;
         |while ($i < $na && $j < $nb && !$a.isNullAt($i) && !$b.isNullAt($j)) {
         |  int $c = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
         |  if ($c < 0) $i++;
         |  else if ($c > 0) $j++;
         |  else { $inter++; $i++; $j++; }
         |}
         |${ev.value} = $inter;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersect =
    copy(left = newLeft, right = newRight)
}

object SortedIntersect {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[SortedIntersect].getName, "graft_sorted_inter")
}
