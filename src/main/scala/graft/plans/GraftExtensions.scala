package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier

/** Engine extension point, installed via
  * `spark.sql.extensions=graft.plans.GraftExtensions` (GraftSession
  * sets it). Registers the engine's native expressions so they're
  * callable from both the Column API (`call_function("graft_dot", …)`)
  * and plain SQL — the idiomatic way to extend Catalyst without
  * touching internals at call sites.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // the lake catalog door: `FROM graft_lake.<table>[__v<N>]` in SQL
    // text resolves (lazily, at analysis time) to the merge-on-read
    // view of a manifested bucketed table — see LakeRelationRule
    ext.injectResolutionRule(LakeRelationRule.apply)
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      DotProduct.info,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, "graft_dot takes exactly 2 arguments")
        DotProduct(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_max_sorted_run"),
      MaxSortedRun.info,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 1, "graft_max_sorted_run takes exactly 1 argument")
        MaxSortedRun(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash_sig"),
      MinHashSig.info,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 3,
          "graft_minhash_sig takes (toks array<string>, k, seed)")
        require(children(1).foldable && children(2).foldable,
          "graft_minhash_sig k and seed must be literals")
        MinHashSig(children.head,
          children(1).eval().asInstanceOf[Number].intValue(),
          children(2).eval().asInstanceOf[Number].longValue())
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_sorted_inter"),
      SortedIntersect.info,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, "graft_sorted_inter takes exactly 2 arguments")
        SortedIntersect(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_window_min"),
      WindowMin.info,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, "graft_window_min takes exactly 2 arguments")
        WindowMin(children.head, children(1))
      }))
  }
}
