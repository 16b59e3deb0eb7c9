package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.expressions.{MinhashSigExpr, RpSignatureExpr, Sha256Prefix32Expr, SortedIntersectCountExpr, VecDotExpr}

/** Session extensions: registers the engine's native expressions.
  * Activate with `.config("spark.sql.extensions", "graft.GraftExtensions")`
  * (done by Verify, Bench, and the test harness). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("sha256_prefix32"),
      new ExpressionInfo(classOf[Sha256Prefix32Expr].getName, "sha256_prefix32"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        Sha256Prefix32Expr(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedIntersectCountExpr].getName, "sorted_intersect_count"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SortedIntersectCountExpr(children.head, children(1))))
    ext.injectFunction((
      new FunctionIdentifier("minhash_sig16"),
      new ExpressionInfo(classOf[MinhashSigExpr].getName, "minhash_sig16"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        MinhashSigExpr(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDotExpr].getName, "vec_dot"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        VecDotExpr(children.head, children(1))))
    ext.injectFunction((
      new FunctionIdentifier("rp_signature64"),
      new ExpressionInfo(classOf[RpSignatureExpr].getName, "rp_signature64"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        RpSignatureExpr(children.head)))
  }
}
