package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{ExtractBalancedJson, VectorDot}

/** Session-extension entry point: deploy the engine's custom functions
  * on any cluster session via
  * `--conf spark.sql.extensions=graft.GraftExtensions` (or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`), with
  * no per-session registration code.
  *
  * The engine deliberately injects FUNCTIONS only: the reference's
  * surface needs no custom logical plans, optimizer rules or physical
  * strategies (SURVEY.md §4 — every operator maps to built-in
  * relational algebra, where Catalyst's own rules already do the
  * optimizing). Keeping the extension surface minimal is the design,
  * not an omission.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("extract_balanced_json"),
      new ExpressionInfo(classOf[ExtractBalancedJson].getName, "extract_balanced_json"),
      (exprs: Seq[Expression]) => ExtractBalancedJson(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("vector_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "vector_dot"),
      (exprs: Seq[Expression]) => VectorDot(exprs.head, exprs(1))))
  }
}
