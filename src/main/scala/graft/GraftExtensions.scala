package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{ExtractBalancedJson, TextSql, VectorDot}

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
    // The text/LSH column combinators (graft_shingles, graft_minhash_sig,
    // graft_band_key, graft_simhash, graft_quality_score, graft_bow_hash,
    // graft_shingle_hashes): pure compositions of built-in expressions
    // that inline into the caller's plan — see functions.TextSql.
    TextSql.combinators.foreach { case (name, arity, f) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(TextSql.getClass.getName, name),
        TextSql.builderOf(name, arity, f)))
    }
  }
}
