package org.apache.spark.sql.graftglue

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Spark extension point registration for graft's custom expressions —
  * makes them available to pure-SQL users (`SELECT float_vector_dot(a, b)`)
  * in addition to the Column API:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)           // programmatic
  * // or: spark.sql.extensions=org.apache.spark.sql.graftglue.GraftExtensions
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("float_vector_dot"),
      new ExpressionInfo(classOf[FloatVectorDot].getName, "float_vector_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "float_vector_dot takes exactly 2 arguments")
        FloatVectorDot(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "word_shingles takes exactly 2 arguments")
        WordShingles(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "minhash_sig takes exactly 2 arguments")
        MinHashSig(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("simhash_sig"),
      new ExpressionInfo(classOf[SimHashSig].getName, "simhash_sig"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "simhash_sig takes exactly 2 arguments")
        SimHashSig(children.head, children(1))
      }))
  }
}
