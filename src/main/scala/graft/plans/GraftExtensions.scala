package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.MinHashSignature

/** SparkSessionExtensions entry point: registers graft's custom
  * expressions as SQL functions, so
  *   spark.sql("SELECT minhash_signature(text) FROM docs")
  * works when the session is built with
  *   .config("spark.sql.extensions", "graft.plans.GraftExtensions").
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.minhashDescriptor)
  }
}

object GraftExtensions {

  private[plans] val minhashDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("minhash_signature"),
    new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
    (args: Seq[Expression]) => args match {
      case Seq(text) => MinHashSignature(text)
      case Seq(text, bands) =>
        MinHashSignature(text,
          bands.eval().asInstanceOf[Number].intValue())
      case _ =>
        throw new IllegalArgumentException(
          "minhash_signature(text[, bands]) takes 1 or 2 arguments")
    })

  /** Runtime registration on an existing session (no extensions config
    * needed — e.g. notebooks or tests sharing one session). */
  def register(spark: SparkSession): Unit = {
    val (_, info, builder) = minhashDescriptor
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_signature", builder, "built-in")
  }
}
