package graft.plans

import graft.functions.{CosineSimilarity, SeqDot}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension wiring: makes the engine's native expressions
  * available to SQL (`SELECT cosine_similarity(a, b)`), the
  * `SparkSessionExtensions` path for builder-time injection plus a
  * runtime registrar for already-built sessions.
  *
  * Usage:
  * {{{
  *   SparkSession.builder().withExtensions(new GraftExtensions) ...
  *   // or on a live session:
  *   GraftExtensions.register(spark)
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (ident, info, builder) =>
      ext.injectFunction((ident, info, builder))
    }
    // SelfCosineRule is NOT injected by default: its fold assumes non-zero
    // finite vectors (cosine(x,x) of a zero vector is NaN, not 1.0). Use
    // GraftExtensions.withSelfCosineRule where that contract holds.
}

/** Opt-in variant that also injects [[SelfCosineRule]] — only for
  * sessions whose vector data is guaranteed non-zero and NaN-free
  * (e.g. unit-normalized embeddings).
  */
class GraftExtensionsWithSelfCosine extends GraftExtensions {
  override def apply(ext: SparkSessionExtensions): Unit = {
    super.apply(ext)
    ext.injectOptimizerRule(_ => SelfCosineRule)
  }
}

object GraftExtensions {
  private val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq((
      FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          s"cosine_similarity expects 2 arguments, got ${args.length}")
        CosineSimilarity(args(0), args(1))
      }),
      (
        FunctionIdentifier("seq_dot"),
        new ExpressionInfo(classOf[SeqDot].getName, "seq_dot"),
        (args: Seq[Expression]) => {
          require(args.length == 2,
            s"seq_dot expects 2 arguments, got ${args.length}")
          SeqDot(args(0), args(1))
        }))

  /** Register all engine functions on a live session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, _, builder) =>
      org.apache.spark.sql.graftbridge.Bridge.registerFunction(spark, ident.funcName, builder)
    }
}
