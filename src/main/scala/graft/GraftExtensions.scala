package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, UnaryMinus}
import graft.expressions.{DotProduct, HashFeaturize, NfcNormalize, SignPack}

/** Session extension point — registers the engine's native SQL
  * functions so `spark.sql("SELECT vec_dot(a, b) ...")` works:
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions)
  * // or: --conf spark.sql.extensions=graft.GraftExtensions
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "vec_dot"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))))
    ext.injectFunction((
      new FunctionIdentifier("vec_negdot"),
      new ExpressionInfo(classOf[DotProduct].getName, "vec_negdot"),
      (args: Seq[Expression]) => UnaryMinus(DotProduct(args(0), args(1)))))
    ext.injectFunction((
      new FunctionIdentifier("vec_signpack"),
      new ExpressionInfo(classOf[SignPack].getName, "vec_signpack"),
      (args: Seq[Expression]) => SignPack(args(0))))
    ext.injectFunction((
      new FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (args: Seq[Expression]) => NfcNormalize(args(0))))
    ext.injectFunction((
      new FunctionIdentifier("vec_featurize"),
      new ExpressionInfo(classOf[HashFeaturize].getName, "vec_featurize"),
      (args: Seq[Expression]) => {
        if (args.isEmpty || args.size > 2)
          throw new IllegalArgumentException(
            s"vec_featurize expects (text[, dims]), got ${args.size} arguments")
        val dims = args.lift(1) match {
          case None => graft.functions.Embeddings.Dims
          case Some(Literal(v: Int, _)) => v
          case Some(other) => throw new IllegalArgumentException(
            s"vec_featurize dims must be an integer literal, got $other")
        }
        HashFeaturize(args.head, dims)
      }))
  }
}
