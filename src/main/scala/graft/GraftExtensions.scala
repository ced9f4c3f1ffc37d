package graft

import graft.functions.{PolyHash, RpSignatures, SimHash64, VecDot, VecNorm}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions as SQL functions, so `spark.sql("SELECT vec_dot(a, b) ...")`
  * and the DataFrame wrappers share one implementation.
  *
  * Install with:
  * {{{
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions.registry

  override def apply(ext: SparkSessionExtensions): Unit =
    registry.foreach { case (name, usage, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name), GraftExtensions.info(name, usage), builder))
    }
}

object GraftExtensions {
  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(s"$what must be an int literal, got $other")
  }

  private val registry: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("vec_dot", "vec_dot(a, b) - dot product of two float/double arrays",
      args => VecDot(args(0), args(1))),
    ("vec_norm", "vec_norm(a) - L2 norm of a float/double array",
      args => VecNorm(args(0))),
    ("simhash64", "simhash64(tokens) - 64-bit SimHash of a string array",
      args => SimHash64(args(0))),
    ("poly_hash", "poly_hash(s) - Rabin-Karp polynomial hash of a string",
      args => PolyHash(args(0))),
    ("rp_signatures", "rp_signatures(emb, tables, bits) - sign-LSH bucket signatures",
      args => RpSignatures(args(0), intArg(args(1), "tables"), intArg(args(2), "bits"), seed = 42L)))

  /** Register into an already-running session (the `spark.sql.extensions`
    * config only applies at session construction). */
  def install(spark: org.apache.spark.sql.SparkSession): Unit =
    registry.foreach { case (name, usage, builder) =>
      org.apache.spark.sql.graftx.registerFunction(spark, name, info(name, usage), builder)
    }
}
