package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions installer exposing the engine's native expressions
  * to SQL (`spark.sql.extensions=graft.functions.GraftExtensions`), plus a
  * programmatic registrar for sessions created without the conf.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.dotFunction)
    ext.injectFunction(GraftExtensions.simhashFunction)
  }
}

object GraftExtensions {
  private def dotBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(a, b) => DotProduct(a, b)
    case _ => throw new IllegalArgumentException("graft_dot expects exactly 2 arguments")
  }

  private def simhashBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(a) => SimHash64(a)
    case _ => throw new IllegalArgumentException("graft_simhash64 expects exactly 1 argument")
  }

  val dotFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
    dotBuilder _)

  val simhashFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_simhash64"),
    new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash64"),
    simhashBuilder _)

  /** Idempotent per-session registration for SQL-string use. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("graft_dot", dotBuilder, "built-in")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("graft_simhash64", simhashBuilder, "built-in")
  }
}
