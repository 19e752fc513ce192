package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registers a native expression builder on a LIVE session's function
  * registry (the second half of the extension surface: `GraftExtensions`
  * covers builder-time injection for spark.sql.extensions deployments;
  * this covers sessions the engine did not construct — same registry,
  * same builders).
  */
object FunctionBridge {
  def register(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(name),
      new ExpressionInfo("graft", name),
      builder)
}
