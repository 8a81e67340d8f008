package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression

/** Registers expression builders in the session's FunctionRegistry so the
  * custom expressions are SQL-callable (`SELECT jaro_winkler(a, b)`).
  * Lives in org.apache.spark.sql to reach private[sql] sessionState.
  */
object Register {
  def tempFunction(spark: SparkSession, name: String,
                   builder: Seq[Expression] => Expression): Unit = {
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
  }
}
