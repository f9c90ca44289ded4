package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registry of the library's native Catalyst expressions. Sessions built
  * through GraftSession get them injected via extensions; foreign
  * sessions call [[ensureRegistered]] (idempotent). */
object GraftFunctions {

  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(VecDot.description, PqCodesExpr.description,
      SimHash32.description, SimHash64.description,
      MinHashBands.description, WeightedMinhashExpr.description,
      CharBowExpr.description,
      TopKByScore.description, VecMeanAgg.description, OrderedSum.description,
      Once.description,
      RepStats.description, GramOverlap.description, CharStats.description,
      BpeMergeExpr.description, BpeEncodeExpr.description, BpeIdsExpr.description,
      UnigramSegExpr.description,
      UnicodeNormalize.description,
      HeavyHitters.description, CmSketch.description, RandProj.description,
      ShinglesExpr.description, BloomSketch.description,
      QuantileSketch.description)

  def inject(ext: SparkSessionExtensions): Unit =
    all.foreach(ext.injectFunction)

  def ensureRegistered(spark: SparkSession): Unit =
    all.foreach { case (id, info, builder) =>
      if (!spark.sessionState.functionRegistry.functionExists(id))
        spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
