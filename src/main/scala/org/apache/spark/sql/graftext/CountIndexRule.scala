package org.apache.spark.sql.graftext

import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.{DataFrame, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Automatic index routing — the reference's BitmapAggregationRewritePass
  * as a real Catalyst optimizer rule (reference:
  * src/silo/query_engine/optimizer/bitmap_aggregation_rewrite_pass.h:13-41,
  * operators/bitmap_aggregation_node.h): a count-only groupBy on an
  * indexed column is answered from the pre-aggregated index table instead
  * of scanning the fact table. At 100 TB this turns a full-table
  * aggregation into a scan of a value-cardinality-sized table.
  *
  * Registration is by fact-parquet path + column
  * ([[CountIndexRegistry.register]]); the rewrite only fires for the exact
  * safe shape — Aggregate(group = [indexed col], aggs = grouping col +
  * count(1) aliases, child = column-pruning Project over the fact scan,
  * NO intervening filter) — anything else is left to the normal path.
  * Output attribute ids are preserved so parent operators are untouched.
  *
  * Lives under org.apache.spark.sql to see the package-private
  * LogicalRelation/HadoopFsRelation internals.
  */
object CountIndexRegistry {

  /** (normalized fact path, grouping column) → index plan supplier; the
    * index DataFrame must have schema (value: <key type>, cnt: long).
    */
  private val registry = TrieMap[(String, String), LogicalPlan]()

  private def norm(p: String): String =
    p.stripPrefix("file:").replaceAll("/+$", "")

  def register(factPath: String, column: String, index: DataFrame): Unit =
    registry.put((norm(factPath), column), index.queryExecution.analyzed)

  def lookup(paths: Seq[String], column: String): Option[LogicalPlan] =
    paths.flatMap(p => registry.get((norm(p), column))).headOption

  def clear(): Unit = registry.clear()
}

class CountIndexRule extends Rule[LogicalPlan] {

  private def scanPaths(plan: LogicalPlan): Option[Seq[String]] = plan match {
    case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
      Some(fs.location.rootPaths.map(_.toString))
    case Project(projList, child) if projList.forall(_.isInstanceOf[AttributeReference]) =>
      scanPaths(child)
    case _ => None
  }

  private def isCountStar(e: Expression): Boolean = e match {
    // count(NULL) is 0 per group, not count(*) — only a non-null literal
    // argument is row counting
    case AggregateExpression(Count(Seq(Literal(v, _))), _, false, None, _) => v != null
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg @ Aggregate(Seq(g: AttributeReference), aggExprs, child, _)
        if aggExprs.forall {
          case a: AttributeReference => a.exprId == g.exprId
          case Alias(e, _) => isCountStar(e)
          case _ => false
        } =>
      scanPaths(child)
        .flatMap(CountIndexRegistry.lookup(_, g.name))
        .map { idxPlan =>
          val idxValue = idxPlan.output.head
          val idxCnt = idxPlan.output(1)
          val projections: Seq[NamedExpression] = aggExprs.map {
            case a: AttributeReference =>
              Alias(idxValue, a.name)(exprId = a.exprId, qualifier = a.qualifier)
            case al @ Alias(_, name) =>
              Alias(idxCnt, name)(exprId = al.exprId, qualifier = al.qualifier)
            case other => other
          }
          Project(projections, idxPlan): LogicalPlan
        }
        .getOrElse(agg)
  }
}

/** `SparkSessionExtensions` entry point:
  * `.withExtensions(new GraftExtensions)` at session build time, or at
  * runtime `spark.experimental.extraOptimizations ++= Seq(new
  * CountIndexRule)`. Also injects the library's codegen kernels as SQL
  * functions (`SELECT vecdot(a, b)`) so `spark.sql` users get the same
  * tight generated loop the DataFrame API does — a plain-SQL client of
  * the engine never needs the Scala surface.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => new CountIndexRule)
    e.injectFunction(GraftExtensions.vecdot)
  }
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.analysis.FunctionRegistry

  /** (name, info, builder) tuple for [[SparkSessionExtensions.injectFunction]]
    * and [[FunctionRegistry.registerFunction]] — exposed separately so an
    * already-built session can register it too.
    */
  val vecdot: (FunctionIdentifier, org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("vecdot"),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[graft.functions.VecDot].getName, "vecdot"),
    (args: Seq[Expression]) => {
      require(args.length == 2, s"vecdot expects 2 arguments, got ${args.length}")
      graft.functions.VecDot(args(0), args(1))
    })

  /** Register the SQL functions on a live session (the runtime analog of
    * `.withExtensions`, like extraOptimizations for the rule).
    */
  def registerFunctions(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(vecdot._1, vecdot._2, vecdot._3)
}
