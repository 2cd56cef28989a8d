package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd alias-table draw — the walk engine's hot-path scalar
  * (reference include/walk.hpp:1020-1029). Semantics identical to the
  * Scala-UDF variant: pick bucket `i = floor(r1·n)`, return `nbrs(i)` if
  * `r2 < prob(i)` else `nbrs(alias(i))` — but operates directly on
  * Catalyst `ArrayData` inside whole-stage codegen, avoiding the UDF's
  * per-row Seq boxing/unboxing (SURVEY.md §7.3's designated escalation
  * point if UDF overhead dominates the walk inner loop).
  */
case class AliasSampleExpr(
    nbrs: Expression,
    prob: Expression,
    alias: Expression,
    r1: Expression,
    r2: Expression)
  extends Expression {

  override def children: Seq[Expression] = Seq(nbrs, prob, alias, r1, r2)

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)

  override def eval(input: InternalRow): Any = {
    val nb = nbrs.eval(input)
    val pr = prob.eval(input)
    val al = alias.eval(input)
    val a = r1.eval(input)
    val b = r2.eval(input)
    if (nb == null || pr == null || al == null || a == null || b == null) null
    else {
      val nbA = nb.asInstanceOf[ArrayData]
      val n = nbA.numElements()
      val i = math.min((a.asInstanceOf[Double] * n).toInt, n - 1)
      if (b.asInstanceOf[Double] < pr.asInstanceOf[ArrayData].getDouble(i)) nbA.getLong(i)
      else nbA.getLong(al.asInstanceOf[ArrayData].getInt(i))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evs = children.map(_.genCode(ctx))
    val Seq(nbE, prE, alE, r1E, r2E) = evs
    val anyNull = evs.map(e => e.isNull.toString).mkString(" || ")
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    ev.copy(code = code"""
      ${evs.map(_.code).reduce(_ + _)}
      boolean ${ev.isNull} = $anyNull;
      long ${ev.value} = 0L;
      if (!${ev.isNull}) {
        int $n = ${nbE.value}.numElements();
        int $i = Math.min((int)(${r1E.value} * $n), $n - 1);
        ${ev.value} = (${r2E.value} < ${prE.value}.getDouble($i))
          ? ${nbE.value}.getLong($i)
          : ${nbE.value}.getLong(${alE.value}.getInt($i));
      }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(nbrs = newChildren(0), prob = newChildren(1), alias = newChildren(2),
      r1 = newChildren(3), r2 = newChildren(4))
}

object AliasSampleExpr {
  /** Column wrapper (guide pattern: wrap the raw Expression). */
  def sample(nbrs: Column, prob: Column, alias: Column, r1: Column, r2: Column): Column =
    GraftSqlBridge.column(AliasSampleExpr(
      GraftSqlBridge.expression(nbrs), GraftSqlBridge.expression(prob),
      GraftSqlBridge.expression(alias), GraftSqlBridge.expression(r1),
      GraftSqlBridge.expression(r2)))

  /** Register as a SQL function `alias_sample(...)`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "alias_sample",
      exprs => AliasSampleExpr(exprs(0), exprs(1), exprs(2), exprs(3), exprs(4)),
      "scala_udf")
}
