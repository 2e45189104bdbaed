package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{BooleanType, DataType, DoubleType}

/** Even-odd ray-cast point-in-polygon as ONE compact kernel: the value
  * is EXACTLY the unrolled Catalyst composition it replaces
  * (`Ingest.pointInPolygon`'s per-edge
  * `(yi > y) != (yj > y) && x < dx*(y-yi)/dy + xi` parity sum) — the
  * per-edge dx/dy/xi/yi constants are precomputed with the same Scala
  * double arithmetic and the per-edge test applies the same IEEE ops in
  * the same association order, so the boolean is bit-identical and the
  * DuckDB oracle (which replays the unrolled SQL) is unchanged.
  *
  * Why: the unrolled composition duplicates the full x/y derivation
  * chains into every edge branch (~40 copies for the 13-edge Africa
  * ring), which blows the predicate past the whole-stage-codegen size
  * limits — the stage falls back to INTERPRETED evaluation at ~4.5 µs
  * per row (measured: i23's filter was 4.5 s serial on the ×10 corpus).
  * This kernel evaluates x and y once per row and loops a precomputed
  * edge table in generated Java.
  *
  * Horizontal edges (yj == yi) are excluded from the table, exactly as
  * the composition skips them.
  */
case class PointInPolygonExpr(left: Expression, right: Expression,
    poly: Seq[(Double, Double)]) extends BinaryExpression {

  require(poly.length >= 3, "polygon needs at least 3 vertices")

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_point_in_polygon"
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == DoubleType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_point_in_polygon requires (DOUBLE, DOUBLE), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  // per-edge constants, precomputed with the SAME Scala double
  // arithmetic the unrolled composition folded into literals
  @transient private lazy val edges: Array[Array[Double]] = {
    val n = poly.length
    (0 until n).flatMap { k =>
      val (xi, yi) = poly(k)
      val (xj, yj) = poly((k + 1) % n)
      if (yj == yi) None
      else Some(Array(xi, yi, yj, xj - xi, yj - yi))
    }.toArray
  }

  protected override def nullSafeEval(x: Any, y: Any): Any =
    PointInPolygonExpr.rayCast(
      x.asInstanceOf[Double], y.asInstanceOf[Double], edges)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = PointInPolygonExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val tbl = ctx.addReferenceObj("polyEdges", edges, "double[][]")
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = $helper.rayCast($x, $y, $tbl);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PointInPolygonExpr {

  /** One pass over the precomputed edge table; per edge the same IEEE
    * ops in the same order as the unrolled Catalyst composition:
    * `(yi > y) != (yj > y) && x < dx*(y-yi)/dy + xi`. */
  def rayCast(x: Double, y: Double, edges: Array[Array[Double]]): Boolean = {
    var crossings = 0
    var k = 0
    while (k < edges.length) {
      val e = edges(k)
      // e = [xi, yi, yj, dx, dy]
      if ((e(1) > y) != (e(2) > y) && x < e(3) * (y - e(1)) / e(4) + e(0))
        crossings += 1
      k += 1
    }
    crossings % 2 == 1
  }
}
