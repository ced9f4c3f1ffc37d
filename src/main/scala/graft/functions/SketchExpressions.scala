package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graftx.{toColumn, toExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Probe side of the Count-Min-Sketch pipeline (SURVEY.md §2.11 D5 /
  * sketch surface): Spark ships the BUILD side as the `count_min_sketch`
  * SQL aggregate (mergeable map-side partials — the whole corpus reduces
  * to one ~200 KB blob) but no way to query the blob from SQL. CmsEstimate
  * closes that: `cms_estimate(sketch, item)` returns the sketch's count
  * estimate for a string item, matching the aggregate's binary-update
  * convention (UTF8String bytes), so build and probe agree bit-for-bit.
  */
object SketchFunctions {
  /** Estimated count of `item` in a `count_min_sketch(...)` blob. */
  def cmsEstimate(sketch: Column, item: Column): Column =
    toColumn(CmsEstimate(toExpression(sketch), toExpression(item)))
}

/** `cms_estimate(sketch: binary, item: string): long`.
  *
  * The sketch is deserialized per evaluation — the probe frame is by
  * construction a handful of candidate rows (the broadcast 1-row blob ×
  * top-k candidates), so a shared-state cache (and its cross-task race,
  * cf. the round-2 plane-cache advice) buys nothing here. CodegenFallback:
  * one virtual call per PROBE row, never per corpus row.
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, StringType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"cms_estimate expects (binary, string), got (${l.simpleString}, ${r.simpleString})")
  }

  override def nullSafeEval(sketchBytes: Any, item: Any): Any = {
    val cms = CountMinSketch.readFrom(sketchBytes.asInstanceOf[Array[Byte]])
    // the count_min_sketch aggregate updates string columns via their UTF-8
    // bytes (addBinary), so the probe must hash the same representation
    cms.estimateCount(item.asInstanceOf[UTF8String].getBytes)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CmsEstimate =
    copy(left = l, right = r)
}
