package graft.functions.collection

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** The reference dialect's LEN / SIZE / CARDINALITY / LIST_LENGTH /
  * ARRAY_LENGTH: array length, NULL for ANY non-array input — a
  * runtime type dispatch, not an analysis error (reference:
  * src/expression/evaluate.js:574-595 `if (!Array.isArray(arr))
  * return null`, so `LEN('abc')` and `SIZE(2.5)` are NULL). Spark's
  * `size` instead rejects non-array/map inputs at analysis, which
  * would refuse queries the reference runs. Maps also answer their
  * entry count (Spark-side convenience; the reference has no map
  * values). Cold-path dialect helper — CodegenFallback is fine.
  */
case class SizeAny(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_size"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else child.dataType match {
      case _: ArrayType => v.asInstanceOf[ArrayData].numElements()
      case _: MapType => v.asInstanceOf[org.apache.spark.sql.catalyst.util.MapData].numElements()
      case _ => null
    }
  }

  override protected def withNewChildInternal(newChild: Expression): SizeAny =
    copy(child = newChild)
}
