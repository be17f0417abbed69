package graft.functions.collection

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Runtime-dispatch versions of the reference's array functions
  * (reference: src/expression/evaluate.js:596-635): every one answers
  * NULL for a non-array first argument — a per-row type dispatch over
  * untyped JS rows, where Spark's builtins reject the query at
  * analysis. Dialect host surface only (cold path — CodegenFallback);
  * the engine's typed DataFrame API uses Spark's codegen'd builtins.
  *
  * Element comparison is JS `===`/`indexOf` semantics: equal only
  * within a kind (numbers compare widened, strings exactly, booleans,
  * null matches null) — never across kinds.
  */
object ArrayAnyOps {

  /** JS-number view of a runtime value: Spark SQL decimals are
    * `o.a.s.sql.types.Decimal`, which is NOT a `java.lang.Number`, so a
    * bare `Number` match silently misses decimal literals like `1.5`.
    */
  private def numOf(v: Any): Option[Double] = v match {
    case n: Number => Some(n.doubleValue())
    case d: Decimal => Some(d.toDouble)
    case _ => None
  }

  def jsEq(a: Any, at: DataType, b: Any, bt: DataType): Boolean = (a, b) match {
    case (null, null) => true
    case (null, _) | (_, null) => false
    case (x: UTF8String, y: UTF8String) => x == y
    case (x: java.lang.Boolean, y: java.lang.Boolean) => x == y
    case (x, y) =>
      (numOf(x), numOf(y)) match {
        case (Some(u), Some(v)) => u == v
        case _ => (at == bt) && x == y
      }
  }

  /** Result element type when appending/concatenating possibly
    * different kinds: keep the shared type, else fall back to STRING
    * with JS rendering (heterogeneous JS arrays have no Spark type).
    */
  def commonElem(a: DataType, b: DataType): DataType =
    if (a == b || b == NullType) a
    else if (a == NullType) b
    else StringType

  def render(v: Any, dt: DataType): Any =
    if (v == null) null
    else UTF8String.fromString(graft.functions.text.JsStr.renderValue(v, dt, castMode = false))

  def toSeqRendered(arr: ArrayData, elem: DataType, target: DataType): IndexedSeq[Any] = {
    val n = arr.numElements()
    (0 until n).map { i =>
      val v = if (arr.isNullAt(i)) null else arr.get(i, elem)
      if (target == elem || v == null) v else render(v, elem)
    }
  }
}

/** ARRAY_POSITION / LIST_POSITION: 1-based indexOf, NULL when absent or
  * when the input is not an array (evaluate.js:596-601).
  */
case class ArrayPositionAny(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_array_position"

  override def eval(input: InternalRow): Any = {
    val arrV = left.eval(input)
    if (arrV == null) return null
    left.dataType match {
      case at: ArrayType =>
        val target = right.eval(input)
        val arr = arrV.asInstanceOf[ArrayData]
        var i = 0
        while (i < arr.numElements()) {
          val v = if (arr.isNullAt(i)) null else arr.get(i, at.elementType)
          if (ArrayAnyOps.jsEq(v, at.elementType, target, right.dataType)) return i + 1
          i += 1
        }
        null
      case _ => null
    }
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ArrayPositionAny =
    copy(left = l, right = r)
}

/** ARRAY_CONTAINS / LIST_CONTAINS: JS includes — boolean, NULL for a
  * non-array input (evaluate.js:603-607).
  */
case class ArrayContainsAny(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_array_contains"

  override def eval(input: InternalRow): Any = {
    val arrV = left.eval(input)
    if (arrV == null) return null
    left.dataType match {
      case at: ArrayType =>
        val target = right.eval(input)
        val arr = arrV.asInstanceOf[ArrayData]
        var i = 0
        while (i < arr.numElements()) {
          val v = if (arr.isNullAt(i)) null else arr.get(i, at.elementType)
          if (ArrayAnyOps.jsEq(v, at.elementType, target, right.dataType)) return true
          i += 1
        }
        false
      case _ => null
    }
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ArrayContainsAny =
    copy(left = l, right = r)
}

/** ARRAY_SORT: ascending, nulls LAST (the reference's comparator puts
  * a==null after everything, evaluate.js:623-634 — Spark's array_sort
  * default agrees); NULL for a non-array input.
  */
case class ArraySortAny(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = child.dataType match {
    case at: ArrayType => at
    case _ => ArrayType(StringType)
  }
  override def nullable: Boolean = true
  override def prettyName: String = "graft_array_sort"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    child.dataType match {
      case at: ArrayType =>
        val arr = v.asInstanceOf[ArrayData]
        val elems = (0 until arr.numElements()).map(i =>
          if (arr.isNullAt(i)) null else arr.get(i, at.elementType))
        val ord = TypeUtils.getInterpretedOrdering(at.elementType)
        val sorted = elems.sortWith { (a, b) =>
          if (a == null) false
          else if (b == null) true
          else ord.compare(a, b) < 0
        }
        new GenericArrayData(sorted.toArray)
      case _ => null
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ArraySortAny =
    copy(child = newChild)
}

/** ARRAY_APPEND / LIST_APPEND: [...arr, elem]; NULL for a non-array
  * input (evaluate.js:609-613). A mixed-kind append falls back to
  * STRING elements with JS rendering (heterogeneous JS arrays have no
  * Spark type).
  */
case class ArrayAppendAny(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  private lazy val elemType: DataType = left.dataType match {
    case at: ArrayType => ArrayAnyOps.commonElem(at.elementType, right.dataType)
    case _ => StringType
  }
  override def dataType: DataType = ArrayType(elemType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_array_append"

  override def eval(input: InternalRow): Any = {
    val arrV = left.eval(input)
    if (arrV == null) return null
    left.dataType match {
      case at: ArrayType =>
        val arr = arrV.asInstanceOf[ArrayData]
        val base = ArrayAnyOps.toSeqRendered(arr, at.elementType, elemType)
        val e = right.eval(input)
        val tail = if (e == null || elemType == right.dataType) e
          else ArrayAnyOps.render(e, right.dataType)
        new GenericArrayData((base :+ tail).toArray)
      case _ => null
    }
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ArrayAppendAny =
    copy(left = l, right = r)
}

/** ARRAY_CONCAT / LIST_CONCAT: [...a, ...b]; NULL when EITHER side is
  * not an array (evaluate.js:616-620 — unlike Spark's concat, which
  * also concatenates strings).
  */
case class ArrayConcatAny(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  private lazy val elemType: DataType = (left.dataType, right.dataType) match {
    case (a: ArrayType, b: ArrayType) => ArrayAnyOps.commonElem(a.elementType, b.elementType)
    case _ => StringType
  }
  override def dataType: DataType = ArrayType(elemType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_array_concat"

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    val b = right.eval(input)
    if (a == null || b == null) return null
    (left.dataType, right.dataType) match {
      case (at: ArrayType, bt: ArrayType) =>
        val xs = ArrayAnyOps.toSeqRendered(a.asInstanceOf[ArrayData], at.elementType, elemType)
        val ys = ArrayAnyOps.toSeqRendered(b.asInstanceOf[ArrayData], bt.elementType, elemType)
        new GenericArrayData((xs ++ ys).toArray)
      case _ => null
    }
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ArrayConcatAny =
    copy(left = l, right = r)
}
