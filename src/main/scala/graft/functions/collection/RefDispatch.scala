package graft.functions.collection

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, RuntimeReplaceable, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** The reference dialect's LENGTH: characters for a string, element
  * count for an array (reference: src/expression/strings.js:38-45
  * `typeof val === 'string' || Array.isArray(val) → val.length`) —
  * a runtime dispatch Spark's analysis-typed `length` refuses for
  * arrays. LENGTH is STRICT in the reference: any other input class
  * throws "expected string or array" at row evaluation (strings.js:
  * 42-45) — the class is the column's STATIC type here, so the raise
  * is type dispatch, not per-row data validation (a dirty cell in a
  * string column is still just measured), and an empty table never
  * raises, exactly like the reference's row-1 throw. Cold-path dialect
  * helper — CodegenFallback.
  */
case class LengthAny(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_length"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else child.dataType match {
      case StringType => v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].numChars()
      case _: ArrayType => v.asInstanceOf[ArrayData].numElements()
      case _ => throw new RuntimeException(
        "LENGTH(string): expected string or array, got " +
          child.dataType.simpleString + ". Use CAST to convert to a string first.")
    }
  }

  override protected def withNewChildInternal(newChild: Expression): LengthAny =
    copy(child = newChild)
}

/** ARRAY_LENGTH(arr, dim): the reference's dimensional walk (reference:
  * src/expression/evaluate.js:577-592) — dim must be an integer ≥ 1;
  * each descended level must be non-empty and RECTANGULAR (every
  * sibling an array of the first element's length), else NULL. Only
  * the first element's subtree is descended, exactly like the
  * reference. NULL for non-array input (runtime dispatch).
  */
case class SizeDim(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_size_dim"

  override def eval(input: InternalRow): Any = {
    val arrV = left.eval(input)
    val dimV = right.eval(input)
    if (arrV == null || dimV == null) return null
    val d = dimV match {
      case i: Int => i
      case l: Long => if (l >= 1 && l <= Int.MaxValue) l.toInt else return null
      case s: Short => s.toInt
      case b: Byte => b.toInt
      case dd: Double => if (dd.isWhole && dd >= 1) dd.toInt else return null
      case _ => return null
    }
    if (d < 1) return null
    left.dataType match {
      case at: ArrayType =>
        var level = arrV.asInstanceOf[ArrayData]
        var elemType = at.elementType
        var i = 1
        while (i < d) {
          if (level.numElements() == 0) return null
          elemType match {
            case inner: ArrayType =>
              if (level.isNullAt(0)) return null
              val first = level.getArray(0)
              val n = first.numElements()
              var j = 1
              while (j < level.numElements()) {
                if (level.isNullAt(j) || level.getArray(j).numElements() != n) return null
                j += 1
              }
              level = first
              elemType = inner.elementType
            case _ => return null
          }
          i += 1
        }
        level.numElements()
      case _ => null
    }
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SizeDim =
    copy(left = newLeft, right = newRight)
}

/** Numeric subscript `arr[i]` with the reference's JS semantics:
  * 0-based, NULL when out of range, negative, or when the base is not
  * an array at all (JS `value[5]` on a non-array is undefined, never an
  * error) — where Spark's GetArrayItem raises under ANSI and rejects
  * non-array bases at analysis.
  */
case class GetAny(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = left.dataType match {
    case at: ArrayType => at.elementType
    case _ => NullType
  }
  override def nullable: Boolean = true
  override def prettyName: String = "graft_get"

  override def eval(input: InternalRow): Any = {
    val arrV = left.eval(input)
    val idxV = right.eval(input)
    if (arrV == null || idxV == null) return null
    val i = idxV match {
      case n: Int => n
      case n: Long => if (n >= Int.MinValue && n <= Int.MaxValue) n.toInt else return null
      case n: Short => n.toInt
      case n: Byte => n.toInt
      case d: Double => if (d.isWhole) d.toInt else return null
      case _ => return null
    }
    left.dataType match {
      case at: ArrayType =>
        val arr = arrV.asInstanceOf[ArrayData]
        if (i < 0 || i >= arr.numElements() || arr.isNullAt(i)) null
        else arr.get(i, at.elementType)
      case _ => null
    }
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): GetAny =
    copy(left = l, right = r)
}

/** JSON_VALID with the reference's dispatch: a STRING parse-checks with
  * whole-input strictness (JSON.parse rejects trailing garbage); any
  * NON-string input — numbers, booleans, objects — is false, NOT
  * coerced (execute.json "should return false for non-string input" /
  * "for object input"); NULL stays NULL.
  */
case class JsonValidAny(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_json_valid_any"

  @transient private lazy val om = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    m.enable(com.fasterxml.jackson.databind.DeserializationFeature.FAIL_ON_TRAILING_TOKENS)
    m
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else child.dataType match {
      case StringType =>
        try { om.readTree(v.toString); true } catch { case _: Exception => false }
      case _ => false
    }
  }

  override protected def withNewChildInternal(newChild: Expression): JsonValidAny =
    copy(child = newChild)
}

/** Coerce a JSON-function input to JSON TEXT: the reference's JSON
  * family accepts a string (parsed) OR a typed value directly
  * (reference: src/expression/evaluate.js:640-660 "Parse JSON if
  * string, otherwise use directly") — in Spark the typed analog is a
  * struct/array/map column, which `to_json` renders. Strings pass
  * through untouched; scalars cast. Resolves to built-in expressions
  * after analysis (RuntimeReplaceable), so the hot path stays codegen.
  */
case class JsonInputText(child: Expression)
    extends UnaryExpression with RuntimeReplaceable {
  override def prettyName: String = "graft_json_input"

  override lazy val replacement: Expression = child.dataType match {
    case StringType => child
    case _: StructType | _: ArrayType | _: MapType =>
      // timeZoneId set eagerly: the analyzer's ResolveTimeZone never
      // visits a RuntimeReplaceable's replacement, and an unresolved
      // StructsToJson fails the whole query (both harness processes and
      // the engine's sessions run UTC). Null fields DROP: a null struct
      // field is JS `undefined` (an absent key — JSON.stringify drops
      // it), the only reading that keeps per-row key sets distinct when
      // a shared schema unions keys across rows.
      org.apache.spark.sql.catalyst.expressions.StructsToJson(
        Map.empty, child, Some(java.util.TimeZone.getDefault.getID))
    case NullType => org.apache.spark.sql.catalyst.expressions.Literal(null, StringType)
    case _ => org.apache.spark.sql.catalyst.expressions.Cast(child, StringType)
  }

  override protected def withNewChildInternal(newChild: Expression): JsonInputText =
    copy(child = newChild)
}
