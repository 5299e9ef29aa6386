package org.apache.spark.sql.graftglue

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, BooleanType, DataType, VariantType}
import org.apache.spark.types.variant.{Variant, VariantUtil}

/** ONE per-element JSON-Schema `items` check over an `array<variant>`
  * column, as a native codegen expression: true iff ANY element violates
  * the check ([[graft.schema.JsonSchemaGate]]'s r12 per-element
  * validation).
  *
  * Why a native: the natural spelling — `exists` / `zip_with` lambdas
  * over the extracted array — is CodegenFallback, and ONE fallback drops
  * the gate's WHOLE projection out of whole-stage codegen (the r6
  * fusion-sweep lesson, plans/FUSION.md; measured: the per-element
  * feature's first HOF cut de-fused the parse + every path check and
  * doubled the gate row). Here each check is one compiled loop per row
  * and the projection stays fused.
  *
  * Semantics are IDENTICAL to the HOF spelling, element for element:
  *
  *  - the element's canonical type folds from the VARIANT ENCODING's own
  *    type tag exactly as `schema_of_variant` does (LONG → int,
  *    DOUBLE/DECIMAL/FLOAT → double, STRING → string, BOOLEAN → bool,
  *    OBJECT/ARRAY/NULL as named, everything else → other) — the same
  *    alphabet [[graft.schema.JsonSchemaGate]]'s path checks use;
  *  - `kind = "type"`: any element whose canonical type fails the
  *    declared one (number admits int|double, integer only int, boolean
  *    folds to bool) violates;
  *  - `kind = "enum"`: TYPED membership (r13) — a string element checks
  *    against the enum's string members, an int element against its
  *    integer members by EXACT long compare, a double element against its
  *    double members (the correctly-rounded double both engines parse
  *    from the same JSON text), a bool element against its boolean
  *    members; an element of a checkable scalar type with NO same-type
  *    members violates (enum [1,2,3] rejects "four" as well as 4);
  *    object/array/null elements stay the type check's business.
  *    Cross-type numeric equality (1 matching an enum literal 1.0) is
  *    out of subset, documented;
  *  - `kind = "minlen"` / `"maxlen"`: checked only on STRING elements;
  *    lengths count CODE POINTS (Spark `length` ≡ DuckDB `length`);
  *  - `kind = "min"` / `"max"`: checked only on int|double elements,
  *    compared as doubles (the correctly-rounded widening `cast(variant
  *    as double)` performs);
  *  - `kind = "missing"` (r13, arrays of OBJECTS): any OBJECT element
  *    lacking the required `field` violates — a JSON-null field is
  *    PRESENT (the fieldtype check's business), non-object elements are
  *    the items-type check's business;
  *  - `kind = "fieldtype"` (r13): any OBJECT element whose PRESENT
  *    `field` fails the declared canonical type violates (a present JSON
  *    null field has canonical type "null" and fails every declared
  *    type, matching the path-level TypeIs convention);
  *  - a JSON null element has canonical type "null" (violates any
  *    declared type, invisible to value checks); a SQL-null element slot
  *    (not producible from `try_variant_get`'s array extraction, handled
  *    defensively) is treated the same;
  *  - null ARRAY input → null (the `exists(null, …)` convention; the
  *    caller guards on the node being array-typed anyway).
  */
case class VariantItemsViolates(child: Expression, kind: String,
                                expected: String, enumStrs: Seq[String],
                                enumLongs: Seq[Long], enumDoubles: Seq[Double],
                                enumBools: Seq[Boolean],
                                bound: Double, field: String)
    extends UnaryExpression with ExpectsInputTypes {

  require(Seq("type", "enum", "min", "max", "minlen", "maxlen",
    "missing", "fieldtype").contains(kind),
    s"variant_items_violates: unknown kind '$kind'")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(VariantType))
  override def dataType: DataType = BooleanType
  override def prettyName: String = "variant_items_violates"
  override def nullable: Boolean = true

  @transient private lazy val strSet: Set[String] = enumStrs.toSet
  @transient private lazy val longSet: Set[Long] = enumLongs.toSet
  @transient private lazy val dblSet: Set[Double] = enumDoubles.toSet
  @transient private lazy val boolSet: Set[Boolean] = enumBools.toSet

  /** canonical-alphabet fold of one element's variant type tag. */
  private def canon(v: Variant): String = v.getType match {
    case VariantUtil.Type.OBJECT  => "object"
    case VariantUtil.Type.ARRAY   => "array"
    case VariantUtil.Type.NULL    => "null"
    case VariantUtil.Type.BOOLEAN => "bool"
    case VariantUtil.Type.LONG    => "int"
    case VariantUtil.Type.STRING  => "string"
    case VariantUtil.Type.DOUBLE | VariantUtil.Type.DECIMAL |
         VariantUtil.Type.FLOAT   => "double"
    case _                        => "other"
  }

  private def asDouble(v: Variant): Double = v.getType match {
    case VariantUtil.Type.LONG    => v.getLong.toDouble
    case VariantUtil.Type.DOUBLE  => v.getDouble
    case VariantUtil.Type.DECIMAL => v.getDecimal.doubleValue()
    case VariantUtil.Type.FLOAT   => v.getFloat.toDouble
    case t => throw new IllegalStateException(s"non-numeric variant $t")
  }

  private def typeMatches(t: String): Boolean = expected match {
    case "number"  => t == "int" || t == "double"
    case "integer" => t == "int"
    case "boolean" => t == "bool"
    case other     => t == other
  }

  /** typed enum membership of one element — mirrors the path-level
    * [[graft.schema.JsonSchemaGate]] EnumIn buckets exactly.
    */
  private def enumViolates(c: String, v: Variant): Boolean = c match {
    case "string" => !strSet(v.getString)
    case "int"    => !longSet(v.getLong)
    case "double" => !dblSet(asDouble(v))
    case "bool"   => !boolSet(v.getBoolean)
    case _        => false // object/array/null: the type check's business
  }

  /** Shared eval/codegen body (public for the generated code). */
  def doViolates(arr: ArrayData): Boolean = {
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) {
        // a SQL-null slot reads as canonical "null": visible to the type
        // check only (value checks skip non-matching runtime types)
        if (kind == "type" && !typeMatches("null")) return true
      } else {
        val vv = arr.getVariant(i)
        val v = new Variant(vv.getValue, vv.getMetadata)
        val c = canon(v)
        kind match {
          case "type" =>
            if (!typeMatches(c)) return true
          case "enum" =>
            if (enumViolates(c, v)) return true
          case "min" =>
            if ((c == "int" || c == "double") && asDouble(v) < bound)
              return true
          case "max" =>
            if ((c == "int" || c == "double") && asDouble(v) > bound)
              return true
          case "minlen" =>
            if (c == "string") {
              val s = v.getString
              if (s.codePointCount(0, s.length) < bound.toInt) return true
            }
          case "maxlen" =>
            if (c == "string") {
              val s = v.getString
              if (s.codePointCount(0, s.length) > bound.toInt) return true
            }
          case "missing" =>
            if (c == "object" && v.getFieldByKey(field) == null) return true
          case "fieldtype" =>
            if (c == "object") {
              val f = v.getFieldByKey(field)
              if (f != null && !typeMatches(canon(f))) return true
            }
        }
      }
      i += 1
    }
    false
  }

  override def nullSafeEval(v: Any): Any = doViolates(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val self = ctx.addReferenceObj("itemsCheck", this,
        classOf[VariantItemsViolates].getName)
      s"${ev.value} = $self.doViolates($in);"
    })

  override protected def withNewChildInternal(newChild: Expression): VariantItemsViolates =
    copy(child = newChild)
}
