package org.apache.spark.sql.graftglue

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType, VariantType}
import org.apache.spark.types.variant.Variant
import org.apache.spark.unsafe.types.UTF8String

/** Canonical JSON types of MANY object paths of one variant, in ONE
  * expression (r15 — the JSON-Schema gate's wide-schema fix).
  *
  * The gate previously compiled one type-introspection Column per
  * distinct path (`try_variant_get` + `is_variant_null` +
  * `schema_of_variant` + an 8-way CASE ≈ 25 expression nodes each). At
  * real log-schema widths that shape hits a hard cliff: a 400-property
  * schema generated past janino's 64 KB method limit, whole-stage
  * codegen fell back to interpreted evaluation, and the per-row wall
  * went superlinear (ScaleBench `gate_width`: 105 s for 200k rows at
  * width 400 vs 14 s at width 100). This native walks the variant once
  * per row and returns `array<string>` of canonical types — one
  * expression node regardless of width; each check then reads its
  * path's slot with a 2-node `element_at`.
  *
  * Semantics per path, element for element ≡ the Column spelling the
  * gate used before (the adjudicated `schema_of_variant` ≡
  * encoding-tag equivalence, the same fold [[VariantItemsViolates]]
  * classifies elements with):
  *  - slot = SQL NULL when the path is ABSENT — a missing field, or a
  *    non-object intermediate (`try_variant_get` returns NULL there);
  *  - else the canonical alphabet {object, array, null, bool, int,
  *    double, string, other} — a present JSON null is "null", not
  *    absent;
  *  - `paths` are the gate's compiled field chains (Nil = the root
  *    `$`); names passed the gate's identifier guard, so no escaping.
  *  - NULL variant input (a malformed message) → NULL array; every
  *    downstream `element_at` read folds to NULL, exactly the per-path
  *    Columns' behavior on a failed parse.
  */
case class VariantPathTypes(child: Expression, paths: Seq[Seq[String]])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(VariantType)
  override def dataType: DataType = ArrayType(StringType)
  override def prettyName: String = "variant_path_types"
  override def nullable: Boolean = true

  @transient private lazy val pathArr: Array[Array[String]] =
    paths.map(_.toArray).toArray

  /** interned canonical-name UTF8Strings (one allocation per instance,
    * shared across rows — GenericArrayData holds references).
    */
  @transient private lazy val canonU: Map[String, UTF8String] =
    Seq("object", "array", "null", "bool", "int", "double", "string",
      "other").map(s => s -> UTF8String.fromString(s)).toMap

  def doTypes(v: Any): GenericArrayData = {
    val vv = v.asInstanceOf[org.apache.spark.unsafe.types.VariantVal]
    val root = new Variant(vv.getValue, vv.getMetadata)
    val out = new Array[Any](pathArr.length)
    var i = 0
    while (i < pathArr.length) {
      val segs = pathArr(i)
      var cur: Variant = root
      var j = 0
      while (cur != null && j < segs.length) {
        cur = if (VariantWalk.canon(cur) == "object")
          cur.getFieldByKey(segs(j)) else null
        j += 1
      }
      out(i) = if (cur == null) null else canonU(VariantWalk.canon(cur))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = doTypes(v)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val self = ctx.addReferenceObj("pathTypes", this,
        classOf[VariantPathTypes].getName)
      s"${ev.value} = $self.doTypes($in);"
    })

  override protected def withNewChildInternal(newChild: Expression): VariantPathTypes =
    copy(child = newChild)
}
