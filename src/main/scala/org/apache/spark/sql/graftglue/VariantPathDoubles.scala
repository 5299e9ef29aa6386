package org.apache.spark.sql.graftglue

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, VariantType}
import org.apache.spark.types.variant.{Variant, VariantUtil}
import org.apache.spark.unsafe.types.VariantVal

/** Numeric values of MANY object paths of one variant, in ONE expression
  * (r15 — [[VariantPathTypes]]'s sibling, the second half of the
  * JSON-Schema gate's wide-schema fix).
  *
  * Every numeric-bound check (`minimum`/`maximum`/`exclusive*`/
  * `multipleOf`) compiled a `cast(try_variant_get(…) as double)` of its
  * own — at real log-schema widths those casts were the largest
  * remaining per-check expression class after the type columns were
  * batched. One walk per row returns `array<double>`; each bound check
  * reads its slot with a 2-node `element_at`.
  *
  * Slot semantics, matching what the guarded cast produced exactly
  * where it was CONSUMED (bound checks fire only on int|double-typed
  * nodes):
  *  - a present int/double/decimal/float node → the correctly-rounded
  *    double widening ([[VariantWalk.asDouble]], the same fold the
  *    per-element native compares bounds with);
  *  - anything else (absent path, non-object intermediate, non-numeric
  *    node, JSON null) → SQL NULL — the type guard prevents any bound
  *    check from reading these slots, and NULL comparisons fold to
  *    no-violation anyway;
  *  - NULL variant input (malformed message) → NULL array.
  */
case class VariantPathDoubles(child: Expression, paths: Seq[Seq[String]])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(VariantType)
  override def dataType: DataType = ArrayType(DoubleType)
  override def prettyName: String = "variant_path_doubles"
  override def nullable: Boolean = true

  @transient private lazy val pathArr: Array[Array[String]] =
    paths.map(_.toArray).toArray

  def doValues(v: Any): GenericArrayData = {
    val vv = v.asInstanceOf[VariantVal]
    val root = new Variant(vv.getValue, vv.getMetadata)
    val out = new Array[Any](pathArr.length)
    var i = 0
    while (i < pathArr.length) {
      val segs = pathArr(i)
      var cur: Variant = root
      var j = 0
      while (cur != null && j < segs.length) {
        cur = if (cur.getType == VariantUtil.Type.OBJECT)
          cur.getFieldByKey(segs(j)) else null
        j += 1
      }
      out(i) =
        if (cur == null) null
        else cur.getType match {
          case VariantUtil.Type.LONG | VariantUtil.Type.DOUBLE |
               VariantUtil.Type.DECIMAL | VariantUtil.Type.FLOAT =>
            java.lang.Double.valueOf(VariantWalk.asDouble(cur))
          case _ => null
        }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = doValues(v)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val self = ctx.addReferenceObj("pathDoubles", this,
        classOf[VariantPathDoubles].getName)
      s"${ev.value} = $self.doValues($in);"
    })

  override protected def withNewChildInternal(newChild: Expression): VariantPathDoubles =
    copy(child = newChild)
}
