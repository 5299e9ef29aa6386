package org.apache.spark.sql.graftglue

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (NFC/NFD/NFKC/NFKD) as a native codegen expression.
  *
  * Spark has no built-in normalizer, and a Scala UDF would (a) drop the
  * whole projection out of whole-stage codegen and (b) pay
  * serializer/deserializer round trips per row. This is a thin wrapper over
  * `java.text.Normalizer` — the JDK's implementation of UAX #15 — with the
  * fast path that matters at corpus scale: already-normalized strings
  * (ASCII-only text, i.e. the overwhelming majority of crawled English) are
  * detected by `Normalizer.isNormalized`'s quick check and returned as-is —
  * the common row costs a scan and no copy.
  *
  * Web text carries the SAME grapheme in composed (U+00E1) and decomposed
  * (U+0061 U+0301) forms; exact/near dedup, shingle hashing, and vocabulary
  * building all treat those as distinct tokens unless the corpus is
  * normalized first — the normalize-before-anything step every published
  * pipeline (CCNet, Gopher, Dolma) runs. NFC is the storage/dedup form;
  * NFKC additionally folds compatibility characters (ﬁ → fi, fullwidth →
  * ASCII) — the usual tokenizer-prep form.
  *
  * Determinism: normalization is a pure function of the code-point
  * sequence, defined by the Unicode standard — DuckDB's `nfc_normalize`
  * reproduces the NFC form bit-for-bit (oracled as q_nfc_normalize).
  * Null input → null.
  */
case class NormalizeUnicode(child: Expression, form: String)
    extends UnaryExpression with ExpectsInputTypes {

  require(Seq("NFC", "NFD", "NFKC", "NFKD").contains(form),
    s"normalize_unicode: unknown form '$form' (need NFC/NFD/NFKC/NFKD)")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_unicode"

  @transient private lazy val f: Normalizer.Form = Normalizer.Form.valueOf(form)

  /** Shared eval/codegen body (public: the generated code calls it through
    * a reference object to `this`).
    */
  def doNormalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(Normalizer.normalize(str, f))
  }

  override def nullSafeEval(v: Any): Any = doNormalize(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val self = ctx.addReferenceObj("normalizeUnicode", this,
        classOf[NormalizeUnicode].getName)
      s"${ev.value} = $self.doNormalize($in);"
    })

  override protected def withNewChildInternal(newChild: Expression): NormalizeUnicode =
    copy(child = newChild)
}
