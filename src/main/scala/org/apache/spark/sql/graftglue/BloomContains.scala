package org.apache.spark.sql.graftglue

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe of a string column against a pre-built Bloom filter —
  * the corpus-side pre-filter of [[graft.dedup.Dedup.decontaminateBloom]].
  *
  * The filter arrives as a reference object (it ships inside the task
  * binary, which Spark broadcasts once per stage), so a ~1 GB sketch of a
  * 10⁹-element benchmark shingle set probes at one hash-chain per row
  * inside whole-stage codegen — no join, no shuffle, no per-row boxing
  * beyond the byte-copy the sketch API requires. Probing hashes the raw
  * UTF-8 bytes (`mightContainBinary` over `UTF8String.getBytes`), the same
  * bytes `BloomFilter.putString`/`stat.bloomFilter` hash on insert, so a
  * contained value can never probe false (no false negatives — the
  * guarantee the exact verify join downstream relies on).
  *
  * Null input → null, matching SQL predicate semantics (a null shingle is
  * not-true and drops out of the candidate set).
  */
case class BloomContains(child: Expression, bf: BloomFilter)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_contains"

  override def nullSafeEval(v: Any): Any =
    bf.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val ref = ctx.addReferenceObj("bf", bf, classOf[BloomFilter].getName)
      s"${ev.value} = $ref.mightContainBinary($in.getBytes());"
    })

  override protected def withNewChildInternal(newChild: Expression): BloomContains =
    copy(child = newChild)
}
