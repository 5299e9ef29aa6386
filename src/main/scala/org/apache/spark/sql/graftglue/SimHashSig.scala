package org.apache.spark.sql.graftglue

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused simhash fingerprint: `simhash_sig(tokens, bits)` = the
  * bit-majority-vote fingerprint over the DISTINCT tokens, where each
  * token hashes to the top `bits` bits of its md5 (the same
  * `conv(substring(md5(tok), 1, 15), 16, 10)` value as
  * `Text.md5Hash64`) and fingerprint bit b is set iff more than half the
  * distinct tokens have bit b set — EXACTLY the relational
  * explode + groupBy(id) + 60 conditional sums that
  * [[graft.dedup.Dedup.simhash]] previously planned.
  *
  * Why an expression: like [[MinHashSig]], the vote has no cross-row
  * dependency, so the whole computation is a projection; the relational
  * form shuffled a 60-column vote table per corpus for nothing. Empty /
  * all-null token arrays yield NULL (the relational form produced no
  * group row).
  */
case class SimHashSig(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType), IntegerType)
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_sig"
  override def nullable: Boolean = true

  /** Row kernel (also called from generated code). Returns null (boxed)
    * when no non-null token exists.
    */
  def compute(toksRaw: Any, bits: Int): java.lang.Long = {
    if (bits <= 0 || bits > 60) return null
    val toks = toksRaw.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val md = SimHashSig.digests.get()
    val seen = new java.util.HashSet[UTF8String]()
    val votes = new Array[Int](bits)
    var distinct = 0
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val tok = toks.getUTF8String(i)
        if (seen.add(tok.clone())) { // clone: UTF8String may alias a reused buffer
          distinct += 1
          md.reset()
          val d = md.digest(tok.getBytes)
          // top 60 bits of the digest = the 15-hex-char md5Hash64 value
          var h = 0L
          var bi = 0
          while (bi < 7) { h = (h << 8) | (d(bi) & 0xffL); bi += 1 }
          h = (h << 4) | ((d(7) >> 4) & 0xfL)
          var b = 0
          while (b < bits) {
            if ((h & (1L << b)) != 0L) votes(b) += 1
            b += 1
          }
        }
      }
      i += 1
    }
    if (distinct == 0) return null
    var fp = 0L
    var b = 0
    while (b < bits) {
      if (votes(b) * 2 > distinct) fp |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(fp)
  }

  override def nullSafeEval(l: Any, r: Any): Any = compute(l, r.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, bitsVar) => {
      val self = ctx.addReferenceObj("simhashSelf", this, classOf[SimHashSig].getName)
      val tmp = ctx.freshName("simhashTmp")
      s"""
         |java.lang.Long $tmp = $self.compute($a, $bitsVar);
         |if ($tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $tmp.longValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): SimHashSig =
    copy(left = newLeft, right = newRight)
}

object SimHashSig {
  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }
}
