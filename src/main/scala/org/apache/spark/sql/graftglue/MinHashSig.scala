package org.apache.spark.sql.graftglue

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused minhash signature: `minhash_sig(tokens, k)` = for each seed
  * `s in [0, k)`, the minimum over the tokens of `md5(s + ":" + token)`
  * as a lowercase hex string — EXACTLY the value of the relational
  * formulation `groupBy(id).agg(min(md5(concat(s, ':', tok))) ...)` that
  * [[graft.dedup.Dedup.minhashSignature]] documents (hex min ≡ unsigned
  * digest-byte min, so the comparison runs on raw digests and only the k
  * winners hex-encode).
  *
  * Why an expression: the relational shape explodes the corpus to one row
  * per token and shuffles (id, k mins) through a hash aggregate. Per-doc
  * signatures have no cross-row dependency, so the whole computation is a
  * PROJECTION — this expression keeps it one (no explode, no exchange;
  * the only remaining cost is the same k·tokens md5 work, now in a tight
  * loop with a thread-local digest). At 100 TB that removes the only
  * corpus-sized shuffle of the minhash/LSH pipeline.
  *
  * Empty or all-null token arrays yield NULL (no signature), mirroring
  * the relational form where zero exploded rows produce no group.
  * Duplicate tokens need no dedup: min() is idempotent under repeats.
  */
case class MinHashSig(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType), IntegerType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  override def nullable: Boolean = true

  /** Row kernel (also called from generated code via a bound reference). */
  def compute(toksRaw: Any, k: Int): GenericArrayData = {
    if (k <= 0) return null
    val toks = toksRaw.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val md = MinHashSig.digests.get()
    val prefixes = MinHashSig.seedPrefixes(k)
    val mins = new Array[Array[Byte]](k)
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val tok = toks.getUTF8String(i).getBytes
        var s = 0
        while (s < k) {
          md.reset()
          md.update(prefixes(s))
          md.update(tok)
          val d = md.digest()
          if (mins(s) == null || MinHashSig.unsignedLt(d, mins(s))) mins(s) = d
          s += 1
        }
      }
      i += 1
    }
    if (mins(0) == null) return null // no non-null token contributed
    val out = new Array[Any](k)
    var s = 0
    while (s < k) { out(s) = UTF8String.fromString(MinHashSig.hex(mins(s))); s += 1 }
    new GenericArrayData(out)
  }

  override def nullSafeEval(l: Any, r: Any): Any = compute(l, r.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, kVar) => {
      val self = ctx.addReferenceObj("minhashSelf", this, classOf[MinHashSig].getName)
      val gad = classOf[GenericArrayData].getName
      s"""
         |$gad ${ev.value}Tmp = $self.compute($a, $kVar);
         |if (${ev.value}Tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}Tmp;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): MinHashSig =
    copy(left = newLeft, right = newRight)
}

object MinHashSig {
  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  // seed prefix byte arrays ("0:", "1:", ...) cached per k (tiny, grows to
  // the largest k seen in the JVM)
  @volatile private var prefixCache: Array[Array[Byte]] = Array.empty
  private def seedPrefixes(k: Int): Array[Array[Byte]] = {
    val cached = prefixCache
    if (cached.length >= k) cached
    else synchronized {
      if (prefixCache.length < k)
        prefixCache = Array.tabulate(k)(s => (s.toString + ":").getBytes("UTF-8"))
      prefixCache
    }
  }

  private def unsignedLt(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val ai = a(i) & 0xff; val bi = b(i) & 0xff
      if (ai != bi) return ai < bi
      i += 1
    }
    false
  }

  private val hexChars = "0123456789abcdef".toCharArray
  private def hex(d: Array[Byte]): String = {
    val out = new Array[Char](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(i * 2) = hexChars((d(i) >> 4) & 0xf)
      out(i * 2 + 1) = hexChars(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }
}
