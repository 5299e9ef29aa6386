package org.apache.spark.sql.graftglue

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, Decimal, DoubleType, FloatType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Spark extension point registration for graft's custom expressions —
  * makes every native expression available to pure-SQL users (`SELECT
  * float_vector_dot(a, b)`) in addition to the Column API, and injects the
  * [[FuseCountInSet]] optimizer rule so the natural HOF stopword-count
  * shape fuses into whole-stage codegen for SQL/config users too:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)           // programmatic
  * // or: spark.sql.extensions=org.apache.spark.sql.graftglue.GraftExtensions
  * }}}
  *
  * Expressions parameterized by driver-side model state (the stopword set,
  * a BPE merge table, LSH planes, a centroid) take those parameters as
  * FOLDABLE arguments — evaluated once at resolution time into the
  * expression's reference objects, exactly what the Scala API embeds. A
  * non-literal model argument is a planning error (the model must be known
  * to build the generated code), reported as such at analysis.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  import GraftExtensions._

  override def apply(ext: SparkSessionExtensions): Unit = {
    register(ext, "float_vector_dot", classOf[FloatVectorDot], 2)(c =>
      FloatVectorDot(c.head, c(1)))
    register(ext, "word_shingles", classOf[WordShingles], 2)(c =>
      WordShingles(c.head, c(1)))
    register(ext, "minhash_sig", classOf[MinHashSig], 2)(c =>
      MinHashSig(c.head, c(1)))
    register(ext, "simhash_sig", classOf[SimHashSig], 2)(c =>
      SimHashSig(c.head, c(1)))
    register(ext, "count_in_set", classOf[CountInSet], 2)(c =>
      // NULL set members dropped: they can never satisfy the membership
      // predicate (see FuseCountInSet), so counts are unchanged.
      CountInSet(c.head, litStrings(c(1), "count_in_set", keepNulls = false)))
    register(ext, "chained_replace", classOf[ChainedReplace], 3) { c =>
      val from = litStrings(c(1), "chained_replace", keepNulls = true)
      val to = litStrings(c(2), "chained_replace", keepNulls = true)
      require(from.length == to.length,
        s"chained_replace: ${from.length} search strings vs ${to.length} replacements")
      require(from.forall(_ != null) && to.forall(_ != null),
        "chained_replace: NULL search/replacement string")
      ChainedReplace(c.head, from.zip(to))
    }
    register(ext, "interleave_bits", classOf[InterleaveBits], 2)(c =>
      InterleaveBits(c.head, litInt(c(1), "interleave_bits")))
    register(ext, "quantize_vec", classOf[QuantizeVec], 2)(c =>
      QuantizeVec(c.head, litDouble(c(1), "quantize_vec")))
    register(ext, "sq_dist_lit", classOf[SqDistLit], 2)(c =>
      SqDistLit(c.head, litDoubles(c(1), "sq_dist_lit")))
    register(ext, "hyperplane_sig", classOf[HyperplaneSig], 2)(c =>
      HyperplaneSig(c.head, litMatrix(c(1), "hyperplane_sig")))
    register(ext, "mat_vec_mul", classOf[MatVecMul], 2)(c =>
      MatVecMul(c.head, litMatrix(c(1), "mat_vec_mul")))
    register(ext, "min_dist_to_set", classOf[MinDistToSet], 2)(c =>
      MinDistToSet(c.head, litMatrix(c(1), "min_dist_to_set")))
    register(ext, "nearest_center", classOf[NearestCenter], 3)(c =>
      NearestCenter(c.head, litInts(c(1), "nearest_center"),
        litMatrix(c(2), "nearest_center")))
    register(ext, "dist_map", classOf[DistMap], 3)(c =>
      DistMap(c.head, litInts(c(1), "dist_map"), litMatrix(c(2), "dist_map")))
    register(ext, "probe_cells", classOf[ProbeCells], 4)(c =>
      ProbeCells(c.head,
        litStrings(c(1), "probe_cells", keepNulls = false).toArray,
        litMatrix(c(2), "probe_cells"), litInt(c(3), "probe_cells")))
    // aggregate: SELECT gram_sum(vec, scale) — exact quantized scatter sums
    register(ext, "gram_sum", classOf[GramSum], 2)(c =>
      GramSum(c.head, litDouble(c(1), "gram_sum")))
    register(ext, "upper_tri_pairs", classOf[UpperTriPairs], 1)(c =>
      UpperTriPairs(c.head))
    // aggregate: SELECT top_k_struct(score, id, k) — the bounded top-k
    // (FunctionBuilder returning an AggregateFunction registers like any
    // expression; the analyzer wraps it in an AggregateExpression)
    register(ext, "top_k_struct", classOf[TopKStruct], 3)(c =>
      TopKStruct(c.head, c(1), litInt(c(2), "top_k_struct")))
    register(ext, "bottom_k_struct", classOf[TopKStruct], 3)(c =>
      TopKStruct(c.head, c(1), litInt(c(2), "bottom_k_struct"), smallest = true))
    // aggregate: SELECT kmv_set(hash, k) — bounded distinct-k-min sketch
    register(ext, "kmv_set", classOf[KmvSet], 2)(c =>
      KmvSet(c.head, litInt(c(1), "kmv_set")))
    register(ext, "max_sim_score", classOf[MaxSimScore], 2)(c =>
      MaxSimScore(c.head, c(1)))
    register(ext, "sum_vecs", classOf[SumVecs], 1)(c => SumVecs(c.head))
    register(ext, "double_vector_dot", classOf[DoubleVectorDot], 2)(c =>
      DoubleVectorDot(c.head, c(1)))
    register(ext, "normalize_unicode", classOf[NormalizeUnicode], 2)(c =>
      NormalizeUnicode(c.head, litString(c(1), "normalize_unicode")))
    register(ext, "clean_lines", classOf[CleanLines], 4)(c =>
      CleanLines(c.head, litInt(c(1), "clean_lines"),
        litString(c(2), "clean_lines"),
        litStrings(c(3), "clean_lines", keepNulls = false)))
    ext.injectOptimizerRule(_ => FuseCountInSet)
  }
}

private object GraftExtensions {

  private def register(ext: SparkSessionExtensions, name: String,
                       cls: Class[_], arity: Int)(
      build: Seq[Expression] => Expression): Unit =
    ext.injectFunction((
      new FunctionIdentifier(name),
      new ExpressionInfo(cls.getName, name),
      (children: Seq[Expression]) => {
        require(children.length == arity,
          s"$name takes exactly $arity argument${if (arity == 1) "" else "s"}")
        build(children)
      }))

  private def litValue(e: Expression, fn: String): Any = {
    require(e.foldable, s"$fn: model argument must be a literal, got ${e.sql}")
    val v = e.eval()
    require(v != null, s"$fn: model argument must not be NULL")
    v
  }

  private def asDouble(v: Any, fn: String): Double = v match {
    case d: Double => d
    case f: Float => f.toDouble
    case i: Int => i.toDouble
    case l: Long => l.toDouble
    case s: Short => s.toDouble
    case b: Byte => b.toDouble
    case d: Decimal => d.toDouble
    case other => throw new IllegalArgumentException(
      s"$fn: expected a numeric literal, got $other")
  }

  private def elementType(e: Expression, fn: String): DataType = e.dataType match {
    case ArrayType(et, _) => et
    case other => throw new IllegalArgumentException(
      s"$fn: expected an array literal, got ${other.catalogString}")
  }

  /** Foldable array<string> → Seq[String] (null members kept or dropped). */
  private def litStrings(e: Expression, fn: String, keepNulls: Boolean): Seq[String] = {
    require(elementType(e, fn) == StringType,
      s"$fn: expected array<string>, got ${e.dataType.catalogString}")
    val raw = litValue(e, fn).asInstanceOf[ArrayData]
      .toArray[UTF8String](StringType).toSeq
    val mapped = raw.map(s => if (s == null) null else s.toString)
    if (keepNulls) mapped else mapped.filter(_ != null)
  }

  private def litInt(e: Expression, fn: String): Int =
    asDouble(litValue(e, fn), fn).toInt

  /** Foldable string literal → String. */
  private def litString(e: Expression, fn: String): String = {
    require(e.dataType == StringType,
      s"$fn: expected a string literal, got ${e.dataType.catalogString}")
    litValue(e, fn).asInstanceOf[UTF8String].toString
  }

  /** Foldable array<numeric> → Array[Int]; NULL elements rejected. */
  private def litInts(e: Expression, fn: String): Array[Int] =
    litDoubles(e, fn).map(_.toInt)

  private def litDouble(e: Expression, fn: String): Double =
    asDouble(litValue(e, fn), fn)

  /** Foldable array<numeric> → Array[Double]; NULL elements rejected. */
  private def litDoubles(e: Expression, fn: String): Array[Double] = {
    val et = elementType(e, fn)
    litValue(e, fn).asInstanceOf[ArrayData].toArray[Any](et).map { v =>
      require(v != null, s"$fn: NULL element in the literal vector")
      asDouble(v, fn)
    }
  }

  /** Foldable array<array<numeric>> → Array[Array[Double]]. */
  private def litMatrix(e: Expression, fn: String): Array[Array[Double]] = {
    val rowType = elementType(e, fn)
    val et = rowType match {
      case ArrayType(inner, _) => inner
      case other => throw new IllegalArgumentException(
        s"$fn: expected array<array<double>>, got array<${other.catalogString}>")
    }
    litValue(e, fn).asInstanceOf[ArrayData].toArray[Any](rowType).map { row =>
      require(row != null, s"$fn: NULL row in the literal matrix")
      row.asInstanceOf[ArrayData].toArray[Any](et).map { v =>
        require(v != null, s"$fn: NULL element in the literal matrix")
        asDouble(v, fn)
      }
    }
  }
}
