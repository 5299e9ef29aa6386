package graft.json

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TreeHorn-equivalent nested-document queries (reference
  * `metalpipe/utils/treehorn.py`).
  *
  * The reference walks every JSON document node-by-node per message
  * (`treehorn.py:345-500` traced traversals; `GoDown ... UNTIL HAS KEY k`)
  * — O(tree) Python work per row. graft resolves the traversal ONCE against
  * the Catalyst schema at plan time, then compiles it to a `select`/
  * `explode` chain: per-row work is a codegen'd projection, and arrays
  * explode in parallel across the cluster.
  */
object TreeWalk {

  /** A resolved path step: a struct field hop, optionally through an array
    * (which requires an explode).
    */
  final case class Step(field: String, isArray: Boolean)

  /** All schema paths (as step lists) whose terminal field name == `key`.
    * Plan-time only — no data is touched.
    */
  def pathsToKey(schema: StructType, key: String): Seq[Seq[Step]] = {
    def walk(st: StructType, prefix: Seq[Step]): Seq[Seq[Step]] =
      st.fields.toIndexedSeq.flatMap { f =>
        val (inner, isArr) = f.dataType match {
          case ArrayType(et, _) => (et, true)
          case dt               => (dt, false)
        }
        val here = if (f.name == key) Seq(prefix :+ Step(f.name, isArr)) else Nil
        inner match {
          case s: StructType => here ++ walk(s, prefix :+ Step(f.name, isArr))
          case _             => here
        }
      }
    walk(schema, Nil)
  }

  /** `GO DOWN UNTIL HAS KEY key AS label` (reference `treehorn.py:186,285`):
    * descend to the FIRST (depth-first, declaration-order) struct that has
    * field `key`, exploding any arrays on the way, and surface that struct's
    * fields flattened with prefix `label`.
    *
    * `keep` columns from the root are carried alongside (the reference keeps
    * the whole traced document; carrying explicit root columns is the
    * columnar equivalent and lets Catalyst prune everything else).
    */
  def goDownUntilKey(df: DataFrame, key: String, label: String,
                     keep: Seq[String] = Nil): DataFrame = {
    val paths = pathsToKey(df.schema, key)
    require(paths.nonEmpty, s"no path to key '$key' in schema")
    val steps = paths.head.dropRight(1) // steps to the PARENT struct of `key`
    // Walk down, exploding arrays as they appear; `cur` names the current node.
    var out = df
    var cur: Option[String] = None
    steps.zipWithIndex.foreach { case (Step(f, isArr), i) =>
      val src = cur.fold(col(f))(c => col(c).getField(f))
      val alias = s"__tw$i"
      out = out.withColumn(alias, if (isArr) explode(src) else src)
      cur = Some(alias)
    }
    val parent: Column = cur.fold(lit(null).cast(StringType))(col)
    // Terminal hop: if `key` itself is an array-of-struct, explode it too.
    val parentType = steps.foldLeft(df.schema: DataType) { (dt, s) =>
      dt match {
        case st: StructType => st(s.field).dataType match {
          case ArrayType(et, _) => et
          case other            => other
        }
        case other => other
      }
    }
    val keyIsArray = parentType match {
      case st: StructType => st.fields.find(_.name == key).exists(_.dataType.isInstanceOf[ArrayType])
      case _              => false
    }
    val rootCols = keep.map(col)
    val keyCol = if (steps.isEmpty) col(key) else parent.getField(key)
    val terminal = if (keyIsArray) explode(keyCol) else keyCol
    out.select(rootCols :+ terminal.as(s"${label}_$key"): _*)
  }

  /** `GO DOWN UNTIL HAS KEY key AS label` — one labeled traversal of a
    * multi-capture query (reference `treehorn.py:20-170` + `query_text.mtl`).
    */
  final case class Capture(key: String, label: String)

  /** Labeled multi-capture + projection (F3): run several `GO DOWN UNTIL HAS
    * KEY` traversals over the same document, then `SELECT label.field AS
    * name`. Traversals sharing a path prefix reuse the same explodes;
    * divergent traversals combine relationally (cross product within the
    * document — TreeHorn's semantics for independent labels).
    *
    * `select` entries are `"label.field" -> outName`; `keep` carries root
    * columns through unchanged.
    */
  def extract(df: DataFrame, captures: Seq[Capture],
              select: Seq[(String, String)], keep: Seq[String] = Nil): DataFrame = {
    var out = df
    var counter = 0
    val aliasOf = scala.collection.mutable.Map[Vector[String], String]()

    def descend(steps: Seq[Step]): Option[String] = {
      var cur: Option[String] = None
      var prefix = Vector.empty[String]
      steps.foreach { case Step(f, isArr) =>
        prefix :+= f
        aliasOf.get(prefix) match {
          case Some(a) => cur = Some(a)
          case None =>
            val src = cur.fold(col(f))(c => col(c).getField(f))
            val alias = s"__cap$counter"; counter += 1
            out = out.withColumn(alias, if (isArr) explode(src) else src)
            aliasOf(prefix) = alias
            cur = Some(alias)
        }
      }
      cur
    }

    val labelAlias: Map[String, Option[String]] = captures.map { c =>
      val paths = pathsToKey(df.schema, c.key)
      require(paths.nonEmpty, s"no path to key '${c.key}' in schema")
      c.label -> descend(paths.head.dropRight(1))
    }.toMap

    val projected = select.map { case (ref, outName) =>
      val (label, field) = ref.span(_ != '.') match { case (l, f) => (l, f.drop(1)) }
      require(labelAlias.contains(label), s"unknown label '$label' in select")
      labelAlias(label).fold(col(field))(a => col(a).getField(field)).as(outName)
    }
    out.select(keep.map(col) ++ projected: _*)
  }

  /** Entity table for one capture (F4): the captured struct's fields,
    * deduplicated on its id field — reference `treehorn.py:504` entity
    * extraction (`modelling/logic.py`).
    */
  def entities(df: DataFrame, capture: Capture, idField: String): DataFrame =
    flattenAtKey(df, capture.key, capture.label)
      .dropDuplicates(s"${capture.label}_$idField")

  /** Relation (edge) table between two captures (F4): distinct
    * (src_id, dst_id, rel) triples wherever both labels co-occur in a
    * document — graph-ready output.
    */
  def relations(df: DataFrame, src: Capture, srcId: String,
                dst: Capture, dstId: String, relName: String): DataFrame =
    extract(df, Seq(src, dst), Seq(
        s"${src.label}.$srcId" -> "src_id",
        s"${dst.label}.$dstId" -> "dst_id"))
      .withColumn("rel", lit(relName))
      .distinct()

  /** Flatten ALL fields of the first struct that HAS `key` (the labeled
    * capture: `?label.SELECT *`). Arrays on the path explode.
    */
  def flattenAtKey(df: DataFrame, key: String, label: String,
                   keep: Seq[String] = Nil): DataFrame = {
    val paths = pathsToKey(df.schema, key)
    require(paths.nonEmpty, s"no path to key '$key' in schema")
    val steps = paths.head.dropRight(1)
    var out = df
    var cur: Option[String] = None
    steps.zipWithIndex.foreach { case (Step(f, isArr), i) =>
      val src = cur.fold(col(f))(c => col(c).getField(f))
      val alias = s"__tw$i"
      out = out.withColumn(alias, if (isArr) explode(src) else src)
      cur = Some(alias)
    }
    val parentType = steps.foldLeft(df.schema: DataType) { (dt, s) =>
      dt match {
        case st: StructType => st(s.field).dataType match {
          case ArrayType(et, _) => et
          case other            => other
        }
        case other => other
      }
    }
    val fields = parentType match {
      case st: StructType => st.fieldNames.toSeq
      case _              => Seq(key)
    }
    val base = cur
    val projected = fields.map { f =>
      base.fold(col(f))(c => col(c).getField(f)).as(s"${label}_$f")
    }
    out.select(keep.map(col) ++ projected: _*)
  }
}
