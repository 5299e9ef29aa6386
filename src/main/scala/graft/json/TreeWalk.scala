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

  // -------------------------------------------------------------------
  // Sequential traversals with GoUp and schema conditions (reference
  // `treehorn.py:186-270`: GoDown/GoUp Traversals + MeetsCondition /
  // HasDescendant / HasAncestor combinators).
  // -------------------------------------------------------------------

  /** Plan-time node conditions. The reference evaluates these per tree node
    * per message (`treehorn.py:204-259`); with a fixed schema every node
    * condition resolves ONCE against the Catalyst StructType — data never
    * enters into it. Combinators mirror MeetsCondition's `&`, `|`, `~`.
    */
  sealed trait Cond
  /** Node is a struct with field `k` (`HAS KEY k`). */
  final case class HasKey(k: String) extends Cond
  /** Some strict descendant struct has field `k` (reference HasDescendant). */
  final case class HasDescendantKey(k: String) extends Cond
  /** Some strict ancestor struct has field `k` (reference HasAncestor). */
  final case class HasAncestorKey(k: String) extends Cond
  final case class And(a: Cond, b: Cond) extends Cond
  final case class Or(a: Cond, b: Cond) extends Cond
  final case class Not(c: Cond) extends Cond

  /** One step of a traversal chain: move strictly down to the first
    * (pre-order) struct meeting `cond`, or strictly up to the nearest
    * ancestor meeting it; bind the landing node to `label`.
    */
  sealed trait Traversal { def cond: Cond; def label: String }
  final case class GoDown(cond: Cond, label: String) extends Traversal
  final case class GoUp(cond: Cond, label: String) extends Traversal

  private def evalCond(c: Cond, node: StructType, ancestors: Seq[StructType]): Boolean =
    c match {
      case HasKey(k)    => node.fieldNames.contains(k)
      case And(a, b)    => evalCond(a, node, ancestors) && evalCond(b, node, ancestors)
      case Or(a, b)     => evalCond(a, node, ancestors) || evalCond(b, node, ancestors)
      case Not(x)       => !evalCond(x, node, ancestors)
      case HasAncestorKey(k) => ancestors.exists(_.fieldNames.contains(k))
      case HasDescendantKey(k) =>
        def below(st: StructType): Boolean = st.fields.exists { f =>
          val inner = f.dataType match {
            case ArrayType(et, _) => et
            case dt               => dt
          }
          inner match {
            case s: StructType => s.fieldNames.contains(k) || below(s)
            case _             => false
          }
        }
        below(node)
    }

  /** First strict descendant (pre-order, declaration order — same order
    * [[pathsToKey]] yields) of `node` meeting `cond`. Returns the step path.
    */
  private def findDown(node: StructType, cond: Cond,
                       ancestors: Seq[StructType]): Option[(Seq[Step], StructType)] = {
    def dfs(st: StructType, prefix: Seq[Step],
            anc: Seq[StructType]): Option[(Seq[Step], StructType)] = {
      st.fields.toIndexedSeq.view.flatMap { f =>
        val (inner, isArr) = f.dataType match {
          case ArrayType(et, _) => (et, true)
          case dt               => (dt, false)
        }
        inner match {
          case s: StructType =>
            val here = prefix :+ Step(f.name, isArr)
            if (evalCond(cond, s, anc :+ st)) Some((here, s))
            else dfs(s, here, anc :+ st)
          case _ => None
        }
      }.headOption
    }
    dfs(node, Nil, ancestors)
  }

  /** Root-inclusive first match: the root itself if it meets `cond`, else
    * the first strict descendant in pre-order.
    */
  private def findFromRoot(schema: StructType, cond: Cond): Option[(Seq[Step], StructType)] =
    if (evalCond(cond, schema, Nil)) Some((Nil, schema)) else findDown(schema, cond, Nil)

  /** Condition-based multi-capture (the general form of [[extract]]): each
    * capture independently resolves FROM THE ROOT to the first node meeting
    * its condition (so sibling captures combine relationally, TreeHorn's
    * semantics for independent labels), traversals sharing a path prefix
    * reuse the same explodes, and `where` predicates filter on landed nodes
    * before projection. `select` refs may be nested ("label.a.b").
    */
  def extractCond(df: DataFrame, captures: Seq[(Cond, String)],
                  select: Seq[(String, String)], keep: Seq[String] = Nil,
                  where: Seq[(String, Column => Column)] = Nil): DataFrame = {
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
            val alias = s"__cc$counter"; counter += 1
            out = out.withColumn(alias, if (isArr) explode(src) else src)
            aliasOf(prefix) = alias
            cur = Some(alias)
        }
      }
      cur
    }

    val labels: Map[String, (Option[String], StructType)] = captures.map {
      case (cond, label) =>
        val (steps, landing) = findFromRoot(df.schema, cond).getOrElse(
          sys.error(s"no node meets $cond for label '$label'"))
        label -> ((descend(steps), landing))
    }.toMap

    project(out, labels, select, keep, where)
  }

  /** Resolve a "label.field.nested" reference against landed labels. */
  private def resolveRef(labels: Map[String, (Option[String], StructType)])
                        (ref: String): Column = {
    val parts = ref.split('.')
    val (aliasOpt, nodeType) = labels.getOrElse(parts.head,
      sys.error(s"unknown label '${parts.head}'"))
    require(parts.length > 1, s"select '$ref' must name a field of the label")
    require(nodeType.fieldNames.contains(parts(1)),
      s"label '${parts.head}' has no field '${parts(1)}'")
    val base = aliasOpt.fold(col(parts(1)))(a => col(a).getField(parts(1)))
    parts.drop(2).foldLeft(base)((c, f) => c.getField(f))
  }

  /** Shared epilogue of [[extractCond]] and [[walk]]: where-filters on
    * landed nodes, then the keep + select projection.
    */
  private def project(out: DataFrame, labels: Map[String, (Option[String], StructType)],
                      select: Seq[(String, String)], keep: Seq[String],
                      where: Seq[(String, Column => Column)]): DataFrame = {
    val resolve = resolveRef(labels) _
    val filtered = where.foldLeft(out) { case (d, (ref, pred)) => d.filter(pred(resolve(ref))) }
    filtered.select(keep.map(col) ++ select.map { case (ref, name) => resolve(ref).as(name) }: _*)
  }

  /** Walk a document schema with a chain of GoDown/GoUp traversals, then
    * project `select` ("label.field.nested" → outName) with optional row
    * `where` filters ((labelRef, predicate)) applied on the landed nodes.
    *
    * Compilation: descents materialize one aliased column per hop (arrays
    * explode); GoUp is FREE — ancestors already exist as columns from the
    * descent, and because an exploded alias is the specific array element on
    * the current path, an up-anchored projection automatically pairs each
    * matched node with ITS ancestor instance (the reference gets this from
    * per-node parent pointers, `treehorn.py:345-500`).
    */
  def walk(df: DataFrame, travs: Seq[Traversal],
           select: Seq[(String, String)], keep: Seq[String] = Nil,
           where: Seq[(String, Column => Column)] = Nil): DataFrame = {
    require(travs.nonEmpty, "empty traversal chain")
    var out = df
    var counter = 0
    // absolute-path → alias: a down-up-DOWN chain re-entering the same
    // array must REUSE its explode (one row per element, matching
    // extractCond's shared-prefix semantics) — a fresh explode would cross
    // the array with itself, |array|² rows per document
    val aliasOf = scala.collection.mutable.Map[Vector[String], String]()
    // stack of (absolute path, alias — None = root, node type), current first
    var stack: List[(Vector[String], Option[String], StructType)] =
      List((Vector.empty, None, df.schema))
    val labels = scala.collection.mutable.Map[String, (Option[String], StructType)]()

    travs.foreach {
      case GoDown(cond, label) =>
        val (curPath, curAlias, curType) = stack.head
        val anc = stack.tail.map(_._3)
        val (steps, _) = findDown(curType, cond, anc).getOrElse(
          sys.error(s"GO DOWN: no node meets $cond below ${curAlias.getOrElse("root")}"))
        var alias = curAlias
        var walkedType = curType
        var path = curPath
        steps.foreach { case Step(f, isArr) =>
          path = path :+ f
          walkedType = walkedType(f).dataType match {
            case ArrayType(s: StructType, _) => s
            case s: StructType               => s
            case other => sys.error(s"non-struct hop '$f': $other")
          }
          val parentAlias = alias
          val a = aliasOf.getOrElseUpdate(path, {
            val src = parentAlias.fold(col(f))(x => col(x).getField(f))
            val fresh = s"__wk$counter"; counter += 1
            out = out.withColumn(fresh, if (isArr) explode(src) else src)
            fresh
          })
          stack = (path, Some(a), walkedType) :: stack
          alias = Some(a)
        }
        labels(label) = (stack.head._2, stack.head._3)
      case GoUp(cond, label) =>
        val above = stack.tail
        val idx = above.indices.find { i =>
          evalCond(cond, above(i)._3, above.drop(i + 1).map(_._3))
        }.getOrElse(sys.error(s"GO UP: no ancestor meets $cond"))
        stack = above.drop(idx)
        labels(label) = (stack.head._2, stack.head._3)
    }

    project(out, labels.toMap, select, keep, where)
  }

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
