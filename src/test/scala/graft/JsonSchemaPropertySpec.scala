package graft

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

import graft.schema.JsonSchemaGate

/** Randomized cross-implementation check for the JSON-Schema gate: an
  * INDEPENDENT Jackson-tree reference validator (written from the gate's
  * documented semantics, sharing no code with the Column compiler or the
  * native walk) must produce the exact violations string the gate does,
  * over randomized schemas from the supported subset × randomized
  * messages (conforming, violating, off-type, null-bearing, nested,
  * malformed). The DuckDB oracle is GENERATED from the gate's own walk,
  * so it can't catch a semantics bug shared by both generators — this
  * reference can.
  */
class JsonSchemaPropertySpec extends SparkSpec {
  import spark.implicits._

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  // ---------------- independent reference validator ----------------

  private def canon(n: JsonNode): String =
    if (n.isObject) "object"
    else if (n.isArray) "array"
    else if (n.isNull) "null"
    else if (n.isBoolean) "bool"
    else if (n.isIntegralNumber) "int" // generators stay within int64
    else if (n.isNumber) "double"
    else "string"

  /** declared is one member name or a union (r14) — any member admits. */
  private def typeMatches(c: String, declared: Seq[String]): Boolean =
    declared.exists {
      case "number"  => c == "int" || c == "double"
      case "integer" => c == "int"
      case "boolean" => c == "bool"
      case other     => c == other
    }

  /** the node at an object-field path below `root`: absent when any
    * ancestor is missing or not an object (a JSON null IS present).
    */
  private def nodeAt(root: JsonNode, path: Seq[String]): Option[JsonNode] =
    path.foldLeft(Option(root)) {
      case (Some(n), f) if n.isObject && n.has(f) => Some(n.get(f))
      case _                                      => None
    }

  private def asD(n: JsonNode): Double = n.asDouble()
  private def strLen(n: JsonNode): Int = {
    val s = n.asText(); s.codePointCount(0, s.length)
  }

  /** one schema node's scalar constraints, read independently. */
  private case class RefNode(sc: JsonNode) {
    // r16: a DISCRIMINATED oneOf node's effective type is the union of
    // its members' declared types (the gate synthesizes the same union
    // check); a dynamic oneOf synthesizes nothing
    def typ: Option[Seq[String]] = Option(sc.get("type")).map(t =>
      if (t.isArray) (0 until t.size).map(i => t.get(i).asText())
      else Seq(t.asText()))
      .orElse(Option.when(oneOfDisc)(
        oneOfScs.flatMap(m => RefNode(m).typ.get)))
    /** the gate's documented discriminated test, independently spelled:
      * every member typed, admitted canonical sets pairwise disjoint.
      */
    def oneOfDisc: Boolean = oneOfScs.nonEmpty &&
      oneOfScs.forall(_.has("type")) && {
        def adm(m: JsonNode): Set[String] = {
          val t = m.get("type")
          val names = if (t.isArray) (0 until t.size).map(t.get(_).asText())
            else Seq(t.asText())
          names.toSet.flatMap { (n: String) => n match {
            case "number"  => Set("int", "double")
            case "integer" => Set("int")
            case "boolean" => Set("bool")
            case o         => Set(o)
          }}
        }
        val sets = oneOfScs.map(adm)
        sets.indices.forall(i => (i + 1 until sets.size).forall(j =>
          (sets(i) intersect sets(j)).isEmpty))
      }
    def enums: Seq[JsonNode] =
      Option(sc.get("enum")).map(e => (0 until e.size).map(e.get)).getOrElse(Nil) ++
        Option(sc.get("const")).toSeq
    def props: Seq[(String, JsonNode)] = Option(sc.get("properties")).toSeq
      .flatMap { p =>
        val it = p.fieldNames()
        Iterator.continually(if (it.hasNext) it.next() else null)
          .takeWhile(_ != null).map(f => f -> p.get(f)).toSeq
      }
    def required: Seq[String] = Option(sc.get("required")).toSeq
      .flatMap(r => (0 until r.size).map(i => r.get(i).asText()))
    def num(k: String): Option[Double] = Option(sc.get(k)).map(_.asDouble())
    def int(k: String): Option[Int] = Option(sc.get(k)).map(_.asInt())
    def str(k: String): Option[String] = Option(sc.get(k)).map(_.asText())
    def items: Option[JsonNode] = Option(sc.get("items"))
    def closed: Boolean = Option(sc.get("additionalProperties"))
      .exists(v => v.isBoolean && !v.asBoolean())
    def addPropsSc: Option[JsonNode] =
      Option(sc.get("additionalProperties")).filter(_.isObject)
    def uniqueItems: Boolean =
      Option(sc.get("uniqueItems")).exists(_.asBoolean())
    def deps: Seq[(String, String)] =
      Option(sc.get("dependentRequired")).toSeq.flatMap { d =>
        val it = d.fields()
        Iterator.continually(if (it.hasNext) it.next() else null)
          .takeWhile(_ != null)
          .flatMap(e => (0 until e.getValue.size)
            .map(i => e.getKey -> e.getValue.get(i).asText()))
          .toSeq
      }
    def containsSc: Option[JsonNode] = Option(sc.get("contains"))
    def propNamesPat: Option[String] =
      Option(sc.get("propertyNames")).map(_.get("pattern").asText())
    def ifSc: Option[JsonNode] = Option(sc.get("if"))
    def thenSc: Option[JsonNode] = Option(sc.get("then"))
    def elseSc: Option[JsonNode] = Option(sc.get("else"))
    def oneOfScs: Seq[JsonNode] = Option(sc.get("oneOf")).toSeq
      .flatMap(o => (0 until o.size).map(o.get))
    def patProps: Seq[(String, JsonNode)] =
      Option(sc.get("patternProperties")).toSeq.flatMap { pp =>
        val it = pp.fields()
        Iterator.continually(if (it.hasNext) it.next() else null)
          .takeWhile(_ != null).map(e => e.getKey -> e.getValue).toSeq
      }
    def anyOfScs: Seq[JsonNode] = Option(sc.get("anyOf")).toSeq
      .flatMap(a => (0 until a.size).map(a.get))
    def notSc: Option[JsonNode] = Option(sc.get("not"))
    def depSchemaPairs: Seq[(String, JsonNode)] =
      Option(sc.get("dependentSchemas")).toSeq.flatMap { d =>
        val it = d.fields()
        Iterator.continually(if (it.hasNext) it.next() else null)
          .takeWhile(_ != null).map(e => e.getKey -> e.getValue).toSeq
      }
  }

  private def keyList(v: JsonNode): Seq[String] = {
    val it = v.fieldNames()
    Iterator.continually(if (it.hasNext) it.next() else null)
      .takeWhile(_ != null).toSeq
  }

  /** r15 contains / r16 conditionals: a node SATISFIES a subschema iff
    * it violates none of its checks — independently spelled as "no term
    * of the subschema's walk universe fires on it" (mutual recursion
    * with [[refTerms]]).
    */
  private def refSatisfies(e: JsonNode, sub: JsonNode): Boolean =
    refTerms(sub, Nil).forall(t => !t.test(e))

  private def containsBad(v: JsonNode, rn: RefNode): Boolean =
    rn.containsSc.exists { sub =>
      val cnt = (0 until v.size).count(i => refSatisfies(v.get(i), sub))
      cnt < rn.int("minContains").getOrElse(1) ||
        rn.int("maxContains").exists(cnt > _)
    }

  /** the documented uniqueItems rule, independently: two equal SCALAR
    * elements (numbers as doubles, nulls all equal); containers skip.
    */
  private def hasDupScalars(arr: JsonNode): Boolean = {
    val seen = scala.collection.mutable.Set[(String, String)]()
    (0 until arr.size).exists { i =>
      val e = arr.get(i)
      canon(e) match {
        case "string" => !seen.add(("s", e.asText()))
        case "int" | "double" => !seen.add(("n", (e.asDouble() + 0.0).toString))
        case "bool" => !seen.add(("b", e.asBoolean().toString))
        case "null" => !seen.add(("z", ""))
        case _ => false
      }
    }
  }

  /** an object node carrying a key outside the declared set — r16: a
    * key matched by a sibling patternProperties selector is NOT extra
    * (the spec's matched-by-neither rule).
    */
  private def hasExtraKey(v: JsonNode, declared: Set[String],
                          pats: Seq[String]): Boolean = {
    val ps = pats.map(compilePat)
    keyList(v).exists(k => !declared(k) && !ps.exists(_.matcher(k).find()))
  }

  /** the documented `$` semantics: end of TEXT on both engines — an
    * independent spelling of the gate's normalization (the generator's
    * pattern pool has no escaped/class dollars, so a plain replace is
    * exact here).
    */
  private def compilePat(p: String): java.util.regex.Pattern =
    java.util.regex.Pattern.compile(p.replace("$", "\\z"))

  /** enum membership by TYPED bucket (the gate's documented rule). */
  private def enumViolates(v: JsonNode, members: Seq[JsonNode]): Boolean =
    canon(v) match {
      case "string" => !members.exists(m => m.isTextual && m.asText() == v.asText())
      case "int" => !members.exists(m =>
        m.isIntegralNumber && m.asLong() == v.asLong())
      case "double" => !members.exists(m =>
        m.isNumber && !m.isIntegralNumber && m.asDouble() == v.asDouble())
      case "bool" => !members.exists(m =>
        m.isBoolean && m.asBoolean() == v.asBoolean())
      case _ => false
    }

  /** value-check violations of one PRESENT node against one schema node,
    * in the gate's emission order (enum, min, max, xmin, xmax,
    * multipleof, minlen, maxlen, pattern, minitems, maxitems).
    */
  private def valueTags(v: JsonNode, rn: RefNode, at: String): Seq[String] = {
    val c = canon(v)
    val numeric = c == "int" || c == "double"
    val out = Seq.newBuilder[String]
    if (rn.enums.nonEmpty && enumViolates(v, rn.enums)) out += s"enum:$at"
    rn.num("minimum").foreach(b => if (numeric && asD(v) < b) out += s"min:$at")
    rn.num("maximum").foreach(b => if (numeric && asD(v) > b) out += s"max:$at")
    rn.num("exclusiveMinimum").foreach(b =>
      if (numeric && asD(v) <= b) out += s"xmin:$at")
    rn.num("exclusiveMaximum").foreach(b =>
      if (numeric && asD(v) >= b) out += s"xmax:$at")
    rn.num("multipleOf").foreach(b =>
      if (numeric && (asD(v) % b) != 0.0) out += s"multipleof:$at")
    rn.int("minLength").foreach(b =>
      if (c == "string" && strLen(v) < b) out += s"minlen:$at")
    rn.int("maxLength").foreach(b =>
      if (c == "string" && strLen(v) > b) out += s"maxlen:$at")
    rn.str("pattern").foreach(p =>
      if (c == "string" && !compilePat(p).matcher(v.asText()).find())
        out += s"pattern:$at")
    rn.int("minItems").foreach(b =>
      if (c == "array" && v.size() < b) out += s"minitems:$at")
    rn.int("maxItems").foreach(b =>
      if (c == "array" && v.size() > b) out += s"maxitems:$at")
    if (rn.uniqueItems && c == "array" && hasDupScalars(v))
      out += s"unique:$at"
    rn.int("minProperties").foreach(b =>
      if (c == "object" && v.size() < b) out += s"minprops:$at")
    rn.int("maxProperties").foreach(b =>
      if (c == "object" && v.size() > b) out += s"maxprops:$at")
    if (rn.closed && c == "object" &&
      hasExtraKey(v, rn.props.map(_._1).toSet, rn.patProps.map(_._1)))
      out += s"extra:$at"
    rn.deps.foreach { case (ifK, thenK) =>
      if (c == "object" && v.has(ifK) && !v.has(thenK))
        out += s"dep:$at.$thenK"
    }
    if (rn.containsSc.nonEmpty && c == "array" && containsBad(v, rn))
      out += s"contains:$at"
    rn.propNamesPat.foreach { p =>
      if (c == "object" &&
        keyList(v).exists(k => !compilePat(p).matcher(k).find()))
        out += s"propname:$at"
    }
    // r16 if/then/else: branch checks fire under satisfaction (negation)
    // of the if-subschema, on the PRESENT node only (callers pass
    // present values)
    rn.ifSc.foreach { ifn =>
      val sat = refSatisfies(v, ifn)
      rn.thenSc.foreach(b =>
        if (sat && !refSatisfies(v, b)) out += s"then:$at")
      rn.elseSc.foreach(b =>
        if (!sat && !refSatisfies(v, b)) out += s"else:$at")
    }
    // r16 discriminated oneOf: the member matching the runtime type must
    // be satisfied (off-union types are the synthesized type check's
    // business, handled by the caller's typ test)
    if (rn.oneOfDisc) rn.oneOfScs.foreach { m =>
      if (typeMatches(canon(v), RefNode(m).typ.get) && !refSatisfies(v, m))
        out += s"oneof:$at"
    }
    // r16 dynamic oneOf: exactly-one satisfaction counted at runtime
    if (rn.oneOfScs.nonEmpty && !rn.oneOfDisc &&
      rn.oneOfScs.count(m => refSatisfies(v, m)) != 1)
      out += s"oneof:$at"
    // r16 anyOf: at least one member satisfied
    if (rn.anyOfScs.nonEmpty && !rn.anyOfScs.exists(m => refSatisfies(v, m)))
      out += s"anyof:$at"
    // r16 not: satisfaction IS the violation
    rn.notSc.foreach(s => if (refSatisfies(v, s)) out += s"not:$at")
    // r16 dependentSchemas: key presence requires satisfying the pair
    rn.depSchemaPairs.foreach { case (k, s) =>
      if (c == "object" && v.has(k) && !refSatisfies(v, s))
        out += s"depschema:$at.$k"
    }
    // r16 patternProperties: one tag per (selector, inner-term) — any
    // selector-matched key whose value fires the inner term
    rn.patProps.foreach { case (re, sub) =>
      refTerms(sub, Nil).foreach { it =>
        if (c == "object" && keyList(v).exists(k =>
          compilePat(re).matcher(k).find() && it.test(v.get(k))))
          out += s"pprop:$at${it.suffix}.${it.kind}"
      }
    }
    // r16 additionalProperties SCHEMA form: keys matched by NEITHER
    // properties nor a patternProperties selector validate their values
    rn.addPropsSc.foreach { sub =>
      val declared = rn.props.map(_._1).toSet
      val ps = rn.patProps.map(p => compilePat(p._1))
      refTerms(sub, Nil).foreach { it =>
        if (c == "object" && keyList(v).exists(k =>
          !declared(k) && !ps.exists(_.matcher(k).find()) &&
            it.test(v.get(k))))
          out += s"aprop:$at${it.suffix}.${it.kind}"
      }
    }
    out.result()
  }

  /** does ANY node reached from `v` by the element-relative steps
    * violate the single terminal check `test`? Mirrors the native walk's
    * skip rules.
    */
  private def anyReached(v: JsonNode, steps: Seq[String])(
      test: JsonNode => Boolean): Boolean =
    if (steps.isEmpty) test(v)
    else steps.head match {
      case "[]" => v.isArray &&
        (0 until v.size).exists(i => anyReached(v.get(i), steps.tail)(test))
      case f => v.isObject && v.has(f) && anyReached(v.get(f), steps.tail)(test)
    }

  /** one term of a subschema's ordered walk universe: tag rendering
    * parts plus the test on the walk ROOT value (steps applied inside).
    */
  private case class RefTerm(suffix: String, kind: String,
                             fieldSuf: String, test: JsonNode => Boolean)

  /** the FULL ordered walk universe of one schema node — every check
    * reachable through nested properties/items, in the documented
    * emission order. Feeds [[itemTags]] (fired-term filtering over an
    * array's elements), [[refSatisfies]] (r15/r16 satisfaction = no
    * term fires), and the r16 patternProperties per-term fan-out.
    */
  private def refTerms(sc: JsonNode, steps: Seq[String]): Seq[RefTerm] = {
    val rn = RefNode(sc)
    val at = steps.map(s => if (s == "[]") "[]" else s".$s").mkString
    val out = Seq.newBuilder[RefTerm]
    def term(kind: String, fieldSuf: String = "")(
        tt: JsonNode => Boolean): Unit =
      out += RefTerm(at, kind, fieldSuf, v => anyReached(v, steps)(tt))
    def numeric(v: JsonNode) = canon(v) == "int" || canon(v) == "double"
    rn.typ.foreach(t => term("type")(v => !typeMatches(canon(v), t)))
    if (rn.enums.nonEmpty) term("enum")(v => enumViolates(v, rn.enums))
    rn.num("minimum").foreach(b => term("min")(v => numeric(v) && asD(v) < b))
    rn.num("maximum").foreach(b => term("max")(v => numeric(v) && asD(v) > b))
    rn.num("exclusiveMinimum").foreach(b =>
      term("xmin")(v => numeric(v) && asD(v) <= b))
    rn.num("exclusiveMaximum").foreach(b =>
      term("xmax")(v => numeric(v) && asD(v) >= b))
    rn.num("multipleOf").foreach(b =>
      term("multipleof")(v => numeric(v) && (asD(v) % b) != 0.0))
    rn.int("minLength").foreach(b =>
      term("minlen")(v => canon(v) == "string" && strLen(v) < b))
    rn.int("maxLength").foreach(b =>
      term("maxlen")(v => canon(v) == "string" && strLen(v) > b))
    rn.str("pattern").foreach(p => term("pattern")(v =>
      canon(v) == "string" && !compilePat(p).matcher(v.asText()).find()))
    rn.int("minItems").foreach(b =>
      term("minitems")(v => canon(v) == "array" && v.size < b))
    rn.int("maxItems").foreach(b =>
      term("maxitems")(v => canon(v) == "array" && v.size > b))
    if (rn.uniqueItems)
      term("unique")(v => canon(v) == "array" && hasDupScalars(v))
    rn.int("minProperties").foreach(b =>
      term("minprops")(v => canon(v) == "object" && v.size() < b))
    rn.int("maxProperties").foreach(b =>
      term("maxprops")(v => canon(v) == "object" && v.size() > b))
    if (rn.closed) term("extra")(v => canon(v) == "object" &&
      hasExtraKey(v, rn.props.map(_._1).toSet, rn.patProps.map(_._1)))
    rn.deps.foreach { case (ifK, thenK) =>
      term("dep", s".$thenK")(v =>
        canon(v) == "object" && v.has(ifK) && !v.has(thenK))
    }
    if (rn.containsSc.nonEmpty)
      term("contains")(v => canon(v) == "array" && containsBad(v, rn))
    rn.propNamesPat.foreach(p => term("propname")(v => canon(v) == "object" &&
      keyList(v).exists(k => !compilePat(p).matcher(k).find())))
    rn.ifSc.foreach { ifn =>
      rn.thenSc.foreach(b => term("then")(v =>
        refSatisfies(v, ifn) && !refSatisfies(v, b)))
      rn.elseSc.foreach(b => term("else")(v =>
        !refSatisfies(v, ifn) && !refSatisfies(v, b)))
    }
    if (rn.oneOfDisc) rn.oneOfScs.foreach { m =>
      val mt = RefNode(m).typ.get
      term("oneof")(v => typeMatches(canon(v), mt) && !refSatisfies(v, m))
    }
    if (rn.oneOfScs.nonEmpty && !rn.oneOfDisc)
      term("oneof")(v => rn.oneOfScs.count(m => refSatisfies(v, m)) != 1)
    if (rn.anyOfScs.nonEmpty)
      term("anyof")(v => !rn.anyOfScs.exists(m => refSatisfies(v, m)))
    rn.notSc.foreach(s => term("not")(v => refSatisfies(v, s)))
    rn.depSchemaPairs.foreach { case (k, s) =>
      term("depschema", s".$k")(v =>
        canon(v) == "object" && v.has(k) && !refSatisfies(v, s))
    }
    rn.patProps.foreach { case (re, sub) =>
      refTerms(sub, Nil).foreach { it =>
        term("pprop", s"${it.suffix}.${it.kind}")(v =>
          canon(v) == "object" && keyList(v).exists(k =>
            compilePat(re).matcher(k).find() && it.test(v.get(k))))
      }
    }
    rn.addPropsSc.foreach { sub =>
      val declared = rn.props.map(_._1).toSet
      val ps = rn.patProps.map(p => compilePat(p._1))
      refTerms(sub, Nil).foreach { it =>
        term("aprop", s"${it.suffix}.${it.kind}")(v =>
          canon(v) == "object" && keyList(v).exists(k =>
            !declared(k) && !ps.exists(_.matcher(k).find()) &&
              it.test(v.get(k))))
      }
    }
    val propNames = rn.props.map(_._1).toSet
    rn.required.filterNot(propNames).sorted.foreach(f =>
      term("missing", s".$f")(v => canon(v) == "object" && !v.has(f)))
    rn.props.foreach { case (f, sub) =>
      if (rn.required.contains(f))
        term("missing", s".$f")(v => canon(v) == "object" && !v.has(f))
      out ++= refTerms(sub, steps :+ f)
    }
    rn.items.foreach(sub => out ++= refTerms(sub, steps :+ "[]"))
    out.result()
  }

  /** per-element checks of the array at `p` (present + array-typed):
    * the walk universe filtered to terms firing on ANY element.
    */
  private def itemTags(arr: JsonNode, base: String, steps: Seq[String],
                       sc: JsonNode): Seq[String] =
    refTerms(sc, steps).flatMap { rt =>
      if ((0 until arr.size).exists(i => rt.test(arr.get(i))))
        Some(s"${rt.kind}:$base${rt.suffix}${rt.fieldSuf}")
      else None
    }

  /** the reference verdict: the full ordered violations string. */
  private def referenceViolations(raw: String, schemaSc: JsonNode): String = {
    val parsed: Option[JsonNode] =
      if (raw == null) None
      else try Some(mapper.readTree(raw)) catch { case _: Exception => None }
    parsed match {
      case None => "malformed"
      case Some(root) =>
        val rootRn = RefNode(schemaSc)
        val out = Seq.newBuilder[String]
        rootRn.typ.foreach(t =>
          if (!typeMatches(canon(root), t)) out += "type:$")
        out ++= valueTags(root, rootRn, "$")
        rootRn.items.foreach(sub =>
          if (canon(root) == "array") out ++= itemTags(root, "$[]", Nil, sub))
        def walk(sc: JsonNode, path: Seq[String], tag: String,
                 guarded: Boolean): Unit = {
          val rn = RefNode(sc)
          val propNames = rn.props.map(_._1).toSet
          rn.required.filterNot(propNames).sorted.foreach { f =>
            if (guarded && nodeAt(root, path :+ f).isEmpty)
              out += s"missing:$tag.$f"
          }
          rn.props.foreach { case (name, sub) =>
            val cp = path :+ name
            val ct = s"$tag.$name"
            val node = if (guarded) nodeAt(root, cp) else None
            val subRn = RefNode(sub)
            if (rn.required.contains(name) && guarded && node.isEmpty)
              out += s"missing:$ct"
            node.foreach { v =>
              subRn.typ.foreach(t =>
                if (!typeMatches(canon(v), t)) out += s"type:$ct")
              out ++= valueTags(v, subRn, ct)
              subRn.items.foreach(sub2 =>
                if (canon(v) == "array") out ++= itemTags(v, ct + "[]", Nil, sub2))
            }
            // absent nodes still walk (the gate's checks are per-path
            // Columns; an absent subtree just makes each one skip) —
            // EXCEPT that deeper guards require this node to be a
            // runtime object
            if (subRn.props.nonEmpty || subRn.required.nonEmpty)
              walk(sub, cp, ct,
                guarded && node.exists(v => canon(v) == "object"))
          }
        }
        // item-level checks fire only when the top node IS array-typed;
        // the guard convention for property walks: the root guard exists
        // only when the root DECLARES object
        val rootGuard =
          !rootRn.typ.exists(_.contains("object")) || canon(root) == "object"
        walk(schemaSc, Nil, "$", rootGuard)
        out.result().mkString(",")
    }
  }

  // -------------------------- generators ---------------------------

  private val rnd = new scala.util.Random(20260816L)
  private val names = Vector("a", "b", "c", "d", "e")
  private val patterns = Vector("^a", "[0-9]+$", "b.c", "^[ab]{1,3}$")
  private val strPool = Vector("", "a", "ab", "abc", "Ab1", "𝒳y",
    "xyz0", "bac", "a1b2c3", "a1\n") // trailing newline: the $-anchor case
  private val intPool = Vector(-3L, 0L, 1L, 2L, 3L, 10L, 15L)
  private val dblPool = Vector(0.5, 2.0, -1.25, 3.0, 2.5)

  private def pick[T](v: Vector[T]): T = v(rnd.nextInt(v.size))

  private def genSchema(depth: Int): ObjectNode = {
    val sc = mapper.createObjectNode()
    val t = pick(if (depth > 0)
      Vector("object", "array", "string", "integer", "number", "boolean")
    else Vector("string", "integer", "number", "boolean"))
    // r14 union types: the nullable idiom, 1-in-4 on scalar declarations
    if (rnd.nextInt(4) == 0 && t != "object" && t != "array") {
      val u = sc.putArray("type"); u.add(t); u.add("null")
    } else sc.put("type", t)
    t match {
      case "object" =>
        val props = sc.putObject("properties")
        val used = rnd.shuffle(names).take(1 + rnd.nextInt(3))
        used.foreach(f => props.set[JsonNode](f,
          // r16: 1-in-8 property schemas are discriminated oneOf unions;
          // 1-in-8 the dynamic forms (overlapping oneOf / anyOf)
          if (depth > 0 && rnd.nextInt(8) == 0) genOneOf()
          else if (depth > 0 && rnd.nextInt(8) == 0)
            (if (rnd.nextBoolean()) genOneOfDyn() else genAnyOf())
          else genSchema(depth - 1)))
        if (rnd.nextBoolean()) {
          val req = sc.putArray("required")
          used.filter(_ => rnd.nextBoolean()).foreach(req.add)
          if (rnd.nextInt(4) == 0) req.add("zz") // required w/o properties
        }
        // r14: closed (false) and explicitly-open (true) objects — the
        // generator's 1/3 "extra" key exercises both; r16: 1-in-3 of
        // these are the SCHEMA form instead (the extra key's int value
        // lands on both sides of {type: string} / {minimum})
        if (rnd.nextInt(3) == 0) {
          if (rnd.nextInt(3) == 0) {
            val sub = sc.putObject("additionalProperties")
            if (rnd.nextBoolean()) sub.put("type", "string")
            else { sub.put("type", "integer"); sub.put("minimum", 2L) }
          } else sc.put("additionalProperties", rnd.nextBoolean())
        }
        if (rnd.nextInt(4) == 0) sc.put("minProperties", rnd.nextInt(3))
        if (rnd.nextInt(4) == 0) sc.put("maxProperties", 1 + rnd.nextInt(3))
        // r14 dependentRequired between two declared property names
        if (rnd.nextInt(4) == 0 && used.size >= 2) {
          val dd = sc.putObject("dependentRequired")
          val arr = dd.putArray(used(0)); arr.add(used(1))
        }
        // r16 dependentSchemas: presence of one declared name requires
        // the object to satisfy a subschema (requiredness or a value
        // bound on a sibling — both satisfaction-evaluated)
        if (rnd.nextInt(5) == 0 && used.size >= 2) {
          val sub = mapper.createObjectNode()
          if (rnd.nextBoolean()) sub.putArray("required").add(used(1))
          else sub.put("minProperties", 2)
          sc.putObject("dependentSchemas").set[JsonNode](used(0), sub)
        }
        // r16 not at object depth: rejects objects carrying a key
        if (rnd.nextInt(6) == 0)
          sc.putObject("not").putArray("required").add(pick(names))
        // r15 propertyNames: generated keys come from `names` plus the
        // 1-in-3 "extra" key — the pool mixes always-pass, often-fail,
        // and extra-only-fail patterns
        if (rnd.nextInt(4) == 0)
          sc.putObject("propertyNames").put("pattern",
            pick(Vector("^[a-d]+$", "^[a-z]+$", "^(a|b|extra)$")))
        // r16 if/then/else between declared names: `required` if-terms
        // exercise both satisfaction (25% absent fields) and branches
        if (rnd.nextInt(4) == 0 && used.size >= 2) {
          sc.putObject("if").putArray("required").add(used(0))
          sc.putObject("then").putArray("required").add(used(1))
          if (rnd.nextBoolean())
            sc.putObject("else").putArray("required").add(used.last)
        }
        // r16 patternProperties: selectors over the generated key pool
        // (a-e + the 1-in-3 "extra" key) with scalar value subschemas;
        // beside a closed object this also exercises the
        // matched-by-neither rule
        if (rnd.nextInt(4) == 0) {
          val pp = sc.putObject("patternProperties")
          val sub = mapper.createObjectNode()
          rnd.nextInt(3) match {
            case 0 => sub.put("type", "integer"); sub.put("minimum", 1L)
            case 1 => sub.put("type", "string"); sub.put("maxLength", 3)
            case _ => sub.put("type", "boolean")
          }
          pp.set[JsonNode](pick(Vector("^[ab]", "^e", "c")), sub)
        }
      case "array" =>
        sc.set[JsonNode]("items", genSchema(depth - 1))
        if (rnd.nextBoolean()) sc.put("minItems", rnd.nextInt(3))
        if (rnd.nextBoolean()) sc.put("maxItems", 1 + rnd.nextInt(3))
        // r14: only where the declared item type is scalar (the compile
        // requirement); the small value pools make duplicates common
        val itemType = Option(sc.get("items").get("type")).map(_.asText())
        if (rnd.nextInt(3) == 0 && itemType.exists(
            Seq("string", "integer", "number", "boolean").contains))
          sc.put("uniqueItems", true)
        // r15 contains: a scalar subschema over the same value pools, so
        // satisfying counts land on every side of the generated bounds;
        // maxContains is kept >= the effective minContains (the gate
        // aborts statically unsatisfiable pairs)
        if (rnd.nextInt(3) == 0) {
          val sub = mapper.createObjectNode()
          rnd.nextInt(3) match {
            case 0 => sub.put("type", "integer"); sub.put("minimum", 1L)
            case 1 => sub.put("type", "string"); sub.put("pattern", pick(patterns))
            case _ => sub.put("const", "ab")
          }
          sc.set[JsonNode]("contains", sub)
          val minC = if (rnd.nextBoolean()) {
            val m = rnd.nextInt(3); sc.put("minContains", m); m
          } else 1
          if (rnd.nextInt(3) == 0) sc.put("maxContains", minC + rnd.nextInt(3))
        }
      case "string" =>
        if (rnd.nextBoolean()) sc.put("minLength", rnd.nextInt(3))
        if (rnd.nextBoolean()) sc.put("maxLength", 1 + rnd.nextInt(5))
        if (rnd.nextInt(3) == 0) sc.put("pattern", pick(patterns))
        if (rnd.nextInt(4) == 0) {
          val e = sc.putArray("enum"); e.add("ab"); e.add("abc"); e.add(2L)
        } else if (rnd.nextInt(6) == 0) sc.put("const", "ab")
      case "integer" | "number" =>
        if (rnd.nextBoolean()) sc.put("minimum", intPool(rnd.nextInt(4)))
        if (rnd.nextBoolean()) sc.put("maximum", 3L + rnd.nextInt(12))
        if (rnd.nextInt(3) == 0) sc.put("exclusiveMinimum", 0L)
        if (rnd.nextInt(3) == 0) sc.put("exclusiveMaximum", 10L)
        if (rnd.nextInt(3) == 0)
          sc.put("multipleOf", pick(Vector(1.0, 2.0, 0.5, 3.0)))
        if (rnd.nextInt(5) == 0) {
          val e = sc.putArray("enum"); e.add(1L); e.add(2L); e.add(0.5)
        }
        // r16 scalar if/then/else: a value-conditioned bound — off-type
        // values take the typed-guard vacuous pass through the if-side
        if (rnd.nextInt(5) == 0) {
          sc.putObject("if").put("minimum", 2L)
          sc.putObject("then").put("maximum", 8L)
          if (rnd.nextBoolean()) sc.putObject("else").put("minimum", -1L)
        }
        // r16 not on scalars: a satisfied bound or const is the
        // violation — off-type values SATISFY a bare bound vacuously
        // (JSON Schema's own rule), which the 1-in-5 off-type override
        // in genValue exercises
        if (rnd.nextInt(6) == 0) {
          val neg = sc.putObject("not")
          if (rnd.nextBoolean()) neg.put("minimum", 3L)
          else { neg.put("type", "integer"); neg.put("multipleOf", 2.0) }
        }
      case "boolean" =>
        if (rnd.nextInt(4) == 0) sc.put("const", true)
    }
    sc
  }

  /** a discriminated oneOf union over disjoint scalar types (r16). */
  private def genOneOf(): ObjectNode = {
    val sc = mapper.createObjectNode()
    val arr = sc.putArray("oneOf")
    val m1 = mapper.createObjectNode()
    m1.put("type", "integer"); m1.put("minimum", 1L)
    val m2 = mapper.createObjectNode()
    m2.put("type", "string"); m2.put("minLength", 2)
    arr.add(m1); arr.add(m2)
    if (rnd.nextBoolean()) {
      val m3 = mapper.createObjectNode(); m3.put("type", "boolean")
      arr.add(m3)
    }
    sc
  }

  /** a DYNAMIC oneOf (r16): overlapping integer members — the small
    * intPool lands values on the zero-, one-, and two-satisfied sides.
    */
  private def genOneOfDyn(): ObjectNode = {
    val sc = mapper.createObjectNode()
    val arr = sc.putArray("oneOf")
    val m1 = mapper.createObjectNode()
    m1.put("type", "integer"); m1.put("minimum", 2L)
    val m2 = mapper.createObjectNode()
    m2.put("type", "integer"); m2.put("maximum", 3L)
    arr.add(m1); arr.add(m2)
    sc
  }

  /** an anyOf (r16) — one member deliberately TYPE-FREE so the vacuous
    * pass (a bound admits off-type values, making the member satisfied)
    * is generator-exercised.
    */
  private def genAnyOf(): ObjectNode = {
    val sc = mapper.createObjectNode()
    val arr = sc.putArray("anyOf")
    val m1 = mapper.createObjectNode()
    if (rnd.nextBoolean()) m1.put("type", "integer")
    m1.put("minimum", 2L)
    val m2 = mapper.createObjectNode()
    m2.put("type", "string"); m2.put("maxLength", 3)
    arr.add(m1); arr.add(m2)
    sc
  }

  /** a value loosely guided by the schema: mostly on-type (value checks
    * still fire), sometimes off-type / JSON null / absent fields.
    */
  private def genValue(sc0: JsonNode, depth: Int): JsonNode = {
    // a oneOf/anyOf node generates from a random member (off-type still
    // comes from the 1-in-5 override below)
    val sc = if (sc0.has("oneOf"))
      sc0.get("oneOf").get(rnd.nextInt(sc0.get("oneOf").size))
    else if (sc0.has("anyOf"))
      sc0.get("anyOf").get(rnd.nextInt(sc0.get("anyOf").size))
    else sc0
    // a union declaration generates a random member's value (including
    // "null" — the nullable idiom's on-type case)
    val declared = Option(sc.get("type")).map { t =>
      if (t.isArray) t.get(rnd.nextInt(t.size)).asText() else t.asText()
    }.getOrElse("string")
    val t = if (rnd.nextInt(5) == 0)
      pick(Vector("object", "array", "string", "integer", "number",
        "boolean", "null"))
    else declared
    t match {
      case "null" => mapper.nullNode()
      case "object" =>
        val o = mapper.createObjectNode()
        val props = Option(sc.get("properties"))
        props.foreach { p =>
          val it = p.fieldNames()
          while (it.hasNext) {
            val f = it.next()
            if (rnd.nextInt(4) != 0) // 25% absent
              o.set[JsonNode](f, genValue(p.get(f), depth - 1))
          }
        }
        if (rnd.nextInt(3) == 0) o.put("extra", 1L)
        o
      case "array" =>
        val a = mapper.createArrayNode()
        val itemSc = Option(sc.get("items"))
          .getOrElse(mapper.createObjectNode())
        (0 until rnd.nextInt(4)).foreach(_ =>
          a.add(if (depth > 0) genValue(itemSc, depth - 1)
          else mapper.getNodeFactory.numberNode(pick(intPool))))
        a
      case "string"  => mapper.getNodeFactory.textNode(pick(strPool))
      case "integer" => mapper.getNodeFactory.numberNode(pick(intPool))
      case "number" =>
        if (rnd.nextBoolean()) mapper.getNodeFactory.numberNode(pick(dblPool))
        else mapper.getNodeFactory.numberNode(pick(intPool))
      case _ => mapper.getNodeFactory.booleanNode(rnd.nextBoolean())
    }
  }

  // ----------------------------- test ------------------------------

  test("gate verdicts match an independent Jackson reference over " +
       "randomized schemas x messages (30 schemas x 24 messages)") {
    var schemas = 0
    while (schemas < 30) {
      val sc = mapper.createObjectNode()
      sc.put("type", "object")
      val props = sc.putObject("properties")
      rnd.shuffle(names).take(1 + rnd.nextInt(3))
        .foreach(f => props.set[JsonNode](f, genSchema(2)))
      if (rnd.nextBoolean()) {
        val req = sc.putArray("required")
        val it = props.fieldNames()
        while (it.hasNext) { val f = it.next(); if (rnd.nextBoolean()) req.add(f) }
      }
      if (rnd.nextInt(3) == 0)
        sc.put("additionalProperties", rnd.nextBoolean())
      if (rnd.nextInt(4) == 0) // r15: key checks at the root too
        sc.putObject("propertyNames").put("pattern",
          pick(Vector("^[a-d]+$", "^[a-z]+$", "^(a|b|extra)$")))
      // r16: negation/implication at the ROOT too
      if (rnd.nextInt(5) == 0)
        sc.putObject("not").putArray("required").add(pick(names))
      if (rnd.nextInt(5) == 0) {
        val sub = mapper.createObjectNode()
        sub.putArray("required").add(pick(names))
        sc.putObject("dependentSchemas").set[JsonNode](pick(names), sub)
      }
      val schemaJson = mapper.writeValueAsString(sc)
      val msgs: Seq[(Long, String)] = (0 until 24).map { i =>
        val raw =
          if (i == 0) "{broken"
          else if (i == 1) null
          else mapper.writeValueAsString(genValue(sc, 3))
        (i.toLong, raw)
      }
      val got = JsonSchemaGate.validate(msgs.toDF("id", "raw"), "raw",
          schemaJson, parsedCol = None)
        .select("id", "violations").as[(Long, String)].collect().toMap
      msgs.foreach { case (i, raw) =>
        val want = referenceViolations(raw, sc)
        assert(got(i) == want,
          s"schema=$schemaJson\nraw=$raw\ngate='${got(i)}'\nref ='$want'")
      }
      schemas += 1
    }
  }
}
