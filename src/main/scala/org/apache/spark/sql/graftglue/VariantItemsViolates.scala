package org.apache.spark.sql.graftglue

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, BooleanType, DataType, VariantType}
import org.apache.spark.types.variant.{Variant, VariantUtil}

/** Shared variant-node helpers for the JSON-Schema native walk. */
private[graftglue] object VariantWalk {
  /** canonical-alphabet fold of one node's variant type tag — the same
    * alphabet `schema_of_variant` folds to on the Column side.
    */
  def canon(v: Variant): String = v.getType match {
    case VariantUtil.Type.OBJECT  => "object"
    case VariantUtil.Type.ARRAY   => "array"
    case VariantUtil.Type.NULL    => "null"
    case VariantUtil.Type.BOOLEAN => "bool"
    case VariantUtil.Type.LONG    => "int"
    case VariantUtil.Type.STRING  => "string"
    case VariantUtil.Type.DOUBLE | VariantUtil.Type.DECIMAL |
         VariantUtil.Type.FLOAT   => "double"
    case _                        => "other"
  }

  def asDouble(v: Variant): Double = v.getType match {
    case VariantUtil.Type.LONG    => v.getLong.toDouble
    case VariantUtil.Type.DOUBLE  => v.getDouble
    case VariantUtil.Type.DECIMAL => v.getDecimal.doubleValue()
    case VariantUtil.Type.FLOAT   => v.getFloat.toDouble
    case t => throw new IllegalStateException(s"non-numeric variant $t")
  }
}

/** One element-relative WALK + TERMINAL check — the unit the native
  * JSON-Schema walk evaluates. [[VariantItemsViolates]] is one term; the
  * r15 `contains` keyword quantifies a CONJUNCTION of terms over an
  * array's elements (an element SATISFIES the contains subschema iff no
  * node reached by any of its terms violates), so terms nest via `sub`.
  * Terminal semantics per kind are documented on [[VariantItemsViolates]].
  */
case class WalkTerm(steps: Seq[String], kind: String,
                    expected: String, enumStrs: Seq[String],
                    enumLongs: Seq[Long], enumDoubles: Seq[Double],
                    enumBools: Seq[Boolean],
                    bound: Double, field: String,
                    pattern: String, keys: Seq[String],
                    sub: Seq[WalkTerm] = Nil,
                    minC: Int = 1, maxC: Int = -1,
                    sub2: Seq[WalkTerm] = Nil,
                    pats: Seq[String] = Nil) {
  import VariantWalk._

  @transient private lazy val strSet: Set[String] = enumStrs.toSet
  @transient private lazy val longSet: Set[Long] = enumLongs.toSet
  @transient private lazy val dblSet: Set[Double] = enumDoubles.toSet
  @transient private lazy val boolSet: Set[Boolean] = enumBools.toSet
  @transient private lazy val compiledPattern: java.util.regex.Pattern =
    java.util.regex.Pattern.compile(pattern)
  @transient private lazy val keySet: Set[String] = keys.toSet
  @transient private lazy val patsCompiled: Seq[java.util.regex.Pattern] =
    pats.map(java.util.regex.Pattern.compile)

  /** match against the declared type spec — one member or a pipe-joined
    * union ("string|null", r14).
    */
  private def typeMatches(t: String): Boolean =
    expected.split('|').exists {
      case "number"  => t == "int" || t == "double"
      case "integer" => t == "int"
      case "boolean" => t == "bool"
      case other     => t == other
    }

  /** typed enum membership of one node — mirrors the path-level
    * [[graft.schema.JsonSchemaGate]] EnumIn buckets exactly.
    */
  private def enumViolates(c: String, v: Variant): Boolean = c match {
    case "string" => !strSet(v.getString)
    case "int"    => !longSet(v.getLong)
    case "double" => !dblSet(asDouble(v))
    case "bool"   => !boolSet(v.getBoolean)
    case _        => false // object/array/null: the type check's business
  }

  /** the terminal check on one REACHED node. */
  def terminalViolates(v: Variant): Boolean = {
    val c = canon(v)
    kind match {
      case "type" => !typeMatches(c)
      case "enum" => enumViolates(c, v)
      case "min"  => (c == "int" || c == "double") && asDouble(v) < bound
      case "max"  => (c == "int" || c == "double") && asDouble(v) > bound
      case "xmin" => (c == "int" || c == "double") && asDouble(v) <= bound
      case "xmax" => (c == "int" || c == "double") && asDouble(v) >= bound
      // the same truncated IEEE remainder Spark's `%` (Java %) and
      // DuckDB's DOUBLE `%` (C fmod) compute on the same
      // correctly-rounded operands — engine-identical
      case "multipleof" =>
        (c == "int" || c == "double") && (asDouble(v) % bound) != 0.0
      case "minlen" =>
        c == "string" && {
          val s = v.getString
          s.codePointCount(0, s.length) < bound.toInt
        }
      case "maxlen" =>
        c == "string" && {
          val s = v.getString
          s.codePointCount(0, s.length) > bound.toInt
        }
      case "pattern" =>
        c == "string" && !compiledPattern.matcher(v.getString).find()
      case "minitems" => c == "array" && v.arraySize() < bound.toInt
      case "maxitems" => c == "array" && v.arraySize() > bound.toInt
      // object KEY-COUNT bounds (r14 minProperties/maxProperties)
      case "minprops" => c == "object" && v.objectSize() < bound.toInt
      case "maxprops" => c == "object" && v.objectSize() > bound.toInt
      // dependentRequired (r14): `expected` carries the if-key, `field`
      // the then-key — a reached object with the if-key present (JSON
      // null IS present) but the then-key absent violates
      case "dep" =>
        c == "object" && v.getFieldByKey(expected) != null &&
          v.getFieldByKey(field) == null
      case "missing"  => c == "object" && v.getFieldByKey(field) == null
      // additionalProperties: false (r14): any key outside the declared
      // `keys` set on a reached OBJECT node; non-objects are their own
      // type check's business. r16: keys matched by a sibling
      // `patternProperties` selector (`pats`) are NOT additional —
      // JSON Schema's additionalProperties applies only to keys matched
      // by neither `properties` nor `patternProperties`.
      case "extra" =>
        c == "object" && {
          val n = v.objectSize()
          var i = 0
          var bad = false
          while (!bad && i < n) {
            val k = v.getFieldAtIndex(i).key
            bad = !keySet(k) && !patsCompiled.exists(_.matcher(k).find())
            i += 1
          }
          bad
        }
      // propertyNames with a pattern (r15): any KEY of a reached OBJECT
      // node failing the regex (partial match, the gate's pattern
      // convention) violates — keys never enter a compiled path, so
      // this is the one check on the keys themselves
      case "propname" =>
        c == "object" && {
          val n = v.objectSize()
          var i = 0
          var bad = false
          while (!bad && i < n) {
            bad = !compiledPattern.matcher(v.getFieldAtIndex(i).key).find()
            i += 1
          }
          bad
        }
      // conditional (r16 if/then/else + discriminated oneOf): the
      // reached node SATISFIES the `sub` terms (violates none — the r15
      // satisfaction conjunction; a term's typed-guard skip is JSON
      // Schema's vacuous pass) ⇒ the `sub2` branch terms must all hold;
      // `expected` = "else" inverts the condition. Fires when the
      // condition holds AND any branch term violates. A node violating
      // the if-side is simply the other branch's business — never a
      // violation by itself.
      case "cond" =>
        val sat = sub.forall(t => !t.nodeViolates(v, 0))
        (if (expected == "else") !sat else sat) &&
          sub2.exists(t => t.nodeViolates(v, 0))
      // group (r16): a member-conjunction wrapper used only inside
      // anyof/oneofdyn — "violates" iff ANY of its sub terms fires on
      // the node, i.e. the node does NOT satisfy the member. Never a
      // user-facing check of its own.
      case "group" => sub.exists(t => t.nodeViolates(v, 0))
      // anyOf (r16): the node must satisfy at least ONE member (`sub`
      // holds one "group" per member) — violates when every member has
      // a firing term. Evaluated on any reached node (anyOf constrains
      // every runtime type); an empty-member schema ({} admits
      // everything) makes the whole anyOf unfireable, per the spec.
      case "anyof" => sub.forall(g => g.nodeViolates(v, 0))
      // dynamic oneOf (r16): EXACTLY-ONE satisfied member, counted at
      // runtime — the general form behind the compile-time
      // discriminated desugar (members with overlapping or absent
      // types land here)
      case "oneofdyn" => sub.count(g => !g.nodeViolates(v, 0)) != 1
      // not (r16): satisfaction of the subschema IS the violation —
      // violates when no `sub` term fires. The typed-guard vacuous
      // pass carries through: `not: {minimum: 5}` rejects every
      // string, which is JSON Schema's own rule (strings vacuously
      // satisfy numeric bounds).
      case "notk" => !sub.exists(t => t.nodeViolates(v, 0))
      // dependentSchemas (r16): a reached OBJECT node carrying the
      // `expected` key (a JSON-null value IS present) must satisfy the
      // subschema's `sub` terms; non-objects and key-absent objects
      // pass (the keyword constrains nothing there)
      case "depschema" =>
        c == "object" && v.getFieldByKey(expected) != null &&
          sub.exists(t => t.nodeViolates(v, 0))
      // patternProperties (r16): on a reached OBJECT node, every key
      // matching the selector `pattern` must have a value violating
      // none of the `sub` terms (one WalkTerm per compiled inner check —
      // the caller fans the subschema's terms out one term per tag).
      // Keys ALSO declared under `properties` still re-validate here
      // when they match the selector (JSON Schema: both apply).
      case "pprop" =>
        c == "object" && {
          val n = v.objectSize()
          var i = 0
          var bad = false
          while (!bad && i < n) {
            val f = v.getFieldAtIndex(i)
            if (compiledPattern.matcher(f.key).find())
              bad = sub.exists(t => t.nodeViolates(f.value, 0))
            i += 1
          }
          bad
        }
      // additionalProperties SCHEMA form (r16): pprop's COMPLEMENT — on
      // a reached OBJECT node, every key matched by NEITHER the
      // declared `keys` set nor any `pats` selector must have a value
      // violating none of the `sub` terms (one inner term per
      // expression, the pprop fan-out convention)
      case "aprop" =>
        c == "object" && {
          val n = v.objectSize()
          var i = 0
          var bad = false
          while (!bad && i < n) {
            val f = v.getFieldAtIndex(i)
            if (!keySet(f.key) && !patsCompiled.exists(_.matcher(f.key).find()))
              bad = sub.exists(t => t.nodeViolates(f.value, 0))
            i += 1
          }
          bad
        }
      // contains/minContains/maxContains (r15): COUNT the reached ARRAY
      // node's elements that SATISFY the subschema (= violate none of
      // its `sub` terms — the per-element conjunction; a term's
      // typed-guard skip IS JSON Schema's vacuous pass, e.g. a bare
      // `minimum` admits strings); violation = count < minC or, when
      // maxC >= 0 (declared), count > maxC. Non-arrays are the type
      // check's business.
      case "contains" =>
        c == "array" && {
          val n = v.arraySize()
          var cnt = 0
          var i = 0
          while (i < n) {
            val e = v.getElementAtIndex(i)
            if (sub.forall(t => !t.nodeViolates(e, 0))) cnt += 1
            i += 1
          }
          cnt < minC || (maxC >= 0 && cnt > maxC)
        }
      // uniqueItems (r14): two equal SCALAR elements in a reached ARRAY
      // node — strings/booleans exact, numerics as the shared
      // correctly-rounded double (1 duplicates 1.0), JSON nulls all
      // equal; container elements skip (the type check's business —
      // compile required a scalar items type)
      case "unique" =>
        c == "array" && {
          val n = v.arraySize()
          val strs = new scala.collection.mutable.HashSet[String]
          val nums = new scala.collection.mutable.HashSet[Double]
          var boolT = false; var boolF = false; var nullSeen = false
          var i = 0
          var dup = false
          while (!dup && i < n) {
            val e = v.getElementAtIndex(i)
            canon(e) match {
              case "string"         => dup = !strs.add(e.getString)
              // + 0.0 folds IEEE -0.0 to 0.0: boxed-Double sets (and
              // DuckDB's varchar render) would otherwise distinguish
              // them, against the mathematical-value rule
              case "int" | "double" => dup = !nums.add(asDouble(e) + 0.0)
              case "bool" =>
                if (e.getBoolean) { dup = boolT; boolT = true }
                else { dup = boolF; boolF = true }
              case "null" => dup = nullSeen; nullSeen = true
              case _      => ()
            }
            i += 1
          }
          dup
        }
    }
  }

  /** does ANY node reached by steps(si..) from `v` violate? */
  def nodeViolates(v: Variant, si: Int): Boolean =
    if (si == steps.length) terminalViolates(v)
    else steps(si) match {
      case "[]" =>
        if (canon(v) != "array") false
        else {
          val n = v.arraySize()
          var i = 0
          var bad = false
          while (!bad && i < n) {
            bad = nodeViolates(v.getElementAtIndex(i), si + 1)
            i += 1
          }
          bad
        }
      case f =>
        if (canon(v) != "object") false
        else {
          val fv = v.getFieldByKey(f)
          fv != null && nodeViolates(fv, si + 1)
        }
    }
}

/** ONE per-element JSON-Schema `items` check over an `array<variant>`
  * column, as a native codegen expression: true iff ANY node reached by
  * walking `steps` from ANY element violates the terminal check
  * ([[graft.schema.JsonSchemaGate]]'s per-element validation — r12
  * flat elements, r13 FULL RECURSION).
  *
  * Why a native: the natural spelling — `exists` / `zip_with` lambdas
  * over the extracted array — is CodegenFallback, and ONE fallback drops
  * the gate's WHOLE projection out of whole-stage codegen (the r6
  * fusion-sweep lesson, plans/FUSION.md; measured: the per-element
  * feature's first HOF cut de-fused the parse + every path check and
  * doubled the gate row). Here each check is one compiled walk per row
  * and the projection stays fused.
  *
  * The WALK (r13): `steps` descends from each top-level array element —
  * the literal `"[]"` iterates a nested array's elements, any other
  * string descends into that object field. Non-matching nodes SKIP
  * silently (a non-object at a field step / non-array at an element step
  * is the type check at ITS OWN path's business, exactly the scalar
  * convention), as does an absent field (the `missing` check's
  * business). The terminal check then fires on every reached node.
  * `steps = Nil` reproduces the r12 flat-element semantics bit for bit.
  *
  * Terminal semantics, element for element ≡ the HOF spelling:
  *
  *  - a node's canonical type folds from the VARIANT ENCODING's own
  *    type tag exactly as `schema_of_variant` does (LONG → int,
  *    DOUBLE/DECIMAL/FLOAT → double, STRING → string, BOOLEAN → bool,
  *    OBJECT/ARRAY/NULL as named, everything else → other) — the same
  *    alphabet [[graft.schema.JsonSchemaGate]]'s path checks use;
  *  - `kind = "type"`: a reached node whose canonical type fails the
  *    declared one (number admits int|double, integer only int, boolean
  *    folds to bool) violates — including a reached JSON null;
  *  - `kind = "enum"`: TYPED membership — a string node checks against
  *    the enum's string members, an int node against its integer members
  *    by EXACT long compare, a double node against its double members
  *    (the correctly-rounded double both engines parse from the same
  *    JSON text), a bool against its boolean members; a node of a
  *    checkable scalar type with NO same-type members violates (enum
  *    [1,2,3] rejects "four" as well as 4); object/array/null nodes stay
  *    the type check's business. Cross-type numeric equality (1 matching
  *    an enum literal 1.0) is out of subset, documented;
  *  - `kind = "minlen"` / `"maxlen"`: checked only on STRING nodes;
  *    lengths count CODE POINTS (Spark `length` ≡ DuckDB `length`);
  *  - `kind = "pattern"` (r13): checked only on STRING nodes — Java
  *    regex partial-match (`find()`), the shared semantics of Spark
  *    RLIKE and DuckDB `regexp_matches` (the gate's compile step rejects
  *    dialect-divergent constructs);
  *  - `kind = "min"` / `"max"` (inclusive), `"xmin"` / `"xmax"`
  *    (exclusive, r13), `"multipleof"` (r13, IEEE truncated remainder ≠
  *    0 — Java `%` ≡ DuckDB DOUBLE `%` on the same operands): checked
  *    only on int|double nodes, compared as doubles (the
  *    correctly-rounded widening `cast(variant as double)` performs);
  *  - `kind = "minitems"` / `"maxitems"` (r13, nested arrays): checked
  *    only on ARRAY nodes — element count vs the bound;
  *  - `kind = "missing"`: any reached OBJECT node lacking the required
  *    `field` violates — a JSON-null field is PRESENT (its own type
  *    check's business), non-object nodes are their type check's
  *    business;
  *  - `kind = "extra"` (r14, `additionalProperties: false`): any reached
  *    OBJECT node carrying a key outside the declared `keys` set
  *    violates (an empty declared set means any key does); non-objects
  *    are their type check's business;
  *  - `kind = "propname"` (r15, `propertyNames` with a `pattern`): any
  *    reached OBJECT node with a KEY failing the regex (partial match)
  *    violates — the one check on the keys themselves;
  *  - `kind = "contains"` (r15, `contains`/`minContains`/`maxContains`):
  *    a reached ARRAY node violates when the COUNT of its elements
  *    satisfying the subschema (= violating none of `subTerms` — the
  *    per-element conjunction over the subschema's own compiled walk)
  *    is below `minC` or above a declared `maxC` (-1 = unbounded);
  *  - `kind = "cond"` (r16, `if`/`then`/`else` + discriminated `oneOf`):
  *    a reached node violates when it satisfies the `subTerms`
  *    conjunction (violates none — `expected = "else"` inverts) AND
  *    violates any `sub2Terms` branch term;
  *  - `kind = "pprop"` (r16, `patternProperties`): a reached OBJECT
  *    node violates when any key matching the selector `pattern` has a
  *    value violating any `subTerms` term (callers pass ONE inner term
  *    per expression — one tag per compiled inner check);
  *  - `kind = "aprop"` (r16, the `additionalProperties` SCHEMA form):
  *    pprop's complement — keys matched by neither the declared `keys`
  *    set nor any `pats` selector validate their values against the
  *    single inner term;
  *  - `kind = "anyof"` (r16, `anyOf`): `subTerms` holds one `"group"`
  *    term per member (a group "violates" iff any of its own sub terms
  *    fires — i.e. the node fails that member); the node violates when
  *    EVERY member fails. `kind = "oneofdyn"` (r16, the dynamic
  *    `oneOf` form behind the discriminated desugar) counts satisfied
  *    members the same way and violates when the count ≠ 1;
  *  - `kind = "notk"` (r16, `not`): the node violates when it
  *    SATISFIES the `subTerms` conjunction (violates none) — the
  *    typed-guard vacuous pass carries through, so `not: {minimum: 5}`
  *    rejects strings (JSON Schema's own rule);
  *  - `kind = "depschema"` (r16, `dependentSchemas`): a reached OBJECT
  *    node carrying the `expected` key must satisfy `subTerms`;
  *  - a JSON null node has canonical type "null" (violates any declared
  *    type, invisible to value checks and to further descent); a
  *    SQL-null element slot in the TOP array (not producible from
  *    `try_variant_get`'s array extraction, handled defensively) is
  *    treated the same;
  *  - null ARRAY input → null (the `exists(null, …)` convention; the
  *    caller guards on the node being array-typed anyway).
  */
case class VariantItemsViolates(child: Expression, steps: Seq[String],
                                kind: String,
                                expected: String, enumStrs: Seq[String],
                                enumLongs: Seq[Long], enumDoubles: Seq[Double],
                                enumBools: Seq[Boolean],
                                bound: Double, field: String,
                                pattern: String,
                                keys: Seq[String] = Nil,
                                subTerms: Seq[WalkTerm] = Nil,
                                minC: Int = 1, maxC: Int = -1,
                                sub2Terms: Seq[WalkTerm] = Nil,
                                pats: Seq[String] = Nil)
    extends UnaryExpression with ExpectsInputTypes {

  require(Seq("type", "enum", "min", "max", "xmin", "xmax", "multipleof",
    "minlen", "maxlen", "minitems", "maxitems", "missing",
    "pattern", "extra", "unique", "minprops", "maxprops",
    "dep", "contains", "propname", "cond", "pprop", "aprop",
    "anyof", "oneofdyn", "notk", "depschema").contains(kind),
    s"variant_items_violates: unknown kind '$kind'")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(VariantType))
  override def dataType: DataType = BooleanType
  override def prettyName: String = "variant_items_violates"
  override def nullable: Boolean = true

  /** the expression's own (steps, terminal) as the root walk term. */
  @transient private lazy val rootTerm: WalkTerm =
    WalkTerm(steps, kind, expected, enumStrs, enumLongs, enumDoubles,
      enumBools, bound, field, pattern, keys, subTerms, minC, maxC,
      sub2Terms, pats)

  /** match against the declared type spec (SQL-null top slots only). */
  private def typeMatchesNull: Boolean =
    expected.split('|').contains("null")

  /** Shared eval/codegen body (public for the generated code). */
  def doViolates(arr: ArrayData): Boolean = {
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) {
        // a SQL-null slot reads as canonical "null": terminal only (it is
        // neither object nor array, so every walk step skips it), and
        // visible to the type check alone (value checks skip
        // non-matching runtime types)
        if (steps.isEmpty && kind == "type" && !typeMatchesNull)
          return true
      } else {
        val vv = arr.getVariant(i)
        if (rootTerm.nodeViolates(new Variant(vv.getValue, vv.getMetadata), 0))
          return true
      }
      i += 1
    }
    false
  }

  override def nullSafeEval(v: Any): Any = doViolates(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val self = ctx.addReferenceObj("itemsCheck", this,
        classOf[VariantItemsViolates].getName)
      s"${ev.value} = $self.doViolates($in);"
    })

  override protected def withNewChildInternal(newChild: Expression): VariantItemsViolates =
    copy(child = newChild)
}
