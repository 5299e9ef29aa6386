package graft.schema

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** JSON-Schema message validation gate — the working form of the
  * reference's dead-code `JsonValidator` experiment
  * (exp/nanostream_json_validator.py:6-23: validate each message against
  * a JSON Schema), rebuilt as a codegen Column pipeline over a JSON
  * string column.
  *
  * Supported subset: `type` (object / array / string / integer / number /
  * boolean / null — as one name or a UNION array, r14: the nullable
  * idiom `["string", "null"]` admits a value matching ANY member; value
  * checks stay typed-guarded, so a null under a nullable declaration
  * passes the type check and skips every value check), `required`, `enum` (TYPED values, r13: string, integer,
  * number, boolean literals — a string value checks against the string
  * members, an int value against the integer members by EXACT long
  * compare, a double value against the number members as the
  * correctly-rounded double both engines parse from the same JSON text,
  * a bool against the boolean members; a scalar value with NO same-type
  * members violates, so `enum: [1,2,3]` rejects `4` AND `"four"`;
  * object/array/null values stay the type check's business; cross-type
  * numeric equality — 1 matching an enum literal 1.0 — is out of
  * subset), `const` (r13 — compiles as a one-member typed enum;
  * declaring both enum and const aborts), `minimum`/`maximum` and r13
  * `exclusiveMinimum`/`exclusiveMaximum` (numeric bounds, compared as
  * correctly-rounded doubles on both engines), r13 `multipleOf`
  * (strictly positive; violation = IEEE truncated remainder ≠ 0, the
  * same `%` both engines compute on the same doubles; root-level value
  * checks fire at `$` too, r13), `minLength`/`maxLength`
  * (string lengths in code points — Spark `length` ≡ DuckDB `length`),
  * `minItems`/`maxItems` (r13 array element-count bounds — Spark `size`
  * over the extracted array ≡ DuckDB `json_array_length`, fired only on
  * array-typed nodes as `minitems:`/`maxitems:$.p`), r14
  * `minProperties`/`maxProperties` (object KEY-COUNT bounds — the native
  * walk's objectSize ≡ DuckDB `len(json_keys)`, fired only on
  * object-typed nodes as `minprops:`/`maxprops:$.p`),
  * `pattern` (r13: regex PARTIAL match on string-typed nodes — Spark
  * RLIKE ≡ DuckDB `regexp_matches`; compile rejects backreferences,
  * lookaround, and r14 `\Z` + possessive quantifiers — the constructs
  * where the two engines' regex dialects diverge — and pre-compiles the
  * pattern so a syntax error aborts at plan time; r14: an unescaped `$`
  * anchors END OF TEXT on both engines — the Spark-side pattern rewrites
  * it to Java's `\z`, because Java's default `$` also matches before a
  * final line terminator where RE2's does not, see [[javaPatternForm]]),
  * r14 `additionalProperties` (BOOLEAN form only: `false` closes the
  * object — a runtime key outside the declared `properties` set fires
  * `extra:$.path`, one static tag per closed object (fragments are
  * compile-time literals on both engines, so the tag names the object
  * path, not the offending key); `true` is the default open object; the
  * schema form aborts), r14 `uniqueItems` (`unique:$.path` when the
  * array holds two equal SCALAR elements — strings/booleans exact,
  * numerics as the shared correctly-rounded double so 1 duplicates 1.0,
  * JSON nulls all equal; REQUIRES a declared scalar items type —
  * container deep-equality is out of subset and aborts; runtime
  * container elements are the type check's business; DuckDB replay
  * counts (type-bucket, value) distincts over a NULL-PRESERVING element
  * list — `json_extract('$[*]')` folds JSON null elements to SQL NULL,
  * so every per-element replay routes through a list_transform that
  * restores the JSON null literal, keeping element classification
  * engine-identical),
  * r15 `contains`/`minContains`/`maxContains` (the array must hold
  * between minContains (default 1) and maxContains (default unbounded)
  * elements SATISFYING the subschema — satisfaction is the ANY/COUNT
  * quantification of the same per-element walk: an element satisfies iff
  * it violates NONE of the subschema's compiled terms, a term's
  * typed-guard skip being exactly JSON Schema's vacuous pass; tag
  * `contains:$.p`; nested contains-in-contains aborts — no static
  * single-tag check list), r15 `propertyNames` (PATTERN form only — the
  * one check on the KEYS themselves, partial-match like `pattern`; keys
  * never enter a compiled path so the path-injection identifier rule
  * does not apply; tag `propname:$.p`; any other propertyNames keyword
  * aborts),
  * r14 local `$ref`/`$defs` (inlined at compile — see [[inlineRefs]]:
  * non-local/unresolvable/sibling-carrying/CYCLIC refs abort loudly, a
  * recursive schema has no static check list), r14 `allOf` (conjunction
  * by compile-time MERGE — the `$ref`-base + extra-properties
  * inheritance idiom; see [[mergeSchemas]] for the merge laws and the
  * loud collision aborts),
  * r16 `if`/`then`/`else` (restricted path-level implication: the `if`
  * subschema compiles through the same walk and its SATISFACTION — the
  * r15 contains evaluator, a node satisfies iff it violates none of the
  * compiled terms, typed-guard skips being JSON Schema's vacuous pass —
  * gates the `then` branch checks, its negation the `else` branch; one
  * static tag per branch, `then:$.p` / `else:$.p`, at paths, the root,
  * and element depth; an ABSENT node validates nothing; `then`/`else`
  * without `if`, or `if` without a branch, abort — spec-ignored
  * keywords must not silently no-op),
  * r16 `oneOf` (members with pairwise-disjoint declared `type`s — the
  * tagged-union idiom — take the DISCRIMINATED desugar: the applicable
  * member is a total function of the runtime type tag, so exactly-one
  * is static and compiles to the synthesized union type check
  * `type:$.p` plus one conditional per member, tag `oneof:$.p`;
  * overlapping or type-free members take the DYNAMIC form — satisfied
  * members counted at runtime via the satisfaction evaluator, one
  * static tag `oneof:$.p` firing when the count ≠ 1),
  * r16 `anyOf` (at-least-one member satisfied, tag `anyof:$.p` when
  * every member has a firing term), `not` (satisfaction of the
  * subschema IS the violation, tag `not:$.p` — the typed-guard vacuous
  * pass carries through, so `not: {minimum: 5}` rejects strings, JSON
  * Schema's own rule), and `dependentSchemas` (presence of a key
  * requires the object to satisfy the paired subschema, one tag per
  * key `depschema:$.p.key`) — each at paths, the root, and element
  * depth; the satisfaction quantifications are single static tags, so
  * the whole disjunction/negation vocabulary now compiles where r15
  * adjudicated it un-compilable term-by-term,
  * r16 `patternProperties` (every runtime key matching a selector
  * pattern has its VALUE validated against the selector's subschema —
  * one check and tag per compiled inner term, `pprop:$.p.<kind>`
  * rendered from the inner walk; selectors are runtime KEY regexes,
  * never path-interpolated; a sibling `additionalProperties: false`
  * admits selector-matched keys, the spec's matched-by-neither rule;
  * DuckDB replay re-roots each selected value via a JSON Pointer built
  * from the key, so path syntax in runtime keys cannot inject),
  * nested `properties` to any depth, and `items` with PER-ELEMENT
  * validation to ANY DEPTH (r12 flat, r13 FULL RECURSION): every
  * schema node reachable from an array element — through nested object
  * `properties` and nested `items` (arrays of arrays) alike — has its
  * `type`/`enum`/bounds/length/`pattern`/`minItems`/`maxItems`/
  * `required` checks evaluated against EVERY reached runtime node, as
  * violation tags rooted at the array path (`type:$.p[]`,
  * `min:$.p[].qty`, `maxitems:$.p[].dims`, `type:$.p[].dims[]`,
  * `missing:$.p[].meta.w`, …). The walk skips silently exactly where
  * the scalar convention does: a non-object at a field step / non-array
  * at an element step is the type check at its own path's business, an
  * absent field is the missing check's business, and each terminal
  * check fires only on nodes of its checkable runtime type (a
  * present-but-JSON-null node fails the type check, never a value
  * check). Every check runs inside ONE native compiled walk per (path,
  * check) — [[org.apache.spark.sql.graftglue.VariantItemsViolates]] —
  * over the once-extracted `array<variant>`, so the gate stays one
  * fused codegen stage.
  *
  * A `required` name with NO matching `properties` entry still fires its
  * `missing` check (r13 — previously silently skipped), and an
  * UNRECOGNIZED schema keyword aborts LOUDLY at compile unless it is a
  * known no-validation annotation (`$schema`/`$id`/`title`/
  * `description`/`default`/`examples`/`$comment`) — a silently-ignored
  * constraint is the failure mode this gate exists to close. Integers
  * beyond the int64 range stay out of subset (they classify
  * engine-dependently), as does cross-type numeric enum equality.
  *
  * Validation semantics (JSON-Schema-conventional):
  *  - an unparseable or NULL message → the single violation `malformed`;
  *  - a `required` name absent from its (present) parent object →
  *    `missing:$.path`;
  *  - a PRESENT value (including JSON null) whose type differs from the
  *    declared one → `type:$.path`; `number` admits ints, `integer` does
  *    not admit decimals;
  *  - a present string outside its `enum` → `enum:$.path`;
  *  - checks under an object are CONDITIONAL on that object being present
  *    and object-typed — a missing `user` fires `missing:$.user` once,
  *    not a cascade for every child.
  *
  * Cross-engine exactness (the repo's oracle bar): the type of a JSON
  * node is introspected via Spark's variant functions
  * (`try_parse_json` / `try_variant_get` / `schema_of_variant` /
  * `is_variant_null`) and DuckDB's `json_type`, both folded to ONE
  * canonical type alphabet {int, double, string, bool, object, array,
  * null}; the violation string is `concat_ws(",", …)` over the SAME
  * fragment order on both engines (both skip NULL fragments and yield ""
  * when every check passes). [[oracleChecksSql]] generates the DuckDB
  * replay from the SAME compiled schema walk, so the two engines' check
  * lists cannot drift — the htmlEntities single-sourcing device.
  *
  * Scale shape: everything is a per-row projection (no shuffle, no UDF);
  * the parse cost is one `try_parse_json` per row (aliased to one
  * internal column, consumed by every check) plus one `from_json` for
  * the typed struct output.
  */
object JsonSchemaGate {

  private val mapper = new ObjectMapper()

  /** One typed `enum` member (r13): the literal's own JSON type decides
    * which runtime values it can match — see the class doc's enum rules.
    */
  private sealed trait EnumVal
  private final case class EStr(v: String) extends EnumVal
  private final case class EInt(v: Long) extends EnumVal
  private final case class EDbl(v: Double) extends EnumVal
  private final case class EBool(v: Boolean) extends EnumVal

  /** One node of the compiled schema tree. `closed` is
    * `additionalProperties: false` (r14): an object-typed runtime node
    * at this path may carry no key outside the declared `properties`
    * set.
    */
  private case class Node(typ: Option[String], enumVals: Seq[EnumVal],
                          required: Set[String], props: Seq[(String, Node)],
                          items: Option[Node],
                          minimum: Option[Double] = None,
                          maximum: Option[Double] = None,
                          exclusiveMinimum: Option[Double] = None,
                          exclusiveMaximum: Option[Double] = None,
                          multipleOf: Option[Double] = None,
                          minLength: Option[Int] = None,
                          maxLength: Option[Int] = None,
                          minItems: Option[Int] = None,
                          maxItems: Option[Int] = None,
                          pattern: Option[String] = None,
                          closed: Boolean = false,
                          uniqueItems: Boolean = false,
                          minProps: Option[Int] = None,
                          maxProps: Option[Int] = None,
                          deps: Seq[(String, String)] = Nil,
                          contains: Option[Node] = None,
                          minContains: Option[Int] = None,
                          maxContains: Option[Int] = None,
                          propNames: Option[String] = None,
                          ifSub: Option[Node] = None,
                          thenSub: Option[Node] = None,
                          elseSub: Option[Node] = None,
                          oneOfSubs: Seq[Node] = Nil,
                          patProps: Seq[(String, Node)] = Nil,
                          oneOfDyn: Seq[Node] = Nil,
                          anyOfSubs: Seq[Node] = Nil,
                          notSub: Option[Node] = None,
                          depSchemas: Seq[(String, Node)] = Nil,
                          addProps: Option[Node] = None)

  /** keywords this gate VALIDATES, plus JSON-Schema annotations that
    * carry no validation semantics (ignoring them is not a silent
    * no-op). Anything else — `additionalProperties`, `oneOf`, `$ref`,
    * `patternProperties`, … — aborts LOUDLY at compile: a schema author
    * must never discover a constraint was skipped by a bad row sailing
    * through.
    */
  private val knownKeywords = Set(
    "type", "enum", "const", "required", "properties", "items",
    "minimum", "maximum", "exclusiveMinimum", "exclusiveMaximum",
    "multipleOf", "minLength", "maxLength",
    "minItems", "maxItems", "pattern", "additionalProperties",
    "uniqueItems", "minProperties", "maxProperties", "dependentRequired",
    "contains", "minContains", "maxContains", "propertyNames",
    "if", "then", "else", "oneOf", "patternProperties",
    "anyOf", "not", "dependentSchemas",
    // no-validation annotations — `format` is annotation-only in JSON
    // Schema 2020-12 unless a dialect opts into format-assertion, which
    // this gate does not claim
    "$schema", "$id", "$comment", "title", "description", "default",
    "examples", "format")

  private def compile(n: JsonNode): Node = {
    // a BOOLEAN schema (`"items": false` = reject everything) would
    // otherwise compile to an empty Node = accept everything — the exact
    // silent inversion the no-silent-no-op rule forbids
    require(n.isObject, s"JSON-Schema node must be an object, got: $n")
    n.fieldNames().asScala.foreach { k =>
      require(knownKeywords(k),
        s"unsupported JSON-Schema keyword: $k (the gate validates " +
          "type/enum/const/required/properties/items/bounds/lengths/" +
          "pattern/additionalProperties/patternProperties/uniqueItems/" +
          "contains/propertyNames/if-then-else/oneOf/anyOf/not/" +
          "dependentRequired/dependentSchemas/allOf/$ref; a keyword it " +
          "cannot enforce must abort rather than silently no-op)")
    }
    // keyword ARGUMENT nodes are type-checked before coercion (r14 —
    // Jackson's asDouble()/asInt()/asText() coerce silently: a draft-4
    // boolean `"exclusiveMinimum": true` would compile to the numeric
    // bound 1.0, `"minLength": 2.7` would truncate to 2, `"pattern": 5`
    // would become the regex "5" — each a silent misvalidation, the
    // exact failure mode the unrecognized-keyword abort exists to close)
    def numKw(kw: String): Option[Double] = Option(n.get(kw)).map { v =>
      require(v.isNumber,
        s"$kw must be a JSON number, got: $v (a draft-4 boolean " +
          "exclusiveMinimum/Maximum form is out of the supported subset)")
      v.asDouble()
    }
    def intKw(kw: String): Option[Int] = Option(n.get(kw)).map { v =>
      require(v.isIntegralNumber && v.canConvertToInt,
        s"$kw must be a JSON non-negative integer, got: $v")
      require(v.asInt() >= 0, s"$kw must be non-negative, got: $v")
      v.asInt()
    }
    // `type` (r14: UNION form): a string or an array of strings — the
    // nullable-field idiom `["string", "null"]` is the overwhelmingly
    // common case. Stored as a pipe-joined member spec ("string|null");
    // a runtime node passes when its canonical type matches ANY member.
    // `"null"` is a full member type (alone or in a union).
    val typ = Option(n.get("type")).map { t =>
      val members: Seq[String] =
        if (t.isTextual) Seq(t.asText())
        else if (t.isArray) {
          val ms = t.elements().asScala.toSeq
          ms.foreach(m => require(m.isTextual,
            s"type union members must be strings, got: $t"))
          val names = ms.map(_.asText())
          require(names.nonEmpty, s"empty type union: $t")
          require(names.distinct.size == names.size,
            s"duplicate type union members: $t")
          names
        } else throw new IllegalArgumentException(
          s"type must be a string or an array of strings, got: $t")
      members.foreach(m => require(Seq("object", "array", "string",
        "integer", "number", "boolean", "null").contains(m),
        s"unsupported JSON-Schema type: $m"))
      members.mkString("|")
    }
    def literal(e: JsonNode, kw: String): EnumVal =
      if (e.isTextual) EStr(e.asText())
      else if (e.isBoolean) EBool(e.asBoolean())
      else if (e.isIntegralNumber && e.canConvertToLong) EInt(e.asLong())
      else if (e.isIntegralNumber) throw new IllegalArgumentException(
        // silently reclassifying 2^63 as a double member would change
        // which runtime values match, engine-dependently — abort
        s"integer $kw literal beyond int64 is out of the supported " +
          s"subset (classifies engine-dependently): $e")
      else if (e.isNumber) EDbl(e.asDouble())
      else throw new IllegalArgumentException(
        s"unsupported $kw literal (string/int/number/boolean only): $e")
    // `const` compiles as a ONE-MEMBER enum (identical semantics: the
    // value must equal the literal, typed); declaring both is ambiguous
    // and aborts
    require(!(n.has("enum") && n.has("const")),
      "a schema node declaring BOTH enum and const is ambiguous")
    Option(n.get("enum")).foreach(e => require(e.isArray,
      s"enum must be a JSON array, got: $e"))
    val enumVals: Seq[EnumVal] =
      Option(n.get("enum")).toSeq.flatMap(_.elements().asScala)
        .map(literal(_, "enum")) ++
        Option(n.get("const")).map(literal(_, "const"))
    Option(n.get("required")).foreach { r =>
      require(r.isArray, s"required must be a JSON array, got: $r")
      r.elements().asScala.foreach(e => require(e.isTextual,
        s"required names must be strings, got: $e"))
    }
    val req = Option(n.get("required")).toSeq
      .flatMap(_.elements().asScala).map(_.asText()).toSet
    // names interpolate into JSON paths on BOTH engines — a
    // non-identifier name is a path-injection vector and must abort
    // (the cypherStatements rule). `required` names interpolate too
    // (r13: they fire `missing` even without a properties entry).
    req.foreach { k =>
      require(k.matches("[A-Za-z_][A-Za-z0-9_]*"),
        s"non-identifier required name: $k")
    }
    val props = Option(n.get("properties")).toSeq.flatMap { p =>
      p.fields().asScala.map { e =>
        require(e.getKey.matches("[A-Za-z_][A-Za-z0-9_]*"),
          s"non-identifier property name: ${e.getKey}")
        (e.getKey, compile(e.getValue))
      }
    }
    val items = Option(n.get("items")).map(compile)
    val pat = Option(n.get("pattern")).map { v =>
      require(v.isTextual, s"pattern must be a JSON string, got: $v")
      val p = v.asText()
      // dialect scan + the `$` normalization happen ONCE at compile —
      // a rejected construct or a syntax error aborts at plan time, not
      // per-row (javaPatternForm pre-compiles the Java form)
      javaPatternForm(p)
      p
    }
    val mof = numKw("multipleOf")
    mof.foreach(m => require(m > 0,
      s"multipleOf must be strictly positive, got $m"))
    // additionalProperties: boolean form (r14) — `false` closes the
    // object (no runtime key outside the declared `properties` set,
    // r16: or matched by a `patternProperties` selector), `true` is the
    // default open object; SCHEMA form (r16, late-round) — every key
    // matched by NEITHER `properties` NOR a `patternProperties`
    // selector validates its value against the subschema (the
    // complement-selector twin of pprop), one check and tag per
    // compiled inner term (`aprop:$.p.<kind>`).
    val apNode = Option(n.get("additionalProperties"))
    apNode.foreach(v => require(v.isBoolean || v.isObject,
      "additionalProperties must be a boolean or a schema object, " +
        s"got: $v"))
    val closed = apNode.exists(v => v.isBoolean && !v.asBoolean())
    val addProps = apNode.filter(_.isObject).map(compile)
    // uniqueItems (r14): REQUIRES a declared scalar items type — deep
    // container equality cannot be made engine-identical, so an
    // object/array/untyped element schema aborts loudly; runtime
    // container elements under a scalar declaration are the type check's
    // business (they fire type:, uniqueness skips them). Numbers compare
    // as the shared correctly-rounded DOUBLE (1 and 1.0 are duplicates —
    // the JSON-Schema mathematical-value rule, and the gate's
    // established numeric convention); JSON nulls are all equal.
    // dependentRequired (r14): presence of key A on an object requires
    // keys B… — flattened to (if, then) pairs in declaration order; both
    // sides are path-interpolated names, so the identifier guard applies
    val deps: Seq[(String, String)] =
      Option(n.get("dependentRequired")).toSeq.flatMap { d =>
        require(d.isObject,
          s"dependentRequired must be an object of name -> [names]: $d")
        d.fields().asScala.flatMap { e =>
          require(e.getKey.matches("[A-Za-z_][A-Za-z0-9_]*"),
            s"non-identifier dependentRequired name: ${e.getKey}")
          require(e.getValue.isArray,
            s"dependentRequired values must be arrays of names: ${e.getValue}")
          e.getValue.elements().asScala.map { t =>
            require(t.isTextual && t.asText().matches("[A-Za-z_][A-Za-z0-9_]*"),
              s"non-identifier dependentRequired target: $t")
            (e.getKey, t.asText())
          }
        }.toSeq
      }
    val unique = Option(n.get("uniqueItems")).exists { v =>
      require(v.isBoolean, s"uniqueItems must be a boolean, got: $v")
      v.asBoolean()
    }
    if (unique) {
      val members = items.flatMap(_.typ).toSeq.flatMap(_.split('|'))
      require(members.nonEmpty &&
        members.forall(Seq("string", "integer", "number", "boolean",
          "null").contains) &&
        members.exists(_ != "null"),
        "uniqueItems requires a declared SCALAR items type " +
          "(string/integer/number/boolean, optionally unioned with " +
          "null) — container-element deep equality is out of the " +
          "supported subset and must abort rather than silently no-op")
    }
    // contains/minContains/maxContains (r15): the subschema compiles
    // like any other node — an array element SATISFIES it iff it
    // violates NONE of the subschema's walk terms (a term's typed-guard
    // skip is exactly JSON Schema's vacuous pass: a bare `minimum`
    // admits strings). A NESTED contains inside the subschema would put
    // a count-quantifier under a count-quantifier — out of subset, loud
    // abort (no static single-tag check list). min/maxContains without
    // contains, or a statically unsatisfiable pair, abort too.
    val containsSub = Option(n.get("contains")).map { c =>
      val sub = compile(c)
      def noNested(nd: Node): Unit = {
        require(nd.contains.isEmpty,
          "a nested `contains` inside a contains subschema is out of " +
            "the supported subset (a count quantifier under a count " +
            "quantifier has no static single-tag check list)")
        nd.props.foreach { case (_, p) => noNested(p) }
        nd.items.foreach(noNested)
        (nd.ifSub ++ nd.thenSub ++ nd.elseSub ++ nd.oneOfSubs ++
          nd.patProps.map(_._2) ++ nd.oneOfDyn ++ nd.anyOfSubs ++
          nd.notSub ++ nd.depSchemas.map(_._2) ++ nd.addProps)
          .foreach(noNested)
      }
      noNested(sub)
      sub
    }
    val minCont = intKw("minContains")
    val maxCont = intKw("maxContains")
    require(containsSub.nonEmpty || (minCont.isEmpty && maxCont.isEmpty),
      "minContains/maxContains without a `contains` subschema " +
        "constrain nothing — a silently-ignored keyword must abort")
    for (lo <- minCont.orElse(Some(1).filter(_ => maxCont.nonEmpty));
         hi <- maxCont)
      require(hi >= lo,
        s"maxContains ($hi) < minContains ($lo) is statically " +
          "unsatisfiable — every array would violate; abort loudly")
    // propertyNames (r15): a check on the KEYS themselves — keys never
    // enter a compiled path, so only the PATTERN form is in subset
    // (`propertyNames: {pattern: "..."}`; partial match, the gate's
    // pattern convention). Any other subschema keyword on the keys
    // (type/enum/length…) aborts loudly.
    val propNamesPat = Option(n.get("propertyNames")).map { v =>
      require(v.isObject && v.size == 1 && v.has("pattern") &&
        v.get("pattern").isTextual,
        "propertyNames supports exactly the pattern form " +
          s"""({"pattern": "..."}) in the supported subset, got: $v""")
      val p = v.get("pattern").asText()
      javaPatternForm(p)
      p
    }
    // if/then/else (r16): restricted path-level implication — the `if`
    // subschema compiles through the same walk as everything else and
    // its SATISFACTION (the r15 contains evaluator: a node satisfies a
    // subschema iff it violates none of its compiled terms; typed-guard
    // skips are JSON Schema's vacuous pass) conditions the `then` branch
    // checks, its negation the `else` branch. Every fragment stays a
    // static compile-time literal on both engines. `then`/`else` without
    // `if` are spec-IGNORED keywords (abort rather than silently no-op),
    // and `if` without a branch validates nothing (abort too).
    val ifSub = Option(n.get("if")).map(compile)
    val thenSub = Option(n.get("then")).map(compile)
    val elseSub = Option(n.get("else")).map(compile)
    require(ifSub.nonEmpty || (thenSub.isEmpty && elseSub.isEmpty),
      "then/else without if validate nothing (the spec ignores them) — " +
        "a silently-ignored keyword must abort")
    require(ifSub.isEmpty || thenSub.nonEmpty || elseSub.nonEmpty,
      "if without then or else validates nothing — a silently-ignored " +
        "keyword must abort")
    // oneOf (r16): members declaring pairwise-DISJOINT `type`s (the
    // tagged-union idiom) take the DISCRIMINATED desugar — which member
    // applies is a total function of the runtime type tag, so "exactly
    // one" is static: the union type check (any member's type admits)
    // plus one conditional term per member (under "is M's type", M's
    // own checks — finer tags, cheaper evaluation). Members with
    // overlapping or missing types (r16 later-in-round) fall through to
    // the DYNAMIC form: exactly-one counted at runtime over member
    // SATISFACTION (the r15 contains evaluator — a node satisfies a
    // member iff it violates none of its compiled terms), one static
    // tag (`oneof:$p`).
    val oneOfMembers: Seq[Node] = Option(n.get("oneOf")).toSeq.flatMap { o =>
      require(o.isArray && o.size >= 2,
        s"oneOf must be an array of at least 2 schemas, got: $o")
      o.elements().asScala.toSeq.map(compile)
    }
    def admitted(spec: String): Set[String] =
      spec.split('|').toSet.flatMap { (m: String) => m match {
        case "number"  => Set("int", "double")
        case "integer" => Set("int")
        case "boolean" => Set("bool")
        case other     => Set(other)
      }}
    val discriminated = oneOfMembers.nonEmpty &&
      oneOfMembers.forall(_.typ.nonEmpty) && {
        val sets = oneOfMembers.map(m => admitted(m.typ.get))
        sets.indices.forall(i => (i + 1 until sets.size).forall(j =>
          (sets(i) intersect sets(j)).isEmpty))
      }
    val oneOfSubs = if (discriminated) oneOfMembers else Nil
    val oneOfDyn = if (discriminated) Nil else oneOfMembers
    require(oneOfSubs.isEmpty || typ.isEmpty,
      "a node declaring BOTH type and oneOf is ambiguous in the " +
        "discriminated-union subset (the union type is synthesized " +
        "from the members)")
    val effTyp =
      typ.orElse(Option.when(oneOfSubs.nonEmpty)(
        oneOfSubs.map(_.typ.get).mkString("|")))
    // anyOf (r16): at-least-one member satisfied — the same satisfaction
    // quantification as the dynamic oneOf, violation = every member has
    // a firing term, one static tag (`anyof:$p`).
    val anyOfSubs: Seq[Node] = Option(n.get("anyOf")).toSeq.flatMap { a =>
      require(a.isArray && a.size >= 1,
        s"anyOf must be a non-empty array of schemas, got: $a")
      a.elements().asScala.toSeq.map(compile)
    }
    // not (r16): satisfaction of the subschema IS the violation
    // (`not:$p`). The subset's typed-guard vacuous pass carries
    // through — `not: {minimum: 5}` rejects every string, which is
    // JSON Schema's own rule (strings vacuously satisfy numeric
    // bounds). ONE subset-vs-2020-12 divergence rides along, documented
    // and spec-pinned: the subset's enum/const constrain only
    // same-scalar-type values (object/array/null are "the type check's
    // business"), so under negation a JSON null SATISFIES {const: 9}
    // here and `not: {const: 9}` fires on it, where a full validator
    // passes (null ≠ 9 fails const, so not succeeds). Declare the
    // subschema's type (not: {type: integer, const: 9}) to get
    // full-spec behavior — the type term then fails off-type values.
    val notSub = Option(n.get("not")).map(compile)
    // dependentSchemas (r16): presence of a key requires the node to
    // satisfy the paired subschema — one check and tag per key
    // (`depschema:$p.key`); keys interpolate into the presence probe's
    // path, so the identifier guard applies (the dependentRequired
    // rule).
    val depSchemas: Seq[(String, Node)] =
      Option(n.get("dependentSchemas")).toSeq.flatMap { d =>
        require(d.isObject,
          s"dependentSchemas must be an object of name -> schema: $d")
        d.fields().asScala.map { e =>
          require(e.getKey.matches("[A-Za-z_][A-Za-z0-9_]*"),
            s"non-identifier dependentSchemas name: ${e.getKey}")
          (e.getKey, compile(e.getValue))
        }.toSeq
      }
    // patternProperties (r16): for every runtime key matching a selector
    // pattern, the key's VALUE validates against the compiled subschema
    // — one check (and tag) per (pattern, compiled inner term). The
    // selector is a runtime KEY regex (never path-interpolated, like
    // propertyNames), dialect-scanned at compile; sibling
    // `additionalProperties: false` admits selector-matched keys (the
    // spec's matched-by-neither rule).
    val patProps: Seq[(String, Node)] =
      Option(n.get("patternProperties")).toSeq.flatMap { pp =>
        require(pp.isObject,
          s"patternProperties must be an object of pattern -> schema: $pp")
        pp.fields().asScala.map { e =>
          javaPatternForm(e.getKey)
          (e.getKey, compile(e.getValue))
        }.toSeq
      }
    Node(effTyp, enumVals, req, props, items,
      minimum = numKw("minimum"),
      maximum = numKw("maximum"),
      exclusiveMinimum = numKw("exclusiveMinimum"),
      exclusiveMaximum = numKw("exclusiveMaximum"),
      multipleOf = mof,
      minLength = intKw("minLength"),
      maxLength = intKw("maxLength"),
      minItems = intKw("minItems"),
      maxItems = intKw("maxItems"),
      pattern = pat,
      closed = closed,
      uniqueItems = unique,
      minProps = intKw("minProperties"),
      maxProps = intKw("maxProperties"),
      deps = deps,
      contains = containsSub,
      minContains = minCont,
      maxContains = maxCont,
      propNames = propNamesPat,
      ifSub = ifSub,
      thenSub = thenSub,
      elseSub = elseSub,
      oneOfSubs = oneOfSubs,
      patProps = patProps,
      oneOfDyn = oneOfDyn,
      anyOfSubs = anyOfSubs,
      notSub = notSub,
      depSchemas = depSchemas,
      addProps = addProps)
  }

  /** Scan a `pattern` for constructs outside the shared Java~RE2 regex
    * dialect (abort loudly) and return the JAVA-side form with every
    * unescaped `$` OUTSIDE character classes rewritten to `\z` — Java's
    * default `$` also matches before a FINAL line terminator while RE2
    * (DuckDB `regexp_matches`) anchors `$` to end-of-text, so a subject
    * ending in "\n" would get different verdicts; after the rewrite both
    * engines give `$` the RE2 end-of-TEXT semantics (`[$]` stays a
    * literal dollar on both). Rejected: backreferences and lookaround
    * (r13), and r14: `\Z` (Java-only — RE2 has no `\Z`; `\z` works on
    * both) and possessive quantifiers (`a*+`, Java-only — a LITERAL
    * `+ * ? }` followed by `+` must be escaped to pass the scan; the
    * reluctant forms `a+?` etc. are fine on both). The returned form is
    * pre-compiled so a syntax error aborts at plan time; the DuckDB
    * replay keeps the ORIGINAL pattern (RE2 `$` already means
    * end-of-text).
    */
  private[schema] def javaPatternForm(p: String): String = {
    val sb = new StringBuilder
    var i = 0; var inClass = false; var prevQuant = false
    while (i < p.length) {
      val ch = p.charAt(i)
      if (ch == '\\' && i + 1 < p.length) {
        val nxt = p.charAt(i + 1)
        require(!nxt.isDigit,
          s"pattern '$p': backreferences are outside the shared Java~RE2 " +
            "regex subset")
        require(nxt != 'Z',
          s"pattern '$p': \\Z is Java-only (RE2 has no \\Z) — use \\z " +
            "(end of text on both engines)")
        sb.append(ch).append(nxt); i += 2; prevQuant = false
      } else {
        if (inClass) {
          if (ch == ']') inClass = false
          sb.append(ch)
        } else ch match {
          case '[' => inClass = true; sb.append(ch); prevQuant = false
          case '(' =>
            require(!(p.startsWith("(?=", i) || p.startsWith("(?!", i) ||
              p.startsWith("(?<", i)),
              s"pattern '$p': lookaround is outside the shared Java~RE2 " +
                "regex subset")
            sb.append(ch); prevQuant = false
          case '$' => sb.append("\\z"); prevQuant = false
          case '+' if prevQuant =>
            throw new IllegalArgumentException(
              s"pattern '$p': possessive quantifiers are Java-only " +
                "(outside the shared Java~RE2 regex subset; escape a " +
                "literal '+' that follows a quantifier character)")
          case c @ ('*' | '+' | '?' | '}') => sb.append(c); prevQuant = true
          case c => sb.append(c); prevQuant = false
        }
        i += 1
      }
    }
    val out = sb.toString
    java.util.regex.Pattern.compile(out)
    out
  }

  private def parseSchema(schemaJson: String): Node = {
    val root = mapper.readTree(schemaJson)
    compile(inlineRefs(root, root, Nil))
  }

  /** Inline local `$ref` pointers (r14 — `#/$defs/name`,
    * `#/definitions/name`, or any local JSON-Pointer) BEFORE compiling:
    * each ref node is replaced by its referenced subtree, recursively,
    * so the rest of the gate (and the generated DuckDB replay) never
    * sees a ref at all. Subset rules, each a loud abort: the pointer
    * must be LOCAL (`#/…`), must resolve, a `$ref` node may carry no
    * sibling keywords (2020-12 sibling-merge semantics are out of
    * subset), and ref CHAINS may not cycle — a recursive schema has no
    * static check list to compile to. `$defs`/`definitions` containers
    * carry no validation of their own and are dropped after inlining.
    * The walk descends ONLY into schema positions (`properties` values,
    * `items`) — data-valued keywords (`enum`, `const`, `default`,
    * `examples`) pass through verbatim, so a data object that happens to
    * contain a "$ref" key is never misread as a schema reference.
    */
  private def inlineRefs(root: JsonNode, n: JsonNode,
                         stack: List[String]): JsonNode = {
    if (!n.isObject) return n // boolean schemas abort in compile()
    Option(n.get("$ref")) match {
      case Some(r) =>
        require(r.isTextual, s"$$ref must be a JSON string, got: $r")
        val ref = r.asText()
        require(n.size == 1,
          s"$$ref with sibling keywords is out of the supported subset: $n")
        require(!stack.contains(ref),
          s"cyclic $$ref chain ${(ref :: stack).reverse.mkString(" -> ")}: " +
            "a recursive schema cannot compile to a static check list")
        inlineRefs(root, resolvePointer(root, ref), ref :: stack)
      case None =>
        val out = mapper.createObjectNode()
        var allOf: Seq[JsonNode] = Nil
        n.fields().asScala.foreach { e =>
          e.getKey match {
            case "$defs" | "definitions" => () // containers: dropped
            case "allOf" =>
              // conjunction by COMPILE-TIME MERGE (r14) — see
              // [[mergeSchemas]]; members are fully ref-inlined first
              require(e.getValue.isArray && e.getValue.size > 0,
                s"allOf must be a non-empty array of schemas: ${e.getValue}")
              allOf = e.getValue.elements().asScala.toSeq
                .map(inlineRefs(root, _, stack))
            case "properties" =>
              val props = mapper.createObjectNode()
              e.getValue.fields().asScala.foreach(p =>
                props.set[JsonNode](p.getKey,
                  inlineRefs(root, p.getValue, stack)))
              out.set[JsonNode]("properties", props)
            case "items" =>
              out.set[JsonNode]("items", inlineRefs(root, e.getValue, stack))
            case "contains" =>
              out.set[JsonNode]("contains", inlineRefs(root, e.getValue, stack))
            // r16 schema positions: if/then/else hold one schema each,
            // oneOf an array of schemas, patternProperties an object of
            // selector -> schema (selectors are regexes, never refs)
            case k @ ("if" | "then" | "else") =>
              out.set[JsonNode](k, inlineRefs(root, e.getValue, stack))
            case k @ ("oneOf" | "anyOf") =>
              require(e.getValue.isArray,
                s"$k must be an array of schemas: ${e.getValue}")
              val arr = mapper.createArrayNode()
              e.getValue.elements().asScala
                .foreach(m => arr.add(inlineRefs(root, m, stack)))
              out.set[JsonNode](k, arr)
            case "not" =>
              out.set[JsonNode]("not", inlineRefs(root, e.getValue, stack))
            // additionalProperties: the SCHEMA form is a schema position
            // (r16); booleans pass through the default case
            case "additionalProperties" if e.getValue.isObject =>
              out.set[JsonNode]("additionalProperties",
                inlineRefs(root, e.getValue, stack))
            case "dependentSchemas" =>
              require(e.getValue.isObject,
                s"dependentSchemas must be an object: ${e.getValue}")
              val ds = mapper.createObjectNode()
              e.getValue.fields().asScala.foreach(p =>
                ds.set[JsonNode](p.getKey,
                  inlineRefs(root, p.getValue, stack)))
              out.set[JsonNode]("dependentSchemas", ds)
            case "patternProperties" =>
              require(e.getValue.isObject,
                s"patternProperties must be an object: ${e.getValue}")
              val pp = mapper.createObjectNode()
              e.getValue.fields().asScala.foreach(p =>
                pp.set[JsonNode](p.getKey,
                  inlineRefs(root, p.getValue, stack)))
              out.set[JsonNode]("patternProperties", pp)
            case k => out.set[JsonNode](k, e.getValue)
          }
        }
        allOf.foldLeft(out)(mergeSchemas)
    }
  }

  /** `allOf` conjunction by compile-time merge (r14) — the
    * schema-inheritance idiom `allOf: [{$ref: #/$defs/base},
    * {properties: …}]` that (with [[inlineRefs]]) covers the dominant
    * real-world composition. Merge laws, each a loud abort when they
    * cannot hold: `properties` merge per NAME (a shared name recurses —
    * both sides' constraints on that property apply), `required` arrays
    * UNION, `items` schemas recurse, IDENTICAL values coexist (base and
    * child both declaring `"type": "object"`), and any OTHER keyword
    * collision aborts — the conjunction of two different minimums etc.
    * is out of subset (it has one answer, but silently picking it is a
    * semantics fork the single-sourced oracle must not risk). `oneOf`/
    * `anyOf`/`not`/`dependentSchemas` are in subset since r16 (the
    * satisfaction evaluator compiles them); two allOf members carrying
    * non-identical values for one of them still collide-abort here.
    */
  private def mergeSchemas(a: JsonNode, b: JsonNode): com.fasterxml.jackson.databind.node.ObjectNode = {
    require(a.isObject && b.isObject,
      s"allOf members must be object schemas: $a / $b")
    val out = a.deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]()
    b.fields().asScala.foreach { e =>
      val k = e.getKey
      if (!out.has(k)) out.set[JsonNode](k, e.getValue)
      else if (out.get(k) == e.getValue) () // identical: conjunction is a no-op
      else k match {
        case "properties" =>
          val ap = out.get("properties")
            .deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]()
          e.getValue.fields().asScala.foreach { p =>
            if (!ap.has(p.getKey)) ap.set[JsonNode](p.getKey, p.getValue)
            else ap.set[JsonNode](p.getKey,
              mergeSchemas(ap.get(p.getKey), p.getValue))
          }
          out.set[JsonNode]("properties", ap)
        case "required" =>
          val merged = mapper.createArrayNode()
          val seen = scala.collection.mutable.LinkedHashSet[String]()
          (out.get("required").elements().asScala ++
            e.getValue.elements().asScala).foreach(r => seen += r.asText())
          seen.foreach(merged.add)
          out.set[JsonNode]("required", merged)
        case "items" =>
          out.set[JsonNode]("items", mergeSchemas(out.get("items"), e.getValue))
        case other => throw new IllegalArgumentException(
          s"allOf members collide on '$other' (${out.get(other)} vs " +
            s"${e.getValue}): merging non-identical constraint values is " +
            "out of the supported subset")
      }
    }
    out
  }

  /** resolve a local JSON Pointer (`#/a/b`) against the schema root —
    * with the standard `~1` → `/`, `~0` → `~` unescapes.
    */
  private def resolvePointer(root: JsonNode, ref: String): JsonNode = {
    require(ref.startsWith("#/"),
      s"only LOCAL $$ref pointers (#/...) are in the supported subset: $ref")
    ref.drop(2).split("/", -1).map(_.replace("~1", "/").replace("~0", "~"))
      .foldLeft(root) { (node, part) =>
        val c = if (node.isArray && part.matches("[0-9]+")) node.get(part.toInt)
                else node.get(part)
        require(c != null, s"$$ref does not resolve: $ref (at segment '$part')")
        c
      }
  }

  // ------------------------------------------------------------------
  // the check list — ONE walk feeds both generators
  // ------------------------------------------------------------------

  /** guards = ancestor object paths that must be present+object-typed
    * before this check may fire.
    */
  private sealed trait Check { def path: String; def guards: Seq[String] }
  private case class Missing(path: String, guards: Seq[String]) extends Check
  private case class TypeIs(path: String, expected: String,
                            guards: Seq[String]) extends Check
  private case class EnumIn(path: String, values: Seq[EnumVal],
                            guards: Seq[String]) extends Check
  /** numeric bounds — checked only when the node IS numeric (a type
    * violation already reports the rest); both engines compare the same
    * correctly-rounded double. op ∈ min/max (inclusive), xmin/xmax
    * (exclusive, r13), multipleof (r13 — IEEE fmod ≠ 0, the same
    * truncated remainder Spark's `%` and DuckDB's `%` compute on the
    * same correctly-rounded doubles).
    */
  private case class Bound(path: String, op: String, bound: Double,
                           guards: Seq[String]) extends Check
  /** string length bounds in CODE POINTS (Spark `length` ≡ DuckDB
    * `length`); checked only when the node IS a string. op ∈ minlen/maxlen.
    */
  private case class LenBound(path: String, op: String, bound: Int,
                              guards: Seq[String]) extends Check
  /** array ELEMENT-COUNT bounds (r13 `minItems`/`maxItems`): checked only
    * when the node IS array-typed — Spark `size` over the extracted
    * `array<variant>` ≡ DuckDB `json_array_length`, an exact integer on
    * both engines. op ∈ minitems/maxitems.
    */
  private case class ArrBound(path: String, op: String, bound: Int,
                              guards: Seq[String]) extends Check
  /** regex `pattern` on a string-typed node (r13): Spark RLIKE ≡ DuckDB
    * `regexp_matches` — both PARTIAL-match; compile rejected the
    * dialect-divergent constructs. `regex` is the ORIGINAL pattern; the
    * Spark side applies [[javaPatternForm]]'s `$`→`\z` normalization,
    * the DuckDB side uses it as-is (RE2 semantics are the shared ones).
    */
  private case class PatternCheck(path: String, regex: String,
                                  guards: Seq[String]) extends Check
  /** `additionalProperties: false` (r14): fires when the node at `path`
    * IS an object and carries a key outside the declared `keys` set.
    * The tag names the object path (`extra:$path`), not the offending
    * key — every fragment in the violations string is a STATIC
    * compile-time literal on both engines (the concat_ws single-sourcing
    * contract), and one tag per closed object matches how every other
    * check reports (enum: doesn't name the bad value either).
    */
  private case class ExtraKeys(path: String, keys: Seq[String],
                               guards: Seq[String],
                               pats: Seq[String] = Nil) extends Check
  /** `uniqueItems: true` (r14): fires when the array at `path` holds two
    * equal SCALAR elements — same-type exact equality for strings and
    * booleans, numerics compared as the shared correctly-rounded double
    * (so 1 duplicates 1.0), JSON nulls all equal; runtime container
    * elements are the type check's business (compile required a scalar
    * items type).
    */
  private case class UniqueCheck(path: String, guards: Seq[String])
      extends Check
  /** `minProperties`/`maxProperties` (r14): object KEY-COUNT bounds —
    * fired only on object-typed nodes (Spark: the native walk's
    * objectSize ≡ DuckDB `len(json_keys(…))`). op ∈ minprops/maxprops.
    */
  private case class ObjBound(path: String, op: String, bound: Int,
                              guards: Seq[String]) extends Check
  /** `dependentRequired` (r14): the object at `path` carrying `ifKey`
    * (a JSON-null value IS present) but lacking `thenKey` violates —
    * tag `dep:$path.thenKey`. `ifPath` is collected into the shared
    * per-path type columns alongside the check's own path.
    */
  private case class DepRequired(path: String, ifKey: String,
                                 thenKey: String,
                                 guards: Seq[String]) extends Check {
    def ifPath: String = s"$path.$ifKey"
    def thenPath: String = s"$path.$thenKey"
  }
  /** `contains`/`minContains`/`maxContains` (r15): fires when the array
    * at `path` holds fewer than `minC` (or, when `maxC` >= 0, more than
    * `maxC`) elements SATISFYING the subschema — satisfaction = the
    * element violates NONE of the subschema's walk `terms` (the
    * ANY/COUNT-quantified form of the per-element walk; a term's
    * typed-guard skip is JSON Schema's vacuous pass). Tag `contains:$p`.
    */
  private case class ContainsCheck(path: String, terms: Seq[TermRec],
                                   minC: Int, maxC: Int,
                                   guards: Seq[String]) extends Check
  /** `propertyNames` with a `pattern` (r15): fires when the object at
    * `path` carries a KEY failing the regex (partial match) — the one
    * check on the keys themselves. Tag `propname:$p`.
    */
  private case class PropNamesCheck(path: String, regex: String,
                                    guards: Seq[String]) extends Check
  /** `if`/`then`/`else` + discriminated `oneOf` (r16): fires when the
    * node at `path` is PRESENT, satisfies (`branch` = "then"/"oneof") or
    * fails (`branch` = "else") the `ifTerms` conjunction, AND violates
    * any of the `branchTerms` — satisfaction is the r15 contains
    * evaluator (violates none of the compiled terms; typed-guard skips
    * are JSON Schema's vacuous pass). Tag `<branch>:$p` — one static tag
    * per branch, the ExtraKeys convention.
    */
  private case class CondCheck(path: String, branch: String,
                               ifTerms: Seq[TermRec],
                               branchTerms: Seq[TermRec],
                               guards: Seq[String]) extends Check
  /** dynamic `oneOf` (r16, overlapping or type-free members): fires when
    * the node at `path` is PRESENT and the count of `groups` it
    * satisfies (each a `"group"` TermRec wrapping one member's term
    * conjunction) is not exactly 1. Tag `oneof:$p`.
    */
  private case class OneOfDynCheck(path: String, groups: Seq[TermRec],
                                   guards: Seq[String]) extends Check
  /** `anyOf` (r16): fires when the node at `path` is PRESENT and
    * satisfies NO member group. Tag `anyof:$p`.
    */
  private case class AnyOfCheck(path: String, groups: Seq[TermRec],
                                guards: Seq[String]) extends Check
  /** `not` (r16): fires when the node at `path` is PRESENT and
    * SATISFIES the subschema's `terms` (violates none — the typed-guard
    * vacuous pass carries through, JSON Schema's own rule). Tag
    * `not:$p`.
    */
  private case class NotCheck(path: String, terms: Seq[TermRec],
                              guards: Seq[String]) extends Check
  /** `dependentSchemas` (r16): fires when the OBJECT at `path` carries
    * `key` (a JSON-null value IS present) but violates any of the
    * paired subschema's `terms`. Tag `depschema:$p.key`.
    */
  private case class DepSchemaCheck(path: String, key: String,
                                    terms: Seq[TermRec],
                                    guards: Seq[String]) extends Check
  /** `patternProperties` (r16): fires when the object at `path` carries
    * a key matching `regex` whose VALUE trips the single compiled inner
    * `term` of the selector's subschema — one check per (selector,
    * inner term), tag `pprop:$p<suffix>` where `suffix` renders the
    * inner term's steps and kind (`pprop:$.meta.type`); the selector
    * regex itself never appears in a tag (it is not identifier-guarded).
    */
  private case class PatternPropsCheck(path: String, regex: String,
                                       suffix: String, term: TermRec,
                                       guards: Seq[String]) extends Check
  /** `additionalProperties` SCHEMA form (r16): pprop's complement —
    * fires when the object at `path` carries a key matched by NEITHER
    * the declared `keys` nor a `pats` selector whose value trips the
    * inner `term`. Tag `aprop:$p<suffix>`.
    */
  private case class AddPropsCheck(path: String, keys: Seq[String],
                                   pats: Seq[String], suffix: String,
                                   term: TermRec,
                                   guards: Seq[String]) extends Check
  /** one element-relative walk term — `steps` from a node plus a
    * terminal check; the record behind both the per-element
    * [[ItemsCheck]]s and the r15 `contains` subschema (where the
    * conjunction of ALL terms defines element satisfaction).
    * [[termsOf]] is the single walk that emits them.
    */
  private case class TermRec(steps: Seq[String], kind: String,
                             expected: String = "",
                             enumVals: Seq[EnumVal] = Nil,
                             bound: Double = 0, field: String = "",
                             pattern: String = "",
                             keys: Seq[String] = Nil,
                             sub: Seq[TermRec] = Nil,
                             minC: Int = 1, maxC: Int = -1,
                             sub2: Seq[TermRec] = Nil,
                             pats: Seq[String] = Nil)
  /** per-ELEMENT checks over an `items`-typed array at `path` (r12 flat,
    * r13 recursive): fire only when the node IS array-typed (a non-array
    * already reports `type:$path`). `steps` walks from each element —
    * `"[]"` iterates a nested array, any other string descends an object
    * field ([[org.apache.spark.sql.graftglue.VariantItemsViolates]]'s
    * walk) — and the terminal `kind` ∈ type/enum/min/max/minlen/maxlen/
    * pattern/minitems/maxitems/missing/contains/propname fires on every
    * reached node of its checkable runtime type. Tag:
    * `<kind-tag>:$path[]<steps>` with `missing`'s `field` suffixed
    * (`missing:$path[].meta.w`). `sub`/`minC`/`maxC` carry the r15
    * contains terminal's subschema terms and count bounds.
    */
  private case class ItemsCheck(path: String, steps: Seq[String],
                                kind: String,
                                expected: String, enumVals: Seq[EnumVal],
                                bound: Double,
                                guards: Seq[String],
                                field: String = "",
                                pattern: String = "",
                                keys: Seq[String] = Nil,
                                sub: Seq[TermRec] = Nil,
                                minC: Int = 1, maxC: Int = -1,
                                sub2: Seq[TermRec] = Nil,
                                pats: Seq[String] = Nil) extends Check

  /** the FULL element-relative walk of one schema node, as terms: every
    * constraint reachable from a node — through nested object
    * `properties` and nested `items` alike (r13 FULL RECURSION) — in the
    * gate's canonical emission order. The single source behind the
    * per-element [[ItemsCheck]]s AND the r15 `contains` subschema's
    * satisfaction conjunction (one walk, so the two cannot drift).
    */
  private def termsOf(n: Node, steps: Seq[String] = Nil): Seq[TermRec] = {
    val out = Seq.newBuilder[TermRec]
    n.typ.foreach(t => out += TermRec(steps, "type", expected = t))
    if (n.enumVals.nonEmpty)
      out += TermRec(steps, "enum", enumVals = n.enumVals)
    n.minimum.foreach(b => out += TermRec(steps, "min", bound = b))
    n.maximum.foreach(b => out += TermRec(steps, "max", bound = b))
    n.exclusiveMinimum.foreach(b => out += TermRec(steps, "xmin", bound = b))
    n.exclusiveMaximum.foreach(b => out += TermRec(steps, "xmax", bound = b))
    n.multipleOf.foreach(b => out += TermRec(steps, "multipleof", bound = b))
    n.minLength.foreach(b =>
      out += TermRec(steps, "minlen", bound = b.toDouble))
    n.maxLength.foreach(b =>
      out += TermRec(steps, "maxlen", bound = b.toDouble))
    n.pattern.foreach(p => out += TermRec(steps, "pattern", pattern = p))
    n.minItems.foreach(b =>
      out += TermRec(steps, "minitems", bound = b.toDouble))
    n.maxItems.foreach(b =>
      out += TermRec(steps, "maxitems", bound = b.toDouble))
    if (n.uniqueItems) out += TermRec(steps, "unique")
    n.minProps.foreach(b =>
      out += TermRec(steps, "minprops", bound = b.toDouble))
    n.maxProps.foreach(b =>
      out += TermRec(steps, "maxprops", bound = b.toDouble))
    if (n.closed) out += TermRec(steps, "extra", keys = n.props.map(_._1),
      pats = n.patProps.map(_._1))
    n.deps.foreach { case (ifK, thenK) =>
      out += TermRec(steps, "dep", expected = ifK, field = thenK)
    }
    n.contains.foreach(sub =>
      out += TermRec(steps, "contains", sub = termsOf(sub),
        minC = n.minContains.getOrElse(1),
        maxC = n.maxContains.getOrElse(-1)))
    n.propNames.foreach(p => out += TermRec(steps, "propname", pattern = p))
    // conditional (r16): the then/else branch terms fire under
    // satisfaction (negation) of the if-subschema's term conjunction;
    // `expected` names the branch for the tag
    n.ifSub.foreach { ifn =>
      val ifTerms = termsOf(ifn)
      n.thenSub.foreach(b => out += TermRec(steps, "cond",
        expected = "then", sub = ifTerms, sub2 = termsOf(b)))
      n.elseSub.foreach(b => out += TermRec(steps, "cond",
        expected = "else", sub = ifTerms, sub2 = termsOf(b)))
    }
    // discriminated oneOf (r16): one conditional term per member — under
    // "is this member's type", the member's own checks; the synthesized
    // union type term above already rejects types outside every member
    n.oneOfSubs.foreach(m => out += TermRec(steps, "cond",
      expected = "oneof",
      sub = Seq(TermRec(Nil, "type", expected = m.typ.get)),
      sub2 = termsOf(m)))
    // dynamic oneOf (r16): exactly-one member satisfaction counted at
    // runtime — one "group" wrapper per member
    if (n.oneOfDyn.nonEmpty)
      out += TermRec(steps, "oneofdyn",
        sub = n.oneOfDyn.map(m => TermRec(Nil, "group", sub = termsOf(m))))
    // anyOf (r16): at least one member satisfied
    if (n.anyOfSubs.nonEmpty)
      out += TermRec(steps, "anyof",
        sub = n.anyOfSubs.map(m => TermRec(Nil, "group", sub = termsOf(m))))
    // not (r16): satisfaction of the subschema is the violation
    n.notSub.foreach(s => out += TermRec(steps, "notk", sub = termsOf(s)))
    // dependentSchemas (r16): key presence requires satisfaction of the
    // paired subschema — `expected` carries the key for the tag
    n.depSchemas.foreach { case (k, s) =>
      out += TermRec(steps, "depschema", expected = k, sub = termsOf(s))
    }
    // patternProperties (r16): one term per (selector, compiled inner
    // term) — `field` carries the rendered tag suffix (inner steps +
    // kind), `sub` the single inner term each selected key's value must
    // not violate
    n.patProps.foreach { case (re, sub) =>
      termsOf(sub).foreach(t => out += TermRec(steps, "pprop",
        pattern = re, field = s"${stepSuffix(t.steps)}.${t.kind}",
        sub = Seq(t)))
    }
    // additionalProperties SCHEMA form (r16): pprop's complement — keys
    // matched by NEITHER `properties` (`keys`) NOR a patternProperties
    // selector (`pats`) validate against the subschema
    n.addProps.foreach { sub =>
      termsOf(sub).foreach(t => out += TermRec(steps, "aprop",
        field = s"${stepSuffix(t.steps)}.${t.kind}",
        keys = n.props.map(_._1), pats = n.patProps.map(_._1),
        sub = Seq(t)))
    }
    // required names WITHOUT a properties entry still fire (r13), in
    // sorted order for a deterministic fragment list
    (n.required -- n.props.map(_._1)).toSeq.sorted.foreach(f =>
      out += TermRec(steps, "missing", field = f))
    n.props.foreach { case (f, sub) =>
      if (n.required(f)) out += TermRec(steps, "missing", field = f)
      out ++= termsOf(sub, steps :+ f)
    }
    n.items.foreach(sub => out ++= termsOf(sub, steps :+ "[]"))
    out.result()
  }

  private def checksOf(root: Node): Seq[Check] = {
    val out = Seq.newBuilder[Check]
    root.typ.foreach(t => out += TypeIs("$", t, Nil))
    // per-element checks over the array extracted at `cp`: one
    // ItemsCheck per walk term (r13 FULL RECURSION — the walk itself is
    // [[termsOf]], shared with the contains subschema)
    def elemWalk(cp: String, n: Node, guards: Seq[String]): Unit =
      termsOf(n).foreach { tr =>
        out += ItemsCheck(cp, tr.steps, tr.kind, tr.expected, tr.enumVals,
          tr.bound, guards, tr.field, tr.pattern, tr.keys, tr.sub,
          tr.minC, tr.maxC, tr.sub2, tr.pats)
      }
    // path-level conditional / oneOf / patternProperties checks of one
    // node (r16) — shared between the property walk and the root
    def condChecks(n: Node, p: String, guards: Seq[String]): Unit = {
      n.ifSub.foreach { ifn =>
        val ifTerms = termsOf(ifn)
        n.thenSub.foreach(b =>
          out += CondCheck(p, "then", ifTerms, termsOf(b), guards))
        n.elseSub.foreach(b =>
          out += CondCheck(p, "else", ifTerms, termsOf(b), guards))
      }
      n.oneOfSubs.foreach(m => out += CondCheck(p, "oneof",
        Seq(TermRec(Nil, "type", expected = m.typ.get)), termsOf(m), guards))
      if (n.oneOfDyn.nonEmpty) out += OneOfDynCheck(p,
        n.oneOfDyn.map(m => TermRec(Nil, "group", sub = termsOf(m))), guards)
      if (n.anyOfSubs.nonEmpty) out += AnyOfCheck(p,
        n.anyOfSubs.map(m => TermRec(Nil, "group", sub = termsOf(m))), guards)
      n.notSub.foreach(s => out += NotCheck(p, termsOf(s), guards))
      n.depSchemas.foreach { case (k, s) =>
        out += DepSchemaCheck(p, k, termsOf(s), guards)
      }
      n.patProps.foreach { case (re, sub) =>
        termsOf(sub).foreach(t => out += PatternPropsCheck(p, re,
          s"${stepSuffix(t.steps)}.${t.kind}", t, guards))
      }
      n.addProps.foreach { sub =>
        termsOf(sub).foreach(t => out += AddPropsCheck(p,
          n.props.map(_._1), n.patProps.map(_._1),
          s"${stepSuffix(t.steps)}.${t.kind}", t, guards))
      }
    }
    def walk(node: Node, path: String, guards: Seq[String]): Unit = {
      (node.required -- node.props.map(_._1)).toSeq.sorted.foreach(f =>
        out += Missing(s"$path.$f", guards))
      node.props.foreach { case (name, child) =>
        val cp = s"$path.$name"
        if (node.required(name)) out += Missing(cp, guards)
        child.typ.foreach(t => out += TypeIs(cp, t, guards))
        if (child.enumVals.nonEmpty) out += EnumIn(cp, child.enumVals, guards)
        child.minimum.foreach(b => out += Bound(cp, "min", b, guards))
        child.maximum.foreach(b => out += Bound(cp, "max", b, guards))
        child.exclusiveMinimum.foreach(b => out += Bound(cp, "xmin", b, guards))
        child.exclusiveMaximum.foreach(b => out += Bound(cp, "xmax", b, guards))
        child.multipleOf.foreach(b => out += Bound(cp, "multipleof", b, guards))
        child.minLength.foreach(b => out += LenBound(cp, "minlen", b, guards))
        child.maxLength.foreach(b => out += LenBound(cp, "maxlen", b, guards))
        child.pattern.foreach(p => out += PatternCheck(cp, p, guards))
        child.minItems.foreach(b => out += ArrBound(cp, "minitems", b, guards))
        child.maxItems.foreach(b => out += ArrBound(cp, "maxitems", b, guards))
        if (child.uniqueItems) out += UniqueCheck(cp, guards)
        child.minProps.foreach(b => out += ObjBound(cp, "minprops", b, guards))
        child.maxProps.foreach(b => out += ObjBound(cp, "maxprops", b, guards))
        if (child.closed)
          out += ExtraKeys(cp, child.props.map(_._1), guards,
            child.patProps.map(_._1))
        child.deps.foreach { case (ifK, thenK) =>
          out += DepRequired(cp, ifK, thenK, guards)
        }
        child.contains.foreach(sub =>
          out += ContainsCheck(cp, termsOf(sub),
            child.minContains.getOrElse(1),
            child.maxContains.getOrElse(-1), guards))
        child.propNames.foreach(p => out += PropNamesCheck(cp, p, guards))
        condChecks(child, cp, guards)
        child.items.foreach(it => elemWalk(cp, it, guards))
        if (child.props.nonEmpty || child.required.nonEmpty)
          walk(child, cp, guards :+ cp)
      }
    }
    // root-level value checks (r13): a non-object root (a bare string /
    // number message) gets the same vocabulary as any path — previously
    // only the type check fired at "$"
    if (root.enumVals.nonEmpty) out += EnumIn("$", root.enumVals, Nil)
    root.minimum.foreach(b => out += Bound("$", "min", b, Nil))
    root.maximum.foreach(b => out += Bound("$", "max", b, Nil))
    root.exclusiveMinimum.foreach(b => out += Bound("$", "xmin", b, Nil))
    root.exclusiveMaximum.foreach(b => out += Bound("$", "xmax", b, Nil))
    root.multipleOf.foreach(b => out += Bound("$", "multipleof", b, Nil))
    root.minLength.foreach(b => out += LenBound("$", "minlen", b, Nil))
    root.maxLength.foreach(b => out += LenBound("$", "maxlen", b, Nil))
    root.pattern.foreach(p => out += PatternCheck("$", p, Nil))
    root.minItems.foreach(b => out += ArrBound("$", "minitems", b, Nil))
    root.maxItems.foreach(b => out += ArrBound("$", "maxitems", b, Nil))
    if (root.uniqueItems) out += UniqueCheck("$", Nil)
    root.minProps.foreach(b => out += ObjBound("$", "minprops", b, Nil))
    root.maxProps.foreach(b => out += ObjBound("$", "maxprops", b, Nil))
    if (root.closed) out += ExtraKeys("$", root.props.map(_._1), Nil,
      root.patProps.map(_._1))
    root.deps.foreach { case (ifK, thenK) =>
      out += DepRequired("$", ifK, thenK, Nil)
    }
    root.contains.foreach(sub =>
      out += ContainsCheck("$", termsOf(sub),
        root.minContains.getOrElse(1), root.maxContains.getOrElse(-1), Nil))
    root.propNames.foreach(p => out += PropNamesCheck("$", p, Nil))
    condChecks(root, "$", Nil)
    root.items.foreach(it => elemWalk("$", it, Nil))
    walk(root, "$",
      if (root.typ.exists(_.split('|').contains("object"))) Seq("$") else Nil)
    out.result()
  }

  /** canonical-type match for a declared JSON-Schema type spec — one
    * member name or a pipe-joined union ("string|null", r14): the value
    * passes when ANY member admits its canonical type.
    */
  private def matches(actual: Column, declared: String): Column =
    declared.split('|').toSeq.map {
      case "number"  => actual.isin("int", "double")
      case "integer" => actual === "int"
      case "boolean" => actual === "bool"
      case t         => actual === t // string / object / array / null
    }.reduce(_ || _)

  // ------------------------------------------------------------------
  // Spark side
  // ------------------------------------------------------------------

  // Per-path canonical types are computed by the native
  // [[org.apache.spark.sql.graftglue.VariantPathTypes]] walk (r15 —
  // one expression for ALL paths; the previous per-path Column spelling
  // — try_variant_get + is_variant_null + schema_of_variant + CASE —
  // hit janino's 64 KB method limit at real log-schema widths, see the
  // wiring comment in [[validate]]). The walk's encoding-tag fold is
  // the same canonical alphabet the schema_of_variant spelling produced
  // (the adjudicated equivalence the per-element native has relied on
  // since r12), so path- and element-level classification still cannot
  // drift.

  /** The Spark StructType the schema's `type`s describe — the typed
    * `from_json` target for the parsed output column.
    */
  def structType(schemaJson: String): StructType = {
    // a union type's parse target: the single non-null member (the
    // nullable idiom — parquet/struct fields are nullable anyway); an
    // ambiguous multi-member union (or pure null) folds to StringType —
    // the typed parse is a best-effort annotation, validation never
    // reads it
    def dt(n: Node): DataType =
      n.typ.map(_.split('|').filterNot(_ == "null").toSeq) match {
        case Some(Seq("object"))  => StructType(n.props.map { case (k, c) =>
          StructField(k, dt(c), nullable = true) })
        case Some(Seq("array"))   =>
          ArrayType(n.items.map(dt).getOrElse(StringType))
        case Some(Seq("string"))  => StringType
        case Some(Seq("integer")) => LongType
        case Some(Seq("number"))  => DoubleType
        case Some(Seq("boolean")) => BooleanType
        case _                    => StringType
      }
    dt(parseSchema(schemaJson)) match {
      case st: StructType => st
      case other => StructType(Seq(StructField("value", other)))
    }
  }

  /** Validate `jsonCol` against the schema: appends `violations` (the
    * comma-joined ordered violation tags, "" when clean), `is_valid`,
    * and (optionally) the typed `parsed` struct.
    */
  def validate(df: DataFrame, jsonCol: String, schemaJson: String,
               violationsCol: String = "violations",
               validCol: String = "is_valid",
               parsedCol: Option[String] = Some("parsed")): DataFrame = {
    val root = parseSchema(schemaJson)
    // internal working columns are derived UNIQUE against the input's
    // own columns (suffix a counter until fresh): there is no
    // reserved-prefix contract on the input, and withColumn would
    // silently replace — then drop — a real `__jsv`/`__jst0` column
    val used = scala.collection.mutable.Set[String](df.columns: _*)
    def fresh(base: String): String = {
      var c = base; var i = 0
      while (used(c)) { c = s"${base}_$i"; i += 1 }
      used += c; c
    }
    val vcol = fresh("__jsv")
    val malformed = col(vcol).isNull
    val checks = checksOf(root)
    // every distinct path's canonical type evaluates ONCE — r13/r14 as
    // one intermediate Column per path (each ~25 expression nodes:
    // try_variant_get + is_variant_null + schema_of_variant + the CASE
    // fold), r15 as ONE native walk over ALL paths
    // ([[org.apache.spark.sql.graftglue.VariantPathTypes]] →
    // array<string>, each check reading its slot with a 2-node
    // element_at). The per-path-Column shape hit a hard WIDTH cliff:
    // a 400-property schema blew janino's 64 KB generated-method limit,
    // dropped the projection out of codegen, and went superlinear in
    // interpreted dispatch (ScaleBench `gate_width`, plans/SCALE.md
    // r15). The native also skips schema_of_variant's per-call DDL
    // string build (the canonical fold reads the encoding tag, the
    // adjudicated-equivalent alphabet the element walk already uses).
    // Array paths under per-element checks still extract their
    // array<variant> once each.
    val typePaths: Seq[String] =
      (checks.map(_.path) ++ checks.flatMap(_.guards) ++
        checks.collect { case d: DepRequired => Seq(d.ifPath, d.thenPath) }
          .flatten).distinct
    val typeIdx: Map[String, Int] = typePaths.zipWithIndex.toMap
    val typesCol = fresh("__jstypes")
    // compiled path → field chain (Nil = root `$`); property names
    // passed the identifier guard, so '.' splits are unambiguous
    def segsOf(p: String): Seq[String] =
      if (p == "$") Nil else p.stripPrefix("$.").split('.').toSeq
    val arrCols: Map[String, String] =
      checks.collect { case ic: ItemsCheck => ic.path
                       case ab: ArrBound => ab.path }.distinct
        .zipWithIndex.map { case (p, i) => p -> fresh(s"__jsa$i") }.toMap
    def t(p: String): Column =
      element_at(col(typesCol), lit(typeIdx(p) + 1))
    // numeric-bound VALUE reads batch the same way (r15,
    // [[org.apache.spark.sql.graftglue.VariantPathDoubles]]): after the
    // type columns were batched, the per-check
    // `cast(try_variant_get as double)` was the largest remaining
    // width-many expression class — one walk fills array<double>, each
    // bound check reads its slot (NULL for non-numeric/absent slots,
    // which the type guard keeps unread)
    val valuePaths: Seq[String] =
      checks.collect { case b: Bound => b.path }.distinct
    val valueIdx: Map[String, Int] = valuePaths.zipWithIndex.toMap
    val valsCol = fresh("__jsvals")
    def numAt(p: String): Column =
      element_at(col(valsCol), lit(valueIdx(p) + 1))
    def guarded(c: Check)(cond: Column): Column = {
      val g = c.guards.foldLeft(!malformed) { (acc, gp) =>
        acc && t(gp) === "object"
      }
      when(g && cond, lit(tagOf(c)))
    }
    val frags: Seq[Column] = when(malformed, "malformed") +: checks
      .map {
        case c @ Missing(p, _) => guarded(c)(t(p).isNull)
        case c @ TypeIs(p, ty, _) =>
          guarded(c)(t(p).isNotNull && !matches(t(p), ty))
        case c @ EnumIn(p, vs, _) =>
          // typed membership (r13): each checkable runtime type tests
          // against its OWN member bucket; an empty bucket means any
          // value of that type violates (enum [1,2,3] rejects "four")
          val strs = vs.collect { case EStr(s) => s }
          val ints = vs.collect { case EInt(i) => i }
          val dbls = vs.collect { case EDbl(d) => d }
          val bools = vs.collect { case EBool(b) => b }
          def viaCast[T](ty: String, castTo: String, members: Seq[T]): Column = {
            val in =
              if (members.isEmpty) lit(false)
              else expr(s"cast(try_variant_get($vcol, '$p') as $castTo)")
                .isin(members: _*)
            t(p) === ty && !in
          }
          guarded(c)(viaCast("string", "string", strs) ||
            viaCast("int", "long", ints) ||
            viaCast("double", "double", dbls) ||
            viaCast("bool", "boolean", bools))
        case c @ Bound(p, op, b, _) =>
          val v = numAt(p)
          val bad = op match {
            case "min"        => v < lit(b)
            case "max"        => v > lit(b)
            case "xmin"       => v <= lit(b)
            case "xmax"       => v >= lit(b)
            case "multipleof" => (v % lit(b)) =!= lit(0.0)
          }
          guarded(c)(t(p).isin("int", "double") && bad)
        case c @ LenBound(p, op, b, _) =>
          val l = length(expr(s"cast(try_variant_get($vcol, '$p') as string)"))
          guarded(c)(t(p) === "string" &&
            (if (op == "minlen") l < lit(b) else l > lit(b)))
        case c @ ArrBound(p, op, b, _) =>
          val n = size(col(arrCols(p)))
          guarded(c)(t(p) === "array" &&
            (if (op == "minitems") n < lit(b) else n > lit(b)))
        case c @ PatternCheck(p, re, _) =>
          val v = expr(s"cast(try_variant_get($vcol, '$p') as string)")
          guarded(c)(t(p) === "string" && !v.rlike(javaPatternForm(re)))
        // additionalProperties: false (r14) — the same native walk, fed
        // the single node wrapped in a one-element array (steps = Nil),
        // so the key listing runs inside the fused codegen stage like
        // every other check
        case c @ ExtraKeys(p, ks, _, pats) =>
          import org.apache.spark.sql.graftglue.{ColumnBridge, VariantItemsViolates}
          val node = expr(s"try_variant_get($vcol, '$p')")
          val cond = ColumnBridge.column(VariantItemsViolates(
            ColumnBridge.expression(array(node)), Nil, "extra", "",
            Nil, Nil, Nil, Nil, 0, "", "", ks,
            pats = pats.map(javaPatternForm)))
          guarded(c)(t(p) === "object" && cond)
        // uniqueItems (r14): the node itself wrapped as a one-element
        // array, so the native terminal sees the ARRAY node (the same
        // device as ExtraKeys)
        case c @ UniqueCheck(p, _) =>
          import org.apache.spark.sql.graftglue.{ColumnBridge, VariantItemsViolates}
          val node = expr(s"try_variant_get($vcol, '$p')")
          val cond = ColumnBridge.column(VariantItemsViolates(
            ColumnBridge.expression(array(node)), Nil, "unique", "",
            Nil, Nil, Nil, Nil, 0, "", ""))
          guarded(c)(t(p) === "array" && cond)
        // dependentRequired (r14): presence is the per-path type column
        // being non-null (a JSON-null property IS present)
        case c @ DepRequired(p, _, _, _) =>
          guarded(c)(t(p) === "object" &&
            t(c.ifPath).isNotNull && t(c.thenPath).isNull)
        // contains/minContains/maxContains (r15): the node wrapped as a
        // one-element array (the ExtraKeys device) with the native's
        // COUNT-quantified terminal — elements satisfying the
        // subschema's term conjunction are counted inside the fused
        // walk, no HOF
        case c @ ContainsCheck(p, terms, minCont, maxCont, _) =>
          import org.apache.spark.sql.graftglue.{ColumnBridge, VariantItemsViolates}
          val node = expr(s"try_variant_get($vcol, '$p')")
          val cond = ColumnBridge.column(VariantItemsViolates(
            ColumnBridge.expression(array(node)), Nil, "contains", "",
            Nil, Nil, Nil, Nil, 0, "", "", Nil,
            terms.map(walkTermOf), minCont, maxCont))
          guarded(c)(t(p) === "array" && cond)
        // propertyNames pattern (r15): same one-element-array device;
        // the Spark side runs the Java-normalized pattern form
        case c @ PropNamesCheck(p, re, _) =>
          import org.apache.spark.sql.graftglue.{ColumnBridge, VariantItemsViolates}
          val node = expr(s"try_variant_get($vcol, '$p')")
          val cond = ColumnBridge.column(VariantItemsViolates(
            ColumnBridge.expression(array(node)), Nil, "propname", "",
            Nil, Nil, Nil, Nil, 0, "", javaPatternForm(re)))
          guarded(c)(t(p) === "object" && cond)
        // if/then/else + discriminated oneOf (r16): the one-element-array
        // device with the native's conditional terminal — satisfaction of
        // the if-terms (the r15 evaluator) gates the branch terms, all
        // inside the fused walk; an ABSENT node validates nothing (the
        // isNotNull guard — both engines agree)
        case c @ CondCheck(p, branch, ifTerms, brTerms, _) =>
          import org.apache.spark.sql.graftglue.{ColumnBridge, VariantItemsViolates}
          val node = expr(s"try_variant_get($vcol, '$p')")
          val cond = ColumnBridge.column(VariantItemsViolates(
            ColumnBridge.expression(array(node)), Nil, "cond", branch,
            Nil, Nil, Nil, Nil, 0, "", "", Nil,
            ifTerms.map(walkTermOf), 1, -1, brTerms.map(walkTermOf)))
          guarded(c)(t(p).isNotNull && cond)
        // anyOf / dynamic oneOf (r16): same device — the native counts
        // member-group satisfaction (the r15 evaluator) inside the fused
        // walk; PRESENT nodes only (absent locations validate nothing)
        case c @ OneOfDynCheck(p, groups, _) =>
          import org.apache.spark.sql.graftglue.{ColumnBridge, VariantItemsViolates}
          val node = expr(s"try_variant_get($vcol, '$p')")
          val cond = ColumnBridge.column(VariantItemsViolates(
            ColumnBridge.expression(array(node)), Nil, "oneofdyn", "",
            Nil, Nil, Nil, Nil, 0, "", "", Nil, groups.map(walkTermOf)))
          guarded(c)(t(p).isNotNull && cond)
        case c @ AnyOfCheck(p, groups, _) =>
          import org.apache.spark.sql.graftglue.{ColumnBridge, VariantItemsViolates}
          val node = expr(s"try_variant_get($vcol, '$p')")
          val cond = ColumnBridge.column(VariantItemsViolates(
            ColumnBridge.expression(array(node)), Nil, "anyof", "",
            Nil, Nil, Nil, Nil, 0, "", "", Nil, groups.map(walkTermOf)))
          guarded(c)(t(p).isNotNull && cond)
        // not (r16): satisfaction IS the violation
        case c @ NotCheck(p, terms, _) =>
          import org.apache.spark.sql.graftglue.{ColumnBridge, VariantItemsViolates}
          val node = expr(s"try_variant_get($vcol, '$p')")
          val cond = ColumnBridge.column(VariantItemsViolates(
            ColumnBridge.expression(array(node)), Nil, "notk", "",
            Nil, Nil, Nil, Nil, 0, "", "", Nil, terms.map(walkTermOf)))
          guarded(c)(t(p).isNotNull && cond)
        // dependentSchemas (r16): key presence on the OBJECT at `p`
        // requires satisfaction of the paired subschema
        case c @ DepSchemaCheck(p, key, terms, _) =>
          import org.apache.spark.sql.graftglue.{ColumnBridge, VariantItemsViolates}
          val node = expr(s"try_variant_get($vcol, '$p')")
          val cond = ColumnBridge.column(VariantItemsViolates(
            ColumnBridge.expression(array(node)), Nil, "depschema", key,
            Nil, Nil, Nil, Nil, 0, "", "", Nil, terms.map(walkTermOf)))
          guarded(c)(t(p) === "object" && cond)
        // patternProperties (r16): same device — the native regex-selects
        // the object's own keys and runs the single inner term on each
        // selected key's value
        case c @ PatternPropsCheck(p, re, _, term, _) =>
          import org.apache.spark.sql.graftglue.{ColumnBridge, VariantItemsViolates}
          val node = expr(s"try_variant_get($vcol, '$p')")
          val cond = ColumnBridge.column(VariantItemsViolates(
            ColumnBridge.expression(array(node)), Nil, "pprop", "",
            Nil, Nil, Nil, Nil, 0, "", javaPatternForm(re), Nil,
            Seq(walkTermOf(term))))
          guarded(c)(t(p) === "object" && cond)
        // additionalProperties SCHEMA form (r16): pprop's complement —
        // the native selects keys matched by neither the declared set
        // nor a patternProperties selector
        case c @ AddPropsCheck(p, ks, pats, _, term, _) =>
          import org.apache.spark.sql.graftglue.{ColumnBridge, VariantItemsViolates}
          val node = expr(s"try_variant_get($vcol, '$p')")
          val cond = ColumnBridge.column(VariantItemsViolates(
            ColumnBridge.expression(array(node)), Nil, "aprop", "",
            Nil, Nil, Nil, Nil, 0, "", "", ks,
            Seq(walkTermOf(term)), 1, -1, Nil,
            pats.map(javaPatternForm)))
          guarded(c)(t(p) === "object" && cond)
        // object key-count bounds (r14): same one-element-array device
        case c @ ObjBound(p, op, b, _) =>
          import org.apache.spark.sql.graftglue.{ColumnBridge, VariantItemsViolates}
          val node = expr(s"try_variant_get($vcol, '$p')")
          val cond = ColumnBridge.column(VariantItemsViolates(
            ColumnBridge.expression(array(node)), Nil, op, "",
            Nil, Nil, Nil, Nil, b.toDouble, "", ""))
          guarded(c)(t(p) === "object" && cond)
        // per-element checks: ONE native compiled walk per check over the
        // extracted array<variant> (graftglue.VariantItemsViolates),
        // guarded on the node being array-typed. A HOF spelling
        // (exists/zip_with) is CodegenFallback and de-fused the gate's
        // ENTIRE projection — parse, every path check, the concat_ws —
        // measured +112% on the oracle corpus before the native
        // (plans/FUSION.md's r6 lesson, re-learned r12); the native's
        // element classification folds the variant type tag to the same
        // canonical alphabet the path walk (VariantPathTypes) folds to
        case c: ItemsCheck =>
          import org.apache.spark.sql.graftglue.{ColumnBridge, VariantItemsViolates}
          val vs = c.enumVals
          val cond = ColumnBridge.column(VariantItemsViolates(
            ColumnBridge.expression(col(arrCols(c.path))), c.steps, c.kind,
            c.expected,
            vs.collect { case EStr(s) => s },
            vs.collect { case EInt(i) => i },
            vs.collect { case EDbl(d) => d },
            vs.collect { case EBool(bv) => bv },
            c.bound, c.field,
            if (c.pattern.isEmpty) c.pattern else javaPatternForm(c.pattern),
            c.keys, c.sub.map(walkTermOf), c.minC, c.maxC,
            c.sub2.map(walkTermOf), c.pats.map(javaPatternForm)))
          guarded(c)(t(c.path) === "array" && cond)
      }
    val withV = df.withColumn(vcol, expr(s"try_parse_json(`$jsonCol`)"))
    val withTypes = withV.withColumn(typesCol,
      org.apache.spark.sql.graftglue.ColumnBridge.column(
        org.apache.spark.sql.graftglue.VariantPathTypes(
          org.apache.spark.sql.graftglue.ColumnBridge.expression(col(vcol)),
          typePaths.map(segsOf))))
    val withVals =
      if (valuePaths.isEmpty) withTypes
      else withTypes.withColumn(valsCol,
        org.apache.spark.sql.graftglue.ColumnBridge.column(
          org.apache.spark.sql.graftglue.VariantPathDoubles(
            org.apache.spark.sql.graftglue.ColumnBridge.expression(col(vcol)),
            valuePaths.map(segsOf))))
    val out = arrCols.toSeq.sortBy(_._2)
      .foldLeft(withVals) { case (d, (p, c)) =>
        d.withColumn(c, expr(s"try_variant_get($vcol, '$p', 'array<variant>')"))
      }
      .withColumn(violationsCol, concat_ws(",", frags: _*))
      .withColumn(validCol, col(violationsCol) === "")
      .drop(vcol +: typesCol +:
        (if (valuePaths.isEmpty) Nil else Seq(valsCol)) ++:
        arrCols.values.toSeq: _*)
    parsedCol.fold(out)(pc => out.withColumn(pc,
      from_json(col(jsonCol), structType(schemaJson))))
  }

  /** [[TermRec]] → the native walk's [[org.apache.spark.sql.graftglue
    * .WalkTerm]], with the Spark-side `$`→`\z` pattern normalization
    * applied (the DuckDB generator keeps the original — RE2 `$` already
    * means end-of-text).
    */
  private def walkTermOf(tr: TermRec): org.apache.spark.sql.graftglue.WalkTerm =
    org.apache.spark.sql.graftglue.WalkTerm(tr.steps, tr.kind, tr.expected,
      tr.enumVals.collect { case EStr(s) => s },
      tr.enumVals.collect { case EInt(i) => i },
      tr.enumVals.collect { case EDbl(d) => d },
      tr.enumVals.collect { case EBool(b) => b },
      tr.bound, tr.field,
      if (tr.pattern.isEmpty) tr.pattern else javaPatternForm(tr.pattern),
      tr.keys, tr.sub.map(walkTermOf), tr.minC, tr.maxC,
      tr.sub2.map(walkTermOf), tr.pats.map(javaPatternForm))

  /** render element-relative walk steps as a tag-path suffix:
    * `[]` for an array descent, `.f` for a field descent — so
    * `steps = [dims, []]` under `$.items` tags as `$.items[].dims[]`.
    */
  private def stepSuffix(steps: Seq[String]): String =
    steps.map(s => if (s == "[]") "[]" else s".$s").mkString

  private def tagOf(c: Check): String = c match {
    case Missing(p, _)      => s"missing:$p"
    case TypeIs(p, _, _)    => s"type:$p"
    case EnumIn(p, _, _)    => s"enum:$p"
    case Bound(p, op, _, _) => s"$op:$p"
    case LenBound(p, op, _, _) => s"$op:$p"
    case ArrBound(p, op, _, _) => s"$op:$p"
    case PatternCheck(p, _, _) => s"pattern:$p"
    case ExtraKeys(p, _, _, _) => s"extra:$p"
    case UniqueCheck(p, _)     => s"unique:$p"
    case ObjBound(p, op, _, _) => s"$op:$p"
    case d: DepRequired        => s"dep:${d.thenPath}"
    case ContainsCheck(p, _, _, _, _) => s"contains:$p"
    case PropNamesCheck(p, _, _)      => s"propname:$p"
    case CondCheck(p, branch, _, _, _)     => s"$branch:$p"
    case OneOfDynCheck(p, _, _)            => s"oneof:$p"
    case AnyOfCheck(p, _, _)               => s"anyof:$p"
    case NotCheck(p, _, _)                 => s"not:$p"
    case DepSchemaCheck(p, k, _, _)        => s"depschema:$p.$k"
    case PatternPropsCheck(p, _, suf, _, _) => s"pprop:$p$suf"
    case AddPropsCheck(p, _, _, suf, _, _)  => s"aprop:$p$suf"
    case ic: ItemsCheck =>
      val base = s"${ic.path}[]${stepSuffix(ic.steps)}"
      ic.kind match {
        case "missing" => s"missing:$base.${ic.field}"
        case "dep"     => s"dep:$base.${ic.field}"
        // cond: `expected` names the branch; pprop: `field` carries the
        // rendered inner suffix (steps + kind); depschema: `expected`
        // carries the key
        case "cond"      => s"${ic.expected}:$base"
        case "pprop"     => s"pprop:$base${ic.field}"
        case "aprop"     => s"aprop:$base${ic.field}"
        case "oneofdyn"  => s"oneof:$base"
        case "anyof"     => s"anyof:$base"
        case "notk"      => s"not:$base"
        case "depschema" => s"depschema:$base.${ic.expected}"
        case k           => s"$k:$base"
      }
  }

  // ------------------------------------------------------------------
  // DuckDB oracle side — generated from the SAME compiled walk
  // ------------------------------------------------------------------

  /** (violationsSql, isValidSql) over the raw-JSON SQL expression
    * `rawExpr` — the DuckDB replay of [[validate]]'s two appended
    * columns, fragment-for-fragment in the same order.
    */
  def oracleChecksSql(schemaJson: String, rawExpr: String): (String, String) = {
    val root = parseSchema(schemaJson)
    val malformed = s"(($rawExpr) IS NULL OR NOT json_valid($rawExpr))"
    // TRY_CAST, not ::JSON: a plain cast THROWS on a malformed message
    // even under a CASE guard (DuckDB's vectorized executor can evaluate
    // the branch eagerly) — TRY_CAST folds malformed to NULL, and
    // json_type(NULL, path) is NULL, which the canonical alphabet already
    // treats as missing
    def actual(path: String): String =
      s"""(CASE WHEN json_type(TRY_CAST(($rawExpr) AS JSON), '$path') IS NULL
         |  THEN NULL ELSE
         |  (CASE json_type(TRY_CAST(($rawExpr) AS JSON), '$path')
         |  WHEN 'UBIGINT' THEN 'int' WHEN 'BIGINT' THEN 'int'
         |  WHEN 'DOUBLE' THEN 'double' WHEN 'VARCHAR' THEN 'string'
         |  WHEN 'BOOLEAN' THEN 'bool' WHEN 'OBJECT' THEN 'object'
         |  WHEN 'ARRAY' THEN 'array' WHEN 'NULL' THEN 'null'
         |  ELSE 'other' END) END)""".stripMargin.replace("\n", " ")
    def matchesSql(a: String, declared: String): String =
      declared.split('|').toSeq.map {
        case "number"  => s"$a IN ('int', 'double')"
        case "integer" => s"$a = 'int'"
        case "boolean" => s"$a = 'bool'"
        case t         => s"$a = '$t'"
      }.mkString("(", " OR ", ")")
    def guardSql(c: Check): String =
      (s"NOT $malformed" +: c.guards.map(g => s"${actual(g)} = 'object'"))
        .mkString("(", " AND ", ")")
    // per-element replay: unnest the array's elements ('$path[*]' — each a
    // JSON value whose json_type is the element's own type) inside a
    // correlated EXISTS; the CASE arm keeps unnest off non-arrays, and an
    // empty array yields EXISTS(∅) = false on both engines.
    // NULL-PRESERVING (r14): json_extract('$[*]') folds a JSON null
    // element to SQL NULL — which downstream reads as ABSENT, while the
    // Spark native classifies the same element as canonical "null" (so a
    // null element VIOLATES a type check). list_transform substitutes
    // the JSON null literal back into each slot, restoring the
    // distinction the two engines must share.
    def nullSafeElems(arrExpr: String): String =
      s"list_transform($arrExpr, x -> COALESCE(x, TRY_CAST('null' AS JSON)))"
    def elems(path: String): String =
      s"""(SELECT unnest(CASE WHEN json_type(TRY_CAST(($rawExpr) AS JSON), '$path') = 'ARRAY'
         |  THEN ${nullSafeElems(s"json_extract(TRY_CAST(($rawExpr) AS JSON), '$path[*]')")}
         |  ELSE CAST([] AS JSON[]) END) AS el)""".stripMargin.replace("\n", " ")
    // the canonical fold of the node at element-relative json path `rp`
    // under alias `alias` — NULL when the path is absent (the outer CASE,
    // because `CASE NULL WHEN …` would fall to the ELSE arm and
    // misreport an absent node as 'other')
    def foldAt(alias: String, rp: String): String =
      s"""(CASE WHEN json_type($alias, '$rp') IS NULL THEN NULL ELSE
         |  (CASE json_type($alias, '$rp')
         |  WHEN 'UBIGINT' THEN 'int' WHEN 'BIGINT' THEN 'int'
         |  WHEN 'DOUBLE' THEN 'double' WHEN 'VARCHAR' THEN 'string'
         |  WHEN 'BOOLEAN' THEN 'bool' WHEN 'OBJECT' THEN 'object'
         |  WHEN 'ARRAY' THEN 'array' WHEN 'NULL' THEN 'null'
         |  ELSE 'other' END) END)""".stripMargin.replace("\n", " ")
    def sqlStr(s: String): String = s"'${s.replace("'", "''")}'"
    // typed enum membership (r13) — the SQL twin of the Spark buckets:
    // `a` is the canonical-type CASE, `rawStr` the value's text form; an
    // empty bucket renders as the bare type test (any value of that type
    // violates)
    def enumSql(a: String, rawStr: String, vs: Seq[EnumVal]): String = {
      val strs = vs.collect { case EStr(s) => s"'${s.replace("'", "''")}'" }
      val ints = vs.collect { case EInt(i) => i.toString }
      val dbls = vs.collect { case EDbl(d) => d.toString }
      val bools = vs.collect { case EBool(b) => if (b) "'true'" else "'false'" }
      def bucket(ty: String, cond: Option[String]) =
        cond.fold(s"$a = '$ty'")(cc => s"($a = '$ty' AND $cc)")
      Seq(
        bucket("string", Option.when(strs.nonEmpty)(
          s"$rawStr NOT IN (${strs.mkString(", ")})")),
        bucket("int", Option.when(ints.nonEmpty)(
          s"TRY_CAST($rawStr AS BIGINT) NOT IN (${ints.mkString(", ")})")),
        bucket("double", Option.when(dbls.nonEmpty)(
          s"TRY_CAST($rawStr AS DOUBLE) NOT IN (${dbls.mkString(", ")})")),
        bucket("bool", Option.when(bools.nonEmpty)(
          s"$rawStr NOT IN (${bools.mkString(", ")})"))
      ).mkString("(", " OR ", ")")
    }
    // uniqueItems (r14): duplicate iff the count of SCALAR+null elements
    // exceeds their distinct (type-bucket, value) count — numerics as
    // the shared double rendered to text (equal doubles ⇔ equal shortest
    // round-trip strings), nulls coalesced to '' under their own bucket
    // (DuckDB's DISTINCT does not collapse structs with NULL fields);
    // container elements (bucket NULL) are filtered out, mirroring the
    // native's skip
    def uniqueSql(alias: String, rp: String, fold: String): String = {
      val sub =
        s"""(SELECT unnest(CASE WHEN json_type($alias, '$rp') = 'ARRAY'
           |  THEN ${nullSafeElems(s"json_extract($alias, '$rp[*]')")}
           |  ELSE CAST([] AS JSON[]) END) AS ue)""".stripMargin
          .replace("\n", " ")
      val bucket = "(CASE json_type(ue, '$') WHEN 'UBIGINT' THEN 'n' " +
        "WHEN 'BIGINT' THEN 'n' WHEN 'DOUBLE' THEN 'n' " +
        "WHEN 'VARCHAR' THEN 's' WHEN 'BOOLEAN' THEN 'b' " +
        "WHEN 'NULL' THEN 'z' ELSE NULL END)"
      // + 0.0 folds IEEE -0.0 to 0.0 before rendering (the native set
      // does the same) — the mathematical-value rule
      val valStr = s"COALESCE((CASE WHEN $bucket = 'n' THEN " +
        "CAST(TRY_CAST(json_extract_string(ue, '$') AS DOUBLE) + 0.0 AS VARCHAR) " +
        "ELSE json_extract_string(ue, '$') END), '')"
      s"($fold = 'array' AND " +
        s"(SELECT count(*) FROM $sub WHERE $bucket IS NOT NULL) > " +
        s"(SELECT count(DISTINCT ($bucket, $valStr)) FROM $sub " +
        s"WHERE $bucket IS NOT NULL))"
    }
    // the terminal check of one walk term on the node at json path `rp`
    // under `alias` — each arm guarded on the node's checkable runtime
    // type exactly as the native walk is (foldAt is NULL for an absent
    // node, so a never-reached terminal skips every arm). `depth` seeds
    // fresh unnest aliases for the r15 contains terminal's own
    // sub-walks.
    def termTerminal(alias: String, rp: String, tr: TermRec,
                     depth: Int): String = {
      val fold = foldAt(alias, rp)
      val rawStr = s"json_extract_string($alias, '$rp')"
      tr.kind match {
        case "type" =>
          s"($fold IS NOT NULL AND NOT (${matchesSql(fold, tr.expected)}))"
        case "enum" => enumSql(fold, rawStr, tr.enumVals)
        case "min" =>
          s"($fold IN ('int', 'double') AND TRY_CAST($rawStr AS DOUBLE) < ${tr.bound})"
        case "max" =>
          s"($fold IN ('int', 'double') AND TRY_CAST($rawStr AS DOUBLE) > ${tr.bound})"
        case "xmin" =>
          s"($fold IN ('int', 'double') AND TRY_CAST($rawStr AS DOUBLE) <= ${tr.bound})"
        case "xmax" =>
          s"($fold IN ('int', 'double') AND TRY_CAST($rawStr AS DOUBLE) >= ${tr.bound})"
        case "multipleof" =>
          s"($fold IN ('int', 'double') AND (TRY_CAST($rawStr AS DOUBLE) % ${tr.bound}) <> 0)"
        case "minlen" =>
          s"($fold = 'string' AND length($rawStr) < ${tr.bound.toInt})"
        case "maxlen" =>
          s"($fold = 'string' AND length($rawStr) > ${tr.bound.toInt})"
        case "pattern" =>
          s"($fold = 'string' AND NOT regexp_matches($rawStr, ${sqlStr(tr.pattern)}))"
        case "minitems" =>
          s"($fold = 'array' AND json_array_length($alias, '$rp') < ${tr.bound.toInt})"
        case "maxitems" =>
          s"($fold = 'array' AND json_array_length($alias, '$rp') > ${tr.bound.toInt})"
        case "extra" =>
          val keysArr = s"json_keys($alias, '$rp')"
          // r16: a sibling patternProperties selector admits its matched
          // keys (the spec's matched-by-neither rule) — original RE2
          // patterns, like every oracle-side regex
          val conds =
            (if (tr.keys.nonEmpty)
              Seq(s"xk NOT IN (${tr.keys.map(sqlStr).mkString(", ")})")
            else Nil) ++
              tr.pats.map(p => s"NOT regexp_matches(xk, ${sqlStr(p)})")
          val extras = if (conds.isEmpty) keysArr
            else s"list_filter($keysArr, xk -> ${conds.mkString(" AND ")})"
          s"($fold = 'object' AND len($extras) > 0)"
        case "unique" => uniqueSql(alias, rp, fold)
        case "minprops" =>
          s"($fold = 'object' AND len(json_keys($alias, '$rp')) < ${tr.bound.toInt})"
        case "maxprops" =>
          s"($fold = 'object' AND len(json_keys($alias, '$rp')) > ${tr.bound.toInt})"
        case "dep" =>
          val ifP = if (rp == "$") s"$$.${tr.expected}" else s"$rp.${tr.expected}"
          val thenP = if (rp == "$") s"$$.${tr.field}" else s"$rp.${tr.field}"
          s"($fold = 'object' AND json_type($alias, '$ifP') IS NOT NULL AND json_type($alias, '$thenP') IS NULL)"
        // propertyNames pattern (r15): the keys themselves — DuckDB's
        // json_keys + a regex list_filter (the ORIGINAL pattern: RE2 `$`
        // already anchors end-of-text)
        case "propname" =>
          s"($fold = 'object' AND len(list_filter(json_keys($alias, '$rp'), pk -> NOT regexp_matches(pk, ${sqlStr(tr.pattern)}))) > 0)"
        // contains/minContains/maxContains (r15): a correlated
        // unnest-COUNT of elements SATISFYING the subschema — satisfy =
        // every sub-term's violation SQL is false, COALESCE'd because an
        // absent-path term folds to SQL NULL and must read as the
        // vacuous PASS the native's skip rules produce
        case "contains" =>
          val a2 = s"el$depth"
          val sub =
            s"""(SELECT unnest(CASE WHEN json_type($alias, '$rp') = 'ARRAY'
               |  THEN ${nullSafeElems(s"json_extract($alias, '$rp[*]')")}
               |  ELSE CAST([] AS JSON[]) END) AS $a2)"""
              .stripMargin.replace("\n", " ")
          val sat = if (tr.sub.isEmpty) "TRUE"
            else tr.sub.map(t2 =>
              s"NOT COALESCE(${termGen(a2, depth + 1, t2.steps, t2)}, FALSE)")
              .mkString("(", " AND ", ")")
          val cnt = s"(SELECT count(*) FROM $sub WHERE $sat)"
          val bad = if (tr.maxC >= 0)
            s"($cnt < ${tr.minC} OR $cnt > ${tr.maxC})"
          else s"($cnt < ${tr.minC})"
          s"($fold = 'array' AND $bad)"
        case "missing" =>
          val fp = if (rp == "$") s"$$.${tr.field}" else s"$rp.${tr.field}"
          s"($fold = 'object' AND json_type($alias, '$fp') IS NULL)"
        // if/then/else + discriminated oneOf (r16): satisfaction of the
        // `sub` if-terms (each violation COALESCE'd to false — an
        // absent-path term is the native's vacuous pass) gates the
        // `sub2` branch terms; "else" inverts. The node itself must be
        // PRESENT (fold IS NOT NULL) — a conditional validates nothing
        // at an absent location on either engine.
        case "cond" =>
          def anyV(ts: Seq[TermRec]): String =
            if (ts.isEmpty) "FALSE"
            else ts.map(t2 =>
              s"COALESCE(${termGen(alias, depth + 1, t2.steps, t2, rp)}, FALSE)")
              .mkString("(", " OR ", ")")
          val sat = s"(NOT ${anyV(tr.sub)})"
          val cond = if (tr.expected == "else") s"(NOT $sat)" else sat
          s"($fold IS NOT NULL AND $cond AND ${anyV(tr.sub2)})"
        // anyOf / dynamic oneOf (r16): member-group satisfaction = every
        // group term's violation COALESCE'd to false (absent-path =
        // vacuous pass), conjoined; anyOf violates when NO group is
        // satisfied, dynamic oneOf when the satisfied count ≠ 1. The
        // node itself must be PRESENT on both engines.
        case "anyof" | "oneofdyn" =>
          def satG(g: TermRec): String =
            if (g.sub.isEmpty) "TRUE"
            else g.sub.map(t2 =>
              s"NOT COALESCE(${termGen(alias, depth + 1, t2.steps, t2, rp)}, FALSE)")
              .mkString("(", " AND ", ")")
          if (tr.kind == "anyof")
            s"($fold IS NOT NULL AND NOT ${tr.sub.map(satG).mkString("(", " OR ", ")")})"
          else {
            val cnt = tr.sub.map(g => s"(CASE WHEN ${satG(g)} THEN 1 ELSE 0 END)")
              .mkString("(", " + ", ")")
            s"($fold IS NOT NULL AND $cnt <> 1)"
          }
        // not (r16): satisfaction of the subschema IS the violation
        case "notk" =>
          val sat = if (tr.sub.isEmpty) "TRUE"
            else tr.sub.map(t2 =>
              s"NOT COALESCE(${termGen(alias, depth + 1, t2.steps, t2, rp)}, FALSE)")
              .mkString("(", " AND ", ")")
          s"($fold IS NOT NULL AND $sat)"
        // dependentSchemas (r16): the OBJECT carrying `expected` (a JSON
        // null IS present) must satisfy the subschema's terms, re-walked
        // from the conditioned node
        case "depschema" =>
          val kp = if (rp == "$") s"$$.${tr.expected}" else s"$rp.${tr.expected}"
          val anyV = if (tr.sub.isEmpty) "FALSE"
            else tr.sub.map(t2 =>
              s"COALESCE(${termGen(alias, depth + 1, t2.steps, t2, rp)}, FALSE)")
              .mkString("(", " OR ", ")")
          s"($fold = 'object' AND json_type($alias, '$kp') IS NOT NULL AND $anyV)"
        // patternProperties (r16): keys of the object at `rp` matching
        // the selector, each key's VALUE re-rooted as a fresh unnest
        // alias and checked against the single inner term. Values
        // extract via a JSON POINTER built from the key (~ and /
        // escaped), so runtime keys carrying path syntax cannot inject;
        // a JSON-null value folds back from SQL NULL exactly as the
        // element replay does (the key EXISTS — json_keys listed it).
        case "pprop" =>
          val a2 = s"pv$depth"
          val keysSel =
            s"list_filter(json_keys($alias, '$rp'), pk -> regexp_matches(pk, ${sqlStr(tr.pattern)}))"
          val vals = s"list_transform($keysSel, pk -> COALESCE(" +
            s"json_extract(json_extract($alias, '$rp'), " +
            "'/' || replace(replace(pk, '~', '~0'), '/', '~1')), " +
            "TRY_CAST('null' AS JSON)))"
          val sub = s"(SELECT unnest($vals) AS $a2)"
          val inner = tr.sub.map(t2 =>
            s"COALESCE(${termGen(a2, depth + 1, t2.steps, t2)}, FALSE)")
            .mkString("(", " OR ", ")")
          s"($fold = 'object' AND EXISTS (SELECT 1 FROM $sub WHERE $inner))"
        // additionalProperties SCHEMA form (r16): pprop with the
        // COMPLEMENT key selection — matched by neither the declared
        // set (`keys`) nor any patternProperties selector (`pats`);
        // values re-root via the same injection-proof JSON Pointer
        case "aprop" =>
          val a2 = s"av$depth"
          val conds =
            (if (tr.keys.nonEmpty)
              Seq(s"pk NOT IN (${tr.keys.map(sqlStr).mkString(", ")})")
            else Nil) ++
              tr.pats.map(p => s"NOT regexp_matches(pk, ${sqlStr(p)})")
          val keysSel = if (conds.isEmpty) s"json_keys($alias, '$rp')"
            else s"list_filter(json_keys($alias, '$rp'), pk -> ${conds.mkString(" AND ")})"
          val vals = s"list_transform($keysSel, pk -> COALESCE(" +
            s"json_extract(json_extract($alias, '$rp'), " +
            "'/' || replace(replace(pk, '~', '~0'), '/', '~1')), " +
            "TRY_CAST('null' AS JSON)))"
          val sub = s"(SELECT unnest($vals) AS $a2)"
          val inner = tr.sub.map(t2 =>
            s"COALESCE(${termGen(a2, depth + 1, t2.steps, t2)}, FALSE)")
            .mkString("(", " OR ", ")")
          s"($fold = 'object' AND EXISTS (SELECT 1 FROM $sub WHERE $inner))"
      }
    }
    // walk the element-relative steps: consecutive FIELD steps flatten
    // into one json path (absent/non-object intermediates fold the whole
    // path to NULL on both engines — the same silent skip the native's
    // per-step guards produce), and each ARRAY step opens one more
    // correlated unnest EXISTS with a fresh element alias. `at` (r16)
    // roots the walk at a json path below `alias` instead of at `$` —
    // the conditional terminal re-walks its branch terms from the node
    // it fired on.
    def termGen(alias: String, depth: Int, rest: Seq[String],
                tr: TermRec, at: String = "$"): String = {
      val (fields, tail) = rest.span(_ != "[]")
      val rp =
        if (fields.isEmpty) at
        else (if (at == "$") "$." else s"$at.") + fields.mkString(".")
      if (tail.isEmpty) termTerminal(alias, rp, tr, depth)
      else {
        val a2 = s"el$depth"
        val sub =
          s"""(SELECT unnest(CASE WHEN json_type($alias, '$rp') = 'ARRAY'
             |  THEN ${nullSafeElems(s"json_extract($alias, '$rp[*]')")}
             |  ELSE CAST([] AS JSON[]) END) AS $a2)"""
            .stripMargin.replace("\n", " ")
        s"(json_type($alias, '$rp') = 'ARRAY' AND EXISTS (SELECT 1 FROM $sub WHERE ${termGen(a2, depth + 1, tail.tail, tr)}))"
      }
    }
    val frags = s"CASE WHEN $malformed THEN 'malformed' END" +:
      checksOf(root).map { c =>
        val cond = c match {
          case Missing(p, _)   => s"${actual(p)} IS NULL"
          case TypeIs(p, t, _) =>
            s"(${actual(p)} IS NOT NULL AND NOT (${matchesSql(actual(p), t)}))"
          case EnumIn(p, vs, _) =>
            enumSql(actual(p),
              s"json_extract_string(TRY_CAST(($rawExpr) AS JSON), '$p')", vs)
          case Bound(p, op, b, _) =>
            val v = s"TRY_CAST(json_extract_string(TRY_CAST(($rawExpr) AS JSON), '$p') AS DOUBLE)"
            val bad = op match {
              case "min"        => s"$v < $b"
              case "max"        => s"$v > $b"
              case "xmin"       => s"$v <= $b"
              case "xmax"       => s"$v >= $b"
              case "multipleof" => s"($v % $b) <> 0"
            }
            s"(${actual(p)} IN ('int', 'double') AND $bad)"
          case LenBound(p, op, b, _) =>
            val cmp = if (op == "minlen") "<" else ">"
            s"(${actual(p)} = 'string' AND length(json_extract_string(TRY_CAST(($rawExpr) AS JSON), '$p')) $cmp $b)"
          case ArrBound(p, op, b, _) =>
            val cmp = if (op == "minitems") "<" else ">"
            s"(${actual(p)} = 'array' AND json_array_length(TRY_CAST(($rawExpr) AS JSON), '$p') $cmp $b)"
          case PatternCheck(p, re, _) =>
            s"(${actual(p)} = 'string' AND NOT regexp_matches(json_extract_string(TRY_CAST(($rawExpr) AS JSON), '$p'), ${sqlStr(re)}))"
          // additionalProperties: false (r14) — json_keys lists the
          // object's keys; any key outside the declared set violates
          // (an empty declared set means ANY key does)
          case ExtraKeys(p, ks, _, pats) =>
            val keysArr = s"json_keys(TRY_CAST(($rawExpr) AS JSON), '$p')"
            val conds =
              (if (ks.nonEmpty)
                Seq(s"xk NOT IN (${ks.map(sqlStr).mkString(", ")})")
              else Nil) ++
                pats.map(pt => s"NOT regexp_matches(xk, ${sqlStr(pt)})")
            val extras = if (conds.isEmpty) keysArr
              else s"list_filter($keysArr, xk -> ${conds.mkString(" AND ")})"
            s"(${actual(p)} = 'object' AND len($extras) > 0)"
          case UniqueCheck(p, _) =>
            uniqueSql(s"TRY_CAST(($rawExpr) AS JSON)", p, actual(p))
          case ObjBound(p, op, b, _) =>
            val cmp = if (op == "minprops") "<" else ">"
            s"(${actual(p)} = 'object' AND len(json_keys(TRY_CAST(($rawExpr) AS JSON), '$p')) $cmp $b)"
          case d @ DepRequired(p, _, _, _) =>
            s"(${actual(p)} = 'object' AND ${actual(d.ifPath)} IS NOT NULL AND ${actual(d.thenPath)} IS NULL)"
          // contains at a path (r15): COUNT the satisfying elements of
          // the array at `p` (the same correlated-unnest shape as the
          // element-depth terminal, rooted at the raw message)
          case ContainsCheck(p, terms, minCont, maxCont, _) =>
            val sat = if (terms.isEmpty) "TRUE"
              else terms.map(t2 =>
                s"NOT COALESCE(${termGen("el", 0, t2.steps, t2)}, FALSE)")
                .mkString("(", " AND ", ")")
            val cnt = s"(SELECT count(*) FROM ${elems(p)} WHERE $sat)"
            val bad = if (maxCont >= 0)
              s"($cnt < $minCont OR $cnt > $maxCont)"
            else s"($cnt < $minCont)"
            s"(${actual(p)} = 'array' AND $bad)"
          case PropNamesCheck(p, re, _) =>
            s"(${actual(p)} = 'object' AND len(list_filter(json_keys(TRY_CAST(($rawExpr) AS JSON), '$p'), pk -> NOT regexp_matches(pk, ${sqlStr(re)}))) > 0)"
          // r16 conditionals / patternProperties at a path: the shared
          // term terminal, rooted at the raw message (foldAt ≡ actual)
          case CondCheck(p, branch, ifTerms, brTerms, _) =>
            termTerminal(s"TRY_CAST(($rawExpr) AS JSON)", p,
              TermRec(Nil, "cond", expected = branch, sub = ifTerms,
                sub2 = brTerms), 0)
          case OneOfDynCheck(p, groups, _) =>
            termTerminal(s"TRY_CAST(($rawExpr) AS JSON)", p,
              TermRec(Nil, "oneofdyn", sub = groups), 0)
          case AnyOfCheck(p, groups, _) =>
            termTerminal(s"TRY_CAST(($rawExpr) AS JSON)", p,
              TermRec(Nil, "anyof", sub = groups), 0)
          case NotCheck(p, terms, _) =>
            termTerminal(s"TRY_CAST(($rawExpr) AS JSON)", p,
              TermRec(Nil, "notk", sub = terms), 0)
          case DepSchemaCheck(p, key, terms, _) =>
            termTerminal(s"TRY_CAST(($rawExpr) AS JSON)", p,
              TermRec(Nil, "depschema", expected = key, sub = terms), 0)
          case PatternPropsCheck(p, re, _, term, _) =>
            termTerminal(s"TRY_CAST(($rawExpr) AS JSON)", p,
              TermRec(Nil, "pprop", pattern = re, sub = Seq(term)), 0)
          case AddPropsCheck(p, ks, pats, _, term, _) =>
            termTerminal(s"TRY_CAST(($rawExpr) AS JSON)", p,
              TermRec(Nil, "aprop", keys = ks, pats = pats,
                sub = Seq(term)), 0)
          case ic: ItemsCheck =>
            // delegate to the shared term walk (termGen/termTerminal —
            // the same generators the r15 contains satisfaction uses)
            val tr = TermRec(ic.steps, ic.kind, ic.expected, ic.enumVals,
              ic.bound, ic.field, ic.pattern, ic.keys, ic.sub, ic.minC,
              ic.maxC, ic.sub2, ic.pats)
            s"(${actual(ic.path)} = 'array' AND EXISTS (SELECT 1 FROM ${elems(ic.path)} WHERE ${termGen("el", 0, ic.steps, tr)}))"
        }
        s"CASE WHEN ${guardSql(c)} AND $cond THEN '${tagOf(c)}' END"
      }
    val violations = frags.mkString("concat_ws(',', ", ", ", ")")
    (violations, s"($violations = '')")
  }
}
