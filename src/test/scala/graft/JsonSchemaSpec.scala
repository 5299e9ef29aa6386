package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.schema.JsonSchemaGate

/** JSON-Schema validation gate (reference JsonValidator experiment,
  * working form; oracled as q_json_schema).
  */
class JsonSchemaSpec extends SparkSpec {
  import spark.implicits._

  private val schema =
    """{"type": "object", "required": ["user", "type", "value"],
      | "properties": {
      |  "user": {"type": "object", "required": ["id"],
      |           "properties": {"id": {"type": "integer"},
      |                          "name": {"type": "string"}}},
      |  "type": {"type": "string", "enum": ["click", "view"]},
      |  "value": {"type": "number"},
      |  "tags": {"type": "array"}}}""".stripMargin

  private def violationsOf(raws: (Long, String)*): Map[Long, (Boolean, String)] =
    JsonSchemaGate.validate(raws.toSeq.toDF("id", "raw"), "raw", schema,
        parsedCol = None)
      .select("id", "is_valid", "violations")
      .as[(Long, Boolean, String)].collect()
      .map { case (i, v, s) => i -> (v, s) }.toMap

  test("violations fire per rule, in walk order, and only under present parents") {
    val got = violationsOf(
      1L -> """{"user": {"id": 7, "name": "u"}, "type": "click", "value": 1.5, "tags": ["a"]}""",
      2L -> """{"user": {"id": 7}, "type": "view", "value": 3}""", // optional name/tags absent: valid; int is a number
      3L -> """{"user": {"name": "u"}, "type": "click", "value": 1}""", // required user.id missing
      4L -> """{"user": {"id": "7"}, "type": "click", "value": 1}""", // string where integer declared
      5L -> """{"type": "buy", "value": 1}""", // user missing ENTIRELY: one violation, no child cascade; enum violation
      6L -> """{"user": {"id": 7}, "type": "click", "value": "high"}""", // quoted number is not a number
      7L -> """{"user": {"id": 7}, "type": "click"}""", // required value missing
      8L -> """not json at all""",
      9L -> """{"user": {"id": 7}, "type": "click", "value": null}""", // JSON null is PRESENT and fails the type
      10L -> """[1, 2]""", // root isn't an object: one violation, nothing nested fires
      11L -> """{"user": {"id": 7}, "type": "click", "value": 2, "tags": "notarray"}""")
    assert(got(1L) == (true, "") && got(2L) == (true, ""))
    assert(got(3L) == (false, "missing:$.user.id"))
    assert(got(4L) == (false, "type:$.user.id"))
    assert(got(5L) == (false, "missing:$.user,enum:$.type"))
    assert(got(6L) == (false, "type:$.value"))
    assert(got(7L) == (false, "missing:$.value"))
    assert(got(8L) == (false, "malformed"))
    assert(got(9L) == (false, "type:$.value"))
    assert(got(10L) == (false, "type:$"))
    assert(got(11L) == (false, "type:$.tags"))
  }

  test("numeric bounds and string-length bounds fire exactly, typed-guarded") {
    val sc =
      """{"type": "object",
        | "properties": {
        |  "n": {"type": "number", "minimum": 0, "maximum": 10},
        |  "s": {"type": "string", "minLength": 2, "maxLength": 4}}}""".stripMargin
    val got = JsonSchemaGate.validate(Seq(
        (1L, """{"n": 5, "s": "ok"}"""),
        (2L, """{"n": -0.5, "s": "toolong"}"""),
        (3L, """{"n": 10.5, "s": "x"}"""),
        (4L, """{"n": 10, "s": "four"}"""), // boundary values pass (<=, >=)
        (5L, """{"n": "5", "s": 3}""")      // wrong types: bounds stay silent
      ).toDF("id", "raw"), "raw", sc, parsedCol = None)
      .select("id", "violations").as[(Long, String)].collect().toMap
    assert(got(1L) == "" && got(4L) == "")
    assert(got(2L) == "min:$.n,maxlen:$.s")
    assert(got(3L) == "max:$.n,minlen:$.s")
    assert(got(5L) == "type:$.n,type:$.s")
  }

  test("parsed struct carries the schema's types; null raw is malformed") {
    val df = Seq((1L, """{"user": {"id": 7}, "type": "click", "value": 1.5}"""),
      (2L, null.asInstanceOf[String])).toDF("id", "raw")
    val v = JsonSchemaGate.validate(df, "raw", schema)
    val f = v.schema("parsed").dataType.asInstanceOf[StructType]
    assert(f("user").dataType.asInstanceOf[StructType]("id").dataType == LongType)
    assert(f("value").dataType == DoubleType)
    assert(f("tags").dataType == ArrayType(StringType))
    assert(v.filter(col("id") === 1).select("parsed.user.id", "parsed.value")
      .as[(Long, Double)].head() == ((7L, 1.5)))
    assert(v.filter(col("id") === 2).select("violations").as[String].head()
      == "malformed")
  }

  test("per-element items validation: type/enum/bounds/lengths fire as " +
       "path[] tags, guarded on the node being array-typed") {
    val sc =
      """{"type": "object",
        | "properties": {
        |  "tags": {"type": "array",
        |           "items": {"type": "string", "minLength": 2,
        |                     "maxLength": 4,
        |                     "enum": ["ab", "cd", "four"]}},
        |  "ns":   {"type": "array", "items": {"type": "integer",
        |           "minimum": 0, "maximum": 10}}}}""".stripMargin
    val got = JsonSchemaGate.validate(Seq(
        (1L, """{"tags": ["ab", "cd"], "ns": [0, 10]}"""),
        (2L, """{"tags": ["ab", 3]}"""),          // int element in a string array
        (3L, """{"tags": ["x"]}"""),              // too short AND outside enum
        (4L, """{"tags": ["toolong"]}"""),        // too long AND outside enum
        (5L, """{"ns": [5, -1, 11]}"""),          // both bounds violated
        (6L, """{"ns": [5, 2.5]}"""),             // decimal is not an integer
        (7L, """{"tags": [], "ns": []}"""),       // empty arrays are clean
        (8L, """{"tags": "notarray"}"""),         // items checks stay silent
        (9L, """{"tags": ["ab", null]}"""))       // null element fails the type
      .toDF("id", "raw"), "raw", sc, parsedCol = None)
      .select("id", "violations").as[(Long, String)].collect().toMap
    assert(got(1L) == "" && got(7L) == "")
    // the int element fails the string items-type AND (r13 typed enum)
    // the enum — an int with no integer members violates membership too
    assert(got(2L) == "type:$.tags[],enum:$.tags[]")
    assert(got(3L) == "enum:$.tags[],minlen:$.tags[]")
    assert(got(4L) == "enum:$.tags[],maxlen:$.tags[]")
    assert(got(5L) == "min:$.ns[],max:$.ns[]")
    assert(got(6L) == "type:$.ns[]")
    assert(got(8L) == "type:$.tags")
    assert(got(9L) == "type:$.tags[]")
  }

  test("typed enum (r13): integer/number/boolean enums reject by exact " +
       "typed compare; a scalar with no same-type members violates") {
    val sc =
      """{"type": "object",
        | "properties": {
        |  "p": {"type": "integer", "enum": [1, 2, 3]},
        |  "r": {"enum": [0.5, 2.0]},
        |  "b": {"enum": [true]},
        |  "m": {"enum": ["a", 1]}}}""".stripMargin
    val got = JsonSchemaGate.validate(Seq(
        (1L, """{"p": 2, "r": 0.5, "b": true, "m": "a"}"""),
        (2L, """{"p": 4}"""),        // the verdict's canonical case: 4 ∉ [1,2,3]
        (3L, """{"p": "four"}"""),   // wrong type AND outside membership
        (4L, """{"r": 2.5}"""),
        (5L, """{"r": 2.0}"""),
        (6L, """{"r": 2}"""),        // int vs double members: out-of-subset → violates
        (7L, """{"b": false}"""),
        (8L, """{"m": 1}"""),        // mixed enum: int bucket has 1
        (9L, """{"m": 2}"""),
        (10L, """{"p": null}"""))    // JSON null: type's business, enum silent
      .toDF("id", "raw"), "raw", sc, parsedCol = None)
      .select("id", "violations").as[(Long, String)].collect().toMap
    assert(got(1L) == "" && got(5L) == "" && got(8L) == "")
    assert(got(2L) == "enum:$.p")
    assert(got(3L) == "type:$.p,enum:$.p")
    assert(got(4L) == "enum:$.r" && got(6L) == "enum:$.r")
    assert(got(7L) == "enum:$.b")
    assert(got(9L) == "enum:$.m")
    assert(got(10L) == "type:$.p")
  }

  test("arrays of objects (r13): per-element required/type fire as " +
       "missing:/type:$.path[].field, only on object elements") {
    val sc =
      """{"type": "object",
        | "properties": {
        |  "evs": {"type": "array",
        |          "items": {"type": "object", "required": ["k"],
        |                    "properties": {"k": {"type": "integer"},
        |                                   "s": {"type": "string"}}}}}}""".stripMargin
    val got = JsonSchemaGate.validate(Seq(
        (1L, """{"evs": [{"k": 1, "s": "a"}, {"k": 2}]}"""), // optional s absent: clean
        (2L, """{"evs": [{"s": "a"}]}"""),
        (3L, """{"evs": [{"k": "x"}]}"""),
        (4L, """{"evs": [{"k": null}]}"""), // present JSON null fails type, not missing
        (5L, """{"evs": [1, {"k": 1}]}"""), // non-object element: items-type only
        (6L, """{"evs": "notarray"}"""),
        (7L, """{"evs": []}"""))
      .toDF("id", "raw"), "raw", sc, parsedCol = None)
      .select("id", "violations").as[(Long, String)].collect().toMap
    assert(got(1L) == "" && got(7L) == "")
    assert(got(2L) == "missing:$.evs[].k")
    assert(got(3L) == "type:$.evs[].k")
    assert(got(4L) == "type:$.evs[].k")
    assert(got(5L) == "type:$.evs[]")
    assert(got(6L) == "type:$.evs")
  }

  test("minItems/maxItems fire on array-typed nodes only (r13)") {
    val sc =
      """{"type": "object",
        | "properties": {
        |  "a": {"type": "array", "minItems": 2, "maxItems": 3}}}""".stripMargin
    val got = JsonSchemaGate.validate(Seq(
        (1L, """{"a": [1, 2]}"""),       // boundary passes
        (2L, """{"a": [1, 2, 3]}"""),    // boundary passes
        (3L, """{"a": [1]}"""),
        (4L, """{"a": [1, 2, 3, 4]}"""),
        (5L, """{"a": []}"""),
        (6L, """{"a": "notarray"}"""),   // bounds stay silent; type fires
        (7L, """{}"""))                  // absent: nothing fires
      .toDF("id", "raw"), "raw", sc, parsedCol = None)
      .select("id", "violations").as[(Long, String)].collect().toMap
    assert(got(1L) == "" && got(2L) == "" && got(7L) == "")
    assert(got(3L) == "minitems:$.a")
    assert(got(4L) == "maxitems:$.a")
    assert(got(5L) == "minitems:$.a")
    assert(got(6L) == "type:$.a")
  }

  test("full element recursion (r13): arrays of arrays, nested element " +
       "objects, element-field enum/bounds — tags root at the array path") {
    val sc =
      """{"type": "object",
        | "properties": {
        |  "items": {"type": "array",
        |   "items": {"type": "object", "required": ["sku", "lot"],
        |    "properties": {
        |     "sku": {"type": "integer"},
        |     "qty": {"type": "integer", "minimum": 1},
        |     "dims": {"type": "array", "maxItems": 2,
        |              "items": {"type": "integer", "minimum": 0}},
        |     "meta": {"type": "object", "required": ["w"],
        |              "properties": {"w": {"type": "number"}}}}}}}}""".stripMargin
    val got = JsonSchemaGate.validate(Seq(
        (1L, """{"items": [{"sku": 1, "lot": "A", "qty": 2, "dims": [3, 4], "meta": {"w": 1.5}}]}"""),
        (2L, """{"items": [{"sku": 1, "lot": 0, "qty": 0}]}"""),        // element-field bound
        (3L, """{"items": [{"sku": 1, "lot": 0, "dims": [1, -2, "x"]}]}"""), // array-of-arrays: size + element min + element type
        (4L, """{"items": [{"sku": 1, "lot": 0, "meta": {}}]}"""),      // two-level required
        (5L, """{"items": [{"sku": 1, "lot": 0, "meta": {"w": "kg"}}]}"""), // two-level field type
        (6L, """{"items": [{"sku": 1}]}"""),                            // required WITHOUT properties entry
        (7L, """{"items": [{"sku": 1, "lot": 0, "dims": "flat", "meta": 3}]}"""), // non-array/non-object: their OWN type checks
        (8L, """{"items": [{"sku": 1, "lot": 0, "qty": 1, "dims": []}]}"""))     // empty nested array clean
      .toDF("id", "raw"), "raw", sc, parsedCol = None)
      .select("id", "violations").as[(Long, String)].collect().toMap
    assert(got(1L) == "" && got(8L) == "")
    assert(got(2L) == "min:$.items[].qty")
    assert(got(3L) == "maxitems:$.items[].dims,type:$.items[].dims[],min:$.items[].dims[]")
    assert(got(4L) == "missing:$.items[].meta.w")
    assert(got(5L) == "type:$.items[].meta.w")
    assert(got(6L) == "missing:$.items[].lot")
    assert(got(7L) == "type:$.items[].dims,type:$.items[].meta")
  }

  test("pattern (r13): partial-match regex on string-typed nodes, at any " +
       "path and element depth; dialect-divergent constructs abort") {
    val sc =
      """{"type": "object",
        | "properties": {
        |  "code": {"type": "string", "pattern": "^[A-Z]{2}-[0-9]+$"},
        |  "ids":  {"type": "array", "items": {"pattern": "^u"}}}}""".stripMargin
    val got = JsonSchemaGate.validate(Seq(
        (1L, """{"code": "AB-12", "ids": ["u1", "u2"]}"""),
        (2L, """{"code": "ab-12"}"""),
        (3L, """{"code": 7}"""),            // non-string: type's business
        (4L, """{"ids": ["u1", "x2"]}"""),
        (5L, """{"ids": [3]}"""))           // non-string element: silent here
      .toDF("id", "raw"), "raw", sc, parsedCol = None)
      .select("id", "violations").as[(Long, String)].collect().toMap
    assert(got(1L) == "" && got(5L) == "")
    assert(got(2L) == "pattern:$.code")
    assert(got(3L) == "type:$.code")
    assert(got(4L) == "pattern:$.ids[]")
    val e = intercept[IllegalArgumentException] {
      JsonSchemaGate.validate(Seq((1L, "{}")).toDF("id", "raw"), "raw",
        """{"type": "object", "properties":
          | {"s": {"type": "string", "pattern": "(?=x)y"}}}""".stripMargin,
        parsedCol = None)
    }
    assert(e.getMessage.contains("regex subset"))
  }

  test("required names without a properties entry fire missing (r13); " +
       "an object child with ONLY required still walks") {
    val sc =
      """{"type": "object", "required": ["ts"],
        | "properties": {
        |  "env": {"type": "object", "required": ["region"]}}}""".stripMargin
    val got = JsonSchemaGate.validate(Seq(
        (1L, """{"ts": 1, "env": {"region": "x"}}"""),
        (2L, """{"env": {"region": "x"}}"""),
        (3L, """{"ts": 1, "env": {}}"""),
        (4L, """{"ts": 1}"""))  // env not required: its child check skips
      .toDF("id", "raw"), "raw", sc, parsedCol = None)
      .select("id", "violations").as[(Long, String)].collect().toMap
    assert(got(1L) == "" && got(4L) == "")
    assert(got(2L) == "missing:$.ts")
    assert(got(3L) == "missing:$.env.region")
  }

  test("const, exclusive bounds and multipleOf (r13): typed const equality, " +
       "strict bounds, exact fmod — at paths, elements, and the root") {
    val sc =
      """{"type": "object",
        | "properties": {
        |  "v":  {"type": "string", "const": "fixed"},
        |  "n":  {"type": "number", "exclusiveMinimum": 0,
        |         "exclusiveMaximum": 10},
        |  "m":  {"type": "integer", "multipleOf": 4},
        |  "f":  {"type": "number", "multipleOf": 0.5},
        |  "xs": {"type": "array", "items": {"multipleOf": 3,
        |                                    "exclusiveMinimum": 0}}}}""".stripMargin
    val got = JsonSchemaGate.validate(Seq(
        (1L, """{"v": "fixed", "n": 5, "m": 8, "f": 2.5, "xs": [3, 6]}"""),
        (2L, """{"v": "other"}"""),
        (3L, """{"n": 0}"""),            // boundary FAILS an exclusive bound
        (4L, """{"n": 10}"""),
        (5L, """{"m": 6}"""),
        (6L, """{"f": 2.75}"""),
        (7L, """{"m": -8, "f": -1.5}"""), // negative multiples pass
        (8L, """{"xs": [3, 4, 0]}"""),   // element fmod + element strict bound
        (9L, """{"v": 3}"""))            // wrong type: type + typed-const both fire
      .toDF("id", "raw"), "raw", sc, parsedCol = None)
      .select("id", "violations").as[(Long, String)].collect().toMap
    assert(got(1L) == "" && got(7L) == "")
    assert(got(2L) == "enum:$.v")
    assert(got(3L) == "xmin:$.n")
    assert(got(4L) == "xmax:$.n")
    assert(got(5L) == "multipleof:$.m")
    assert(got(6L) == "multipleof:$.f")
    assert(got(8L) == "xmin:$.xs[],multipleof:$.xs[]")
    assert(got(9L) == "type:$.v,enum:$.v")
    // a non-object ROOT gets the full value vocabulary (r13)
    val rootSc = """{"type": "integer", "multipleOf": 2, "minimum": 0}"""
    val rootGot = JsonSchemaGate.validate(Seq(
        (1L, "4"), (2L, "3"), (3L, "-2"), (4L, "\"x\""))
      .toDF("id", "raw"), "raw", rootSc, parsedCol = None)
      .select("id", "violations").as[(Long, String)].collect().toMap
    assert(rootGot(1L) == "")
    assert(rootGot(2L) == "multipleof:$")
    assert(rootGot(3L) == "min:$")
    assert(rootGot(4L) == "type:$")
    // both enum and const on one node is ambiguous — abort
    val both = intercept[IllegalArgumentException] {
      JsonSchemaGate.validate(Seq((1L, "{}")).toDF("id", "raw"), "raw",
        """{"type": "object", "properties":
          | {"a": {"enum": [1], "const": 1}}}""".stripMargin, parsedCol = None)
    }
    assert(both.getMessage.contains("ambiguous"))
    // multipleOf must be strictly positive
    val nonpos = intercept[IllegalArgumentException] {
      JsonSchemaGate.validate(Seq((1L, "{}")).toDF("id", "raw"), "raw",
        """{"type": "object", "properties":
          | {"a": {"multipleOf": 0}}}""".stripMargin, parsedCol = None)
    }
    assert(nonpos.getMessage.contains("strictly positive"))
    // format is annotation-only in 2020-12 — allowed, not validated
    JsonSchemaGate.validate(Seq((1L, """{"a": "x"}""")).toDF("id", "raw"),
      "raw", """{"type": "object", "properties":
        | {"a": {"type": "string", "format": "email"}}}""".stripMargin,
      parsedCol = None).collect()
  }

  test("unsupported keywords and boolean schemas abort LOUDLY (the " +
       "no-silent-no-op rule)") {
    def gate(sc: String) = JsonSchemaGate.validate(
      Seq((1L, "{}")).toDF("id", "raw"), "raw", sc, parsedCol = None)
    // the whole disjunction/negation vocabulary is in subset since r16;
    // a genuinely-unknown keyword (unevaluatedProperties — cross-subschema
    // annotation flow, no static check list) still aborts loudly
    val kw = intercept[IllegalArgumentException] { gate(
      """{"type": "object", "properties":
        | {"a": {"type": "string"}}, "unevaluatedProperties": false}""".stripMargin) }
    assert(kw.getMessage.contains("unsupported JSON-Schema keyword"))
    val bool = intercept[IllegalArgumentException] { gate(
      """{"type": "object", "properties": {"a": {"type": "array", "items": false}}}""") }
    assert(bool.getMessage.contains("must be an object"))
    // annotation keywords carry no validation semantics — allowed
    gate("""{"$schema": "https://json-schema.org/draft/2020-12/schema",
           | "title": "t", "type": "object",
           | "properties": {"a": {"type": "string", "description": "d"}}}"""
      .stripMargin).collect()
    // beyond-int64 enum literals classify engine-dependently — a named
    // abort, not a blank one
    val big = intercept[IllegalArgumentException] { gate(
      """{"type": "object", "properties":
        | {"a": {"enum": [18446744073709551615]}}}""".stripMargin) }
    assert(big.getMessage.contains("beyond int64"))
    // malformed union specs abort with named messages (r14 — the union
    // itself is now in subset, see the dedicated union test)
    val dup = intercept[IllegalArgumentException] { gate(
      """{"type": "object", "properties":
        | {"a": {"type": ["string", "string"]}}}""".stripMargin) }
    assert(dup.getMessage.contains("duplicate"))
    val bad = intercept[IllegalArgumentException] { gate(
      """{"type": "object", "properties": {"a": {"type": ["str"]}}}""") }
    assert(bad.getMessage.contains("unsupported JSON-Schema type"))
  }

  test("additionalProperties: false (r14) closes objects at the root, at " +
       "nested paths, and at array-element depth; true is a no-op; a " +
       "non-boolean non-object argument aborts") {
    val sc =
      """{"type": "object", "additionalProperties": false,
        | "properties": {
        |  "user": {"type": "object", "additionalProperties": false,
        |           "properties": {"id": {"type": "integer"}}},
        |  "open": {"type": "object", "additionalProperties": true,
        |           "properties": {"a": {"type": "string"}}},
        |  "items": {"type": "array",
        |            "items": {"type": "object",
        |                      "additionalProperties": false,
        |                      "properties": {
        |                        "sku": {"type": "integer"},
        |                        "meta": {"type": "object",
        |                                 "additionalProperties": false,
        |                                 "properties": {
        |                                   "w": {"type": "number"}}}}}}}}"""
        .stripMargin
    val got = JsonSchemaGate.validate(Seq(
        (1L, """{"user": {"id": 1}, "open": {"a": "x", "zz": 1}, "items": [{"sku": 1, "meta": {"w": 2}}]}"""),
        (2L, """{"user": {"id": 1}, "debug": true}"""),        // root extra
        (3L, """{"user": {"id": 1, "role": "a"}}"""),          // nested extra
        (4L, """{"items": [{"sku": 1}, {"sku": 2, "x": 1}]}"""), // element extra
        (5L, """{"items": [{"sku": 1, "meta": {"w": 1, "u": "kg"}}]}"""), // two-level element extra
        (6L, """{"user": 5}"""),                               // non-object: type's business
        (7L, """{"user": {}}"""))                              // closed + empty = fine
      .toDF("id", "raw"), "raw", sc, parsedCol = None)
      .select("id", "violations").as[(Long, String)].collect().toMap
    assert(got(1L) == "" && got(7L) == "")
    assert(got(2L) == "extra:$")
    assert(got(3L) == "extra:$.user")
    assert(got(4L) == "extra:$.items[]")
    assert(got(5L) == "extra:$.items[].meta")
    assert(got(6L) == "type:$.user")
    val e = intercept[IllegalArgumentException] {
      JsonSchemaGate.validate(Seq((1L, "{}")).toDF("id", "raw"), "raw",
        """{"type": "object",
          | "additionalProperties": 5}""".stripMargin,
        parsedCol = None)
    }
    assert(e.getMessage.contains("additionalProperties"))
  }

  test("additionalProperties SCHEMA form (r16): keys matched by neither " +
       "properties nor a patternProperties selector validate their " +
       "values — at the root, nested, and element depth; $ref inlines") {
    val sc =
      """{"type": "object",
        | "$defs": {"tagv": {"type": "integer", "minimum": 0}},
        | "additionalProperties": {"$ref": "#/$defs/tagv"},
        | "patternProperties": {"^x_": {"type": "boolean"}},
        | "properties": {
        |  "name": {"type": "string"},
        |  "cfg": {"type": "object",
        |          "additionalProperties": {"type": "string",
        |                                   "maxLength": 2}},
        |  "arr": {"type": "array",
        |          "items": {"type": "object",
        |                    "additionalProperties": {"type": "integer"},
        |                    "properties": {"id": {"type": "integer"}}}}}}"""
        .stripMargin
    val got = JsonSchemaGate.validate(Seq(
        (1L, """{"name": "a", "extra": 3}"""),       // extra: int >= 0 → ok
        (2L, """{"extra": -1}"""),                   // aprop min fires
        (3L, """{"extra": "s"}"""),                  // aprop type fires
        (4L, """{"x_dbg": true, "other": 1}"""),     // selector-matched key
                                                     // is pprop's, not aprop's
        (5L, """{"x_dbg": 1}"""),                    // pprop fires, aprop skips
        (6L, """{"cfg": {"free": "ab"}}"""),         // nested ok
        (7L, """{"cfg": {"free": "abcd"}}"""),       // nested maxlen fires
        (8L, """{"arr": [{"id": 1, "n": 2}, {"id": 2, "z": "x"}]}"""))
                                                     // element aprop type
      .toDF("id", "raw"), "raw", sc, parsedCol = None)
      .select("id", "violations").as[(Long, String)].collect().toMap
    assert(got(1L) == "" && got(4L) == "" && got(6L) == "")
    assert(got(2L) == "aprop:$.min")
    assert(got(3L) == "aprop:$.type")
    assert(got(5L) == "pprop:$.type")
    assert(got(7L) == "aprop:$.cfg.maxlen")
    assert(got(8L) == "aprop:$.arr[].type")
  }

  test("allOf (r14): conjunction by compile-time merge — the $ref-base + " +
       "extras inheritance idiom; required unions, shared properties " +
       "recurse, identical values coexist, other collisions abort") {
    val sc =
      """{"type": "object",
        | "$defs": {
        |  "base": {"type": "object", "required": ["id"],
        |           "properties": {"id": {"type": "integer"},
        |                          "meta": {"type": "object",
        |                                   "required": ["v"]}}}},
        | "properties": {
        |  "msg": {"allOf": [
        |    {"$ref": "#/$defs/base"},
        |    {"type": "object", "required": ["kind"],
        |     "properties": {"kind": {"type": "string"},
        |                    "meta": {"properties":
        |                             {"v": {"type": "integer"}}}}}]}}}"""
        .stripMargin
    val got = JsonSchemaGate.validate(Seq(
        (1L, """{"msg": {"id": 1, "kind": "a", "meta": {"v": 2}}}"""),
        (2L, """{"msg": {"kind": "a"}}"""),          // base's required id
        (3L, """{"msg": {"id": 1}}"""),              // extension's required
        (4L, """{"msg": {"id": 1, "kind": "a", "meta": {"v": "x"}}}"""),
        (5L, """{"msg": {"id": "x", "kind": 2}}"""))  // both sides' types
      .toDF("id", "raw"), "raw", sc, parsedCol = None)
      .select("id", "violations").as[(Long, String)].collect().toMap
    assert(got(1L) == "")
    assert(got(2L) == "missing:$.msg.id")
    assert(got(3L) == "missing:$.msg.kind")
    // merged meta: base's required ["v"] + extension's typed v
    assert(got(4L) == "type:$.msg.meta.v")
    assert(got(5L) == "type:$.msg.id,type:$.msg.kind")
    val collide = intercept[IllegalArgumentException] {
      JsonSchemaGate.validate(Seq((1L, "{}")).toDF("id", "raw"), "raw",
        """{"type": "object", "properties":
          | {"x": {"allOf": [{"type": "integer", "minimum": 1},
          |                  {"minimum": 2}]}}}""".stripMargin,
        parsedCol = None)
    }
    assert(collide.getMessage.contains("collide"))
    // allOf members colliding on a NON-MERGEABLE keyword (anyOf is in
    // subset since r16, but two different anyOf values still collide)
    val disj = intercept[IllegalArgumentException] {
      JsonSchemaGate.validate(Seq((1L, "{}")).toDF("id", "raw"), "raw",
        """{"type": "object", "properties":
          | {"x": {"allOf": [{"anyOf": [{"type": "integer"}]},
          |                  {"anyOf": [{"type": "string"}]}]}}}""".stripMargin,
        parsedCol = None)
    }
    assert(disj.getMessage.contains("collide"))
  }

  test("union types (r14): the nullable-field idiom — a value passes when " +
       "ANY member admits it, value checks stay typed-guarded, " +
       "type: \"null\" alone works, and the parse target maps the " +
       "single non-null member") {
    val sc =
      """{"type": "object",
        | "properties": {
        |  "name": {"type": ["string", "null"], "minLength": 2},
        |  "n":    {"type": ["integer", "null"], "minimum": 0},
        |  "gone": {"type": "null"},
        |  "mix":  {"type": ["integer", "boolean"]},
        |  "tags": {"type": "array",
        |           "items": {"type": ["string", "null"], "minLength": 2}}}}"""
        .stripMargin
    val got = JsonSchemaGate.validate(Seq(
        (1L, """{"name": "ab", "n": 3, "gone": null, "mix": true, "tags": ["ab", null]}"""),
        (2L, """{"name": null, "n": null, "mix": 4}"""),
        (3L, """{"name": 7}"""),        // neither string nor null
        (4L, """{"name": "a"}"""),      // string member: value checks apply
        (5L, """{"gone": "x"}"""),      // only null admitted
        (6L, """{"mix": 1.5}"""),       // double fails integer|boolean
        (7L, """{"n": -1}"""),          // int member: minimum applies
        (8L, """{"tags": [null, "a"]}""")) // null ok; short string fires
      .toDF("id", "raw"), "raw", sc, parsedCol = None)
      .select("id", "violations").as[(Long, String)].collect().toMap
    assert(got(1L) == "" && got(2L) == "")
    assert(got(3L) == "type:$.name")
    assert(got(4L) == "minlen:$.name")
    assert(got(5L) == "type:$.gone")
    assert(got(6L) == "type:$.mix")
    assert(got(7L) == "min:$.n")
    assert(got(8L) == "minlen:$.tags[]")
    // parse target: single non-null member → its Spark type
    val st = JsonSchemaGate.structType(sc)
    assert(st("name").dataType == org.apache.spark.sql.types.StringType)
    assert(st("n").dataType == org.apache.spark.sql.types.LongType)
    // ambiguous union folds to the best-effort string annotation
    assert(st("mix").dataType == org.apache.spark.sql.types.StringType)
  }

  test("$ref/$defs (r14): local refs inline at compile — nested, chained, " +
       "and at element depth; cyclic, sibling-carrying, non-local and " +
       "unresolvable refs abort") {
    val sc =
      """{"type": "object",
        | "$defs": {
        |  "posint": {"type": "integer", "minimum": 1},
        |  "qty": {"$ref": "#/$defs/posint"},
        |  "box": {"type": "object", "required": ["n"],
        |          "properties": {"n": {"$ref": "#/$defs/posint"}}}},
        | "properties": {
        |  "n":     {"$ref": "#/$defs/qty"},
        |  "box":   {"$ref": "#/$defs/box"},
        |  "items": {"type": "array", "items": {"$ref": "#/$defs/posint"}}}}"""
        .stripMargin
    val got = JsonSchemaGate.validate(Seq(
        (1L, """{"n": 2, "box": {"n": 3}, "items": [1, 2]}"""),
        (2L, """{"n": 0}"""),                 // ref'd minimum at a path
        (3L, """{"box": {}}"""),              // ref'd object's required
        (4L, """{"items": [1, 0, "x"]}"""))   // ref'd checks per element
      .toDF("id", "raw"), "raw", sc, parsedCol = None)
      .select("id", "violations").as[(Long, String)].collect().toMap
    assert(got(1L) == "")
    assert(got(2L) == "min:$.n")
    assert(got(3L) == "missing:$.box.n")
    assert(got(4L) == "type:$.items[],min:$.items[]")
    def aborts(sc2: String, msg: String): Unit = {
      val e = intercept[IllegalArgumentException] {
        JsonSchemaGate.validate(Seq((1L, "{}")).toDF("id", "raw"), "raw",
          sc2, parsedCol = None)
      }
      assert(e.getMessage.contains(msg), s"got: ${e.getMessage}")
    }
    aborts("""{"type": "object", "$defs": {"a": {"$ref": "#/$defs/b"},
             | "b": {"$ref": "#/$defs/a"}},
             | "properties": {"x": {"$ref": "#/$defs/a"}}}""".stripMargin,
      "cyclic")
    aborts("""{"type": "object", "properties":
             | {"x": {"$ref": "#/$defs/a", "minimum": 1}},
             | "$defs": {"a": {"type": "integer"}}}""".stripMargin,
      "sibling")
    aborts("""{"type": "object", "properties":
             | {"x": {"$ref": "https://example.com/s.json"}}}""".stripMargin,
      "LOCAL")
    aborts("""{"type": "object", "properties":
             | {"x": {"$ref": "#/$defs/nope"}}}""".stripMargin,
      "does not resolve")
  }

  test("uniqueItems (r14): same-type scalar duplicates fire, numerics " +
       "compare as doubles (1 duplicates 1.0), nulls are all equal, " +
       "containers and cross-type lookalikes don't; requires a declared " +
       "scalar items type") {
    val sc =
      """{"type": "object",
        | "properties": {
        |  "tags": {"type": "array", "uniqueItems": true,
        |           "items": {"type": "string"}},
        |  "nums": {"type": "array", "uniqueItems": true,
        |           "items": {"type": "number"}},
        |  "grid": {"type": "array",
        |           "items": {"type": "array", "uniqueItems": true,
        |                     "items": {"type": "integer"}}}}}""".stripMargin
    val got = JsonSchemaGate.validate(Seq(
        (1L, """{"tags": ["a", "b"], "nums": [1, 2.5]}"""),
        (2L, """{"tags": ["a", "b", "a"]}"""),
        (3L, """{"nums": [1, 1.0]}"""),        // mathematical-value dup
        (4L, """{"nums": [1, "1"]}"""),        // string lookalike: no dup
        (5L, """{"nums": [null, null]}"""),    // nulls all equal
        (6L, """{"tags": "ab"}"""),            // non-array: type's business
        (7L, """{"grid": [[1, 2], [3, 3]]}"""), // nested-depth dup
        (8L, """{"grid": [[1, 2], [1, 2]]}"""), // container elements skip
        (9L, """{"nums": [-0.0, 0]}"""))        // IEEE -0.0 ≡ 0 (math value)
      .toDF("id", "raw"), "raw", sc, parsedCol = None)
      .select("id", "violations").as[(Long, String)].collect().toMap
    assert(got(1L) == "")
    assert(got(2L) == "unique:$.tags")
    assert(got(3L) == "unique:$.nums")
    // the string lookalike skips uniqueness (different bucket) but fails
    // the element type check
    assert(got(4L) == "type:$.nums[]")
    // two JSON nulls ARE duplicates (unique emits before the element
    // walk) and each also fails the number element type check
    assert(got(5L) == "unique:$.nums,type:$.nums[]")
    assert(got(6L) == "type:$.tags")
    assert(got(7L) == "unique:$.grid[]")
    assert(got(8L) == "")
    assert(got(9L) == "unique:$.nums")
    val e = intercept[IllegalArgumentException] {
      JsonSchemaGate.validate(Seq((1L, "{}")).toDF("id", "raw"), "raw",
        """{"type": "object", "properties":
          | {"a": {"type": "array", "uniqueItems": true,
          |        "items": {"type": "object"}}}}""".stripMargin,
        parsedCol = None)
    }
    assert(e.getMessage.contains("uniqueItems"))
  }

  test("dependentRequired (r14): key presence (incl. JSON null) requires " +
       "the dependent keys — at paths, the root, and element depth; " +
       "non-identifier names abort") {
    val sc =
      """{"type": "object",
        | "dependentRequired": {"card": ["billing", "cvv"]},
        | "properties": {
        |  "user": {"type": "object",
        |           "dependentRequired": {"email": ["verified"]}},
        |  "rows": {"type": "array",
        |           "items": {"dependentRequired": {"a": ["b"]}}}}}"""
        .stripMargin
    val got = JsonSchemaGate.validate(Seq(
        (1L, """{"card": 1, "billing": "x", "cvv": 2}"""),
        (2L, """{"billing": "x"}"""),           // no trigger key: fine
        (3L, """{"card": 1, "billing": "x"}"""), // cvv missing
        (4L, """{"card": null}"""),              // JSON null IS present
        (5L, """{"user": {"email": "e"}}"""),    // nested
        (6L, """{"rows": [{"a": 1}, {"a": 1, "b": 2}]}""")) // element
      .toDF("id", "raw"), "raw", sc, parsedCol = None)
      .select("id", "violations").as[(Long, String)].collect().toMap
    assert(got(1L) == "" && got(2L) == "")
    assert(got(3L) == "dep:$.cvv")
    assert(got(4L) == "dep:$.billing,dep:$.cvv")
    assert(got(5L) == "dep:$.user.verified")
    assert(got(6L) == "dep:$.rows[].b")
    val e = intercept[IllegalArgumentException] {
      JsonSchemaGate.validate(Seq((1L, "{}")).toDF("id", "raw"), "raw",
        """{"type": "object", "dependentRequired": {"a b": ["c"]}}""",
        parsedCol = None)
    }
    assert(e.getMessage.contains("non-identifier"))
  }

  test("minProperties/maxProperties (r14): object key-count bounds fire " +
       "on object-typed nodes only, at paths, the root, and element depth") {
    val sc =
      """{"type": "object", "minProperties": 1,
        | "properties": {
        |  "cfg":  {"type": "object", "minProperties": 1,
        |           "maxProperties": 2},
        |  "rows": {"type": "array",
        |           "items": {"type": "object", "maxProperties": 1}}}}"""
        .stripMargin
    val got = JsonSchemaGate.validate(Seq(
        (1L, """{"cfg": {"a": 1}, "rows": [{"x": 1}]}"""),
        (2L, """{"cfg": {}}"""),                     // under min at a path
        (3L, """{"cfg": {"a": 1, "b": 2, "c": 3}}"""), // over max
        (4L, """{"cfg": 5}"""),                      // non-object: type's business
        (5L, """{}"""),                              // root under min
        (6L, """{"rows": [{"x": 1, "y": 2}]}"""))    // element over max
      .toDF("id", "raw"), "raw", sc, parsedCol = None)
      .select("id", "violations").as[(Long, String)].collect().toMap
    assert(got(1L) == "")
    assert(got(2L) == "minprops:$.cfg")
    assert(got(3L) == "maxprops:$.cfg")
    assert(got(4L) == "type:$.cfg")
    assert(got(5L) == "minprops:$")
    assert(got(6L) == "maxprops:$.rows[]")
    val bad = intercept[IllegalArgumentException] {
      JsonSchemaGate.validate(Seq((1L, "{}")).toDF("id", "raw"), "raw",
        """{"type": "object", "minProperties": 1.5}""", parsedCol = None)
    }
    assert(bad.getMessage.contains("minProperties"))
  }

  test("contains/minContains/maxContains (r15): count-quantified element " +
       "satisfaction at paths, an array root, and element depth; both " +
       "count bounds; vacuous typed-guard passes; loud aborts") {
    val sc =
      """{"type": "object",
        | "properties": {
        |  "tags": {"type": "array",
        |           "contains": {"type": "string", "pattern": "^b"},
        |           "minContains": 1, "maxContains": 2},
        |  "rows": {"type": "array",
        |           "contains": {"required": ["sku"]}},
        |  "grid": {"type": "array",
        |           "items": {"type": "array",
        |                     "contains": {"type": "integer",
        |                                  "minimum": 1, "maximum": 5}}}}}"""
        .stripMargin
    val got = JsonSchemaGate.validate(Seq(
        (1L, """{"tags": ["bx", "a"], "rows": [{"sku": 1}], "grid": [[2]]}"""),
        (2L, """{"tags": ["a", "c"]}"""),              // zero matches: min
        (3L, """{"tags": ["b1", "b2", "b3"]}"""),      // three: over max
        (4L, """{"tags": 5}"""),                       // non-array: type's business
        (5L, """{"rows": [{"qty": 1}, {"x": 2}]}"""),  // no sku-bearing element
        (6L, """{"grid": [[2, 9], [0, "x"]]}"""),      // 2nd inner: none in [1,5]
        (7L, """{"tags": []}"""))                      // empty array: min fires
      .toDF("id", "raw"), "raw", sc, parsedCol = None)
      .select("id", "violations").as[(Long, String)].collect().toMap
    assert(got(1L) == "")
    assert(got(2L) == "contains:$.tags")
    assert(got(3L) == "contains:$.tags")
    assert(got(4L) == "type:$.tags")
    assert(got(5L) == "contains:$.rows")
    assert(got(6L) == "contains:$.grid[]")
    assert(got(7L) == "contains:$.tags")
    // an ARRAY root takes the check at `$` (const = one-member typed enum)
    val rootGot = JsonSchemaGate.validate(Seq(
        (1L, """["x", "ok"]"""), (2L, """["x"]"""))
      .toDF("id", "raw"), "raw",
      """{"type": "array", "contains": {"const": "ok"}}""",
      parsedCol = None)
      .select("id", "violations").as[(Long, String)].collect().toMap
    assert(rootGot(1L) == "" && rootGot(2L) == "contains:$")
    // a bare `minimum` subschema vacuously ADMITS strings (the typed
    // guard is JSON Schema's own applicability rule), so every element
    // satisfies and minContains=1 holds on a non-empty array
    val vac = JsonSchemaGate.validate(
      Seq((1L, """{"a": ["s"]}""")).toDF("id", "raw"), "raw",
      """{"type": "object", "properties":
        | {"a": {"type": "array", "contains": {"minimum": 99}}}}"""
        .stripMargin, parsedCol = None)
      .select("violations").as[String].head()
    assert(vac == "")
    def bad(sc2: String) = intercept[IllegalArgumentException] {
      JsonSchemaGate.validate(Seq((1L, "{}")).toDF("id", "raw"), "raw",
        sc2, parsedCol = None)
    }
    assert(bad("""{"type": "array", "minContains": 2}""")
      .getMessage.contains("minContains"))
    assert(bad("""{"type": "array", "contains": {"type": "string"},
                 | "minContains": 3, "maxContains": 2}""".stripMargin)
      .getMessage.contains("unsatisfiable"))
    assert(bad("""{"type": "array", "contains":
                 | {"contains": {"type": "string"}}}""".stripMargin)
      .getMessage.contains("nested"))
  }

  test("propertyNames (r15): the pattern form checks the KEYS themselves " +
       "at paths, the root, and element depth; non-pattern forms abort") {
    val sc =
      """{"type": "object",
        | "propertyNames": {"pattern": "^[a-z]+$"},
        | "properties": {
        |  "cfg":  {"type": "object",
        |           "propertyNames": {"pattern": "^k[0-9]$"}},
        |  "rows": {"type": "array",
        |           "items": {"type": "object",
        |                     "propertyNames": {"pattern": "^[ab]$"}}}}}"""
        .stripMargin
    val got = JsonSchemaGate.validate(Seq(
        (1L, """{"cfg": {"k1": 1, "k2": 2}, "rows": [{"a": 1}]}"""),
        (2L, """{"cfg": {"k1": 1, "key": 2}}"""),     // nested bad key
        (3L, """{"Bad": 1}"""),                       // root bad key
        (4L, """{"cfg": 5}"""),                       // non-object: type's business
        (5L, """{"rows": [{"a": 1}, {"zz": 2}]}"""))  // element bad key
      .toDF("id", "raw"), "raw", sc, parsedCol = None)
      .select("id", "violations").as[(Long, String)].collect().toMap
    assert(got(1L) == "")
    assert(got(2L) == "propname:$.cfg")
    assert(got(3L) == "propname:$")
    assert(got(4L) == "type:$.cfg")
    assert(got(5L) == "propname:$.rows[]")
    val e1 = intercept[IllegalArgumentException] {
      JsonSchemaGate.validate(Seq((1L, "{}")).toDF("id", "raw"), "raw",
        """{"type": "object", "propertyNames": {"type": "string"}}""",
        parsedCol = None)
    }
    assert(e1.getMessage.contains("pattern form"))
    // the shared-dialect regex guard applies to key patterns too
    val e2 = intercept[IllegalArgumentException] {
      JsonSchemaGate.validate(Seq((1L, "{}")).toDF("id", "raw"), "raw",
        """{"type": "object", "propertyNames": {"pattern": "(?=x)"}}""",
        parsedCol = None)
    }
    assert(e2.getMessage.contains("lookaround"))
  }

  test("if/then/else (r16): satisfaction of the if-subschema gates the " +
       "then checks, its negation the else checks, at paths, the root, " +
       "and element depth; absent nodes validate nothing; partial " +
       "declarations abort") {
    val sc =
      """{"type": "object",
        | "if": {"required": ["kind"]},
        | "then": {"required": ["payload"]},
        | "else": {"required": ["name"]},
        | "properties": {
        |  "prio": {"type": ["integer", "null"],
        |           "if": {"type": "integer"},
        |           "then": {"maximum": 5},
        |           "else": {"type": "null"}},
        |  "rows": {"type": "array",
        |           "items": {"type": "object",
        |                     "if": {"required": ["qty"]},
        |                     "then": {"required": ["dims"]}}}}}"""
        .stripMargin
    val got = JsonSchemaGate.validate(Seq(
        (1L, """{"kind": "a", "payload": 1}"""),       // if sat, then sat
        (2L, """{"kind": "a"}"""),                     // if sat, then violated
        (3L, """{"name": "n"}"""),                     // if unsat, else sat
        (4L, """{"x": 1}"""),                          // if unsat, else violated
        (5L, """{"kind": "a", "payload": 1, "prio": 4}"""),   // then branch sat
        (6L, """{"kind": "a", "payload": 1, "prio": 9}"""),   // then: max 5
        (7L, """{"kind": "a", "payload": 1, "prio": null}"""),// else: null ok
        (8L, """{"kind": "a", "payload": 1, "prio": "hi"}"""),// else violated (and type:)
        (9L, """{"kind": "a", "payload": 1, "rows": [{"qty": 1, "dims": [1]}, {"sku": 2}]}"""),
        (10L, """{"kind": "a", "payload": 1, "rows": [{"qty": 1}]}"""))
      .toDF("id", "raw"), "raw", sc, parsedCol = None)
      .select("id", "violations").as[(Long, String)].collect().toMap
    assert(got(1L) == "" && got(5L) == "" && got(7L) == "" && got(9L) == "")
    assert(got(2L) == "then:$")
    assert(got(3L) == "")
    assert(got(4L) == "else:$")
    assert(got(6L) == "then:$.prio")
    // "hi" fails the declared union type AND the else branch's null type
    assert(got(8L) == "type:$.prio,else:$.prio")
    assert(got(10L) == "then:$.rows[]")
    // then/else without if (spec-ignored) and if without a branch abort
    def bad(sc2: String) = intercept[IllegalArgumentException] {
      JsonSchemaGate.validate(Seq((1L, "{}")).toDF("id", "raw"), "raw",
        sc2, parsedCol = None)
    }
    assert(bad("""{"type": "object", "then": {"required": ["a"]}}""")
      .getMessage.contains("then/else without if"))
    assert(bad("""{"type": "object", "if": {"required": ["a"]}}""")
      .getMessage.contains("if without then or else"))
  }

  test("discriminated oneOf (r16): the member is selected by the runtime " +
       "type tag — off-union types fire the synthesized type check, " +
       "member-constraint failures fire oneof:; overlapping or type-free " +
       "members take the DYNAMIC form (their own test)") {
    val sc =
      """{"type": "object",
        | "properties": {
        |  "ref": {"oneOf": [
        |    {"type": "integer", "minimum": 0},
        |    {"type": "string", "minLength": 2},
        |    {"type": "object", "required": ["id"]}]}}}""".stripMargin
    val got = JsonSchemaGate.validate(Seq(
        (1L, """{"ref": 7}"""),
        (2L, """{"ref": "ab"}"""),
        (3L, """{"ref": {"id": 1}}"""),
        (4L, """{"ref": -1}"""),        // integer member's minimum
        (5L, """{"ref": "x"}"""),       // string member's minLength
        (6L, """{"ref": {"x": 1}}"""),  // object member's required
        (7L, """{"ref": true}"""),      // matches NO member: union type check
        (8L, """{"x": 1}"""))           // absent: nothing fires
      .toDF("id", "raw"), "raw", sc, parsedCol = None)
      .select("id", "violations").as[(Long, String)].collect().toMap
    assert(got(1L) == "" && got(2L) == "" && got(3L) == "" && got(8L) == "")
    assert(got(4L) == "oneof:$.ref")
    assert(got(5L) == "oneof:$.ref")
    assert(got(6L) == "oneof:$.ref")
    assert(got(7L) == "type:$.ref")
    def bad(sc2: String) = intercept[IllegalArgumentException] {
      JsonSchemaGate.validate(Seq((1L, "{}")).toDF("id", "raw"), "raw",
        sc2, parsedCol = None)
    }
    // discriminated members + a sibling type stay ambiguous (the union
    // type is synthesized from the members) — overlapping/type-free
    // members are the DYNAMIC form and may carry a sibling type
    assert(bad("""{"type": "object", "properties": {"a":
                 | {"type": "integer", "oneOf": [{"type": "integer"},
                 |  {"type": "string"}]}}}""".stripMargin)
      .getMessage.contains("BOTH type and oneOf"))
  }

  test("dynamic oneOf (r16): overlapping or type-free members count " +
       "member SATISFACTION at runtime — exactly-one passes, zero or " +
       "two+ fire oneof:, the typed-guard vacuous pass is live, and a " +
       "sibling type coexists") {
    val sc =
      """{"type": "object",
        | "properties": {
        |  "n": {"oneOf": [
        |    {"type": "integer", "minimum": 5},
        |    {"type": "integer", "maximum": 10}]},
        |  "v": {"type": ["integer", "string"],
        |        "oneOf": [{"minimum": 3}, {"type": "string"}]}}}"""
        .stripMargin
    val got = JsonSchemaGate.validate(Seq(
        (1L, """{"n": 3}"""),          // only member 2 → pass
        (2L, """{"n": 20}"""),         // only member 1 → pass
        (3L, """{"n": 7}"""),          // BOTH members → oneof
        (4L, """{"n": "x"}"""),        // NO member (both type-guarded) → oneof
        (5L, """{"v": 5}"""),          // member 1 only → pass
        (6L, """{"v": 1}"""),          // 1 < 3 and not a string → oneof
        (7L, """{"v": "ab"}"""),       // string: member 1 VACUOUSLY satisfied
                                       // too (bounds skip strings) → count 2
        (8L, """{"v": true}"""),       // sibling type check fires; oneOf:
                                       // bool vacuously satisfies member 1
        (9L, """{"x": 1}"""))          // absent: nothing fires
      .toDF("id", "raw"), "raw", sc, parsedCol = None)
      .select("id", "violations").as[(Long, String)].collect().toMap
    assert(got(1L) == "" && got(2L) == "" && got(5L) == "" && got(9L) == "")
    assert(got(3L) == "oneof:$.n")
    assert(got(4L) == "oneof:$.n")
    assert(got(6L) == "oneof:$.v")
    assert(got(7L) == "oneof:$.v")
    assert(got(8L) == "type:$.v")
  }

  test("anyOf (r16): at-least-one member satisfied — vacuous passes " +
       "count as satisfaction (the spec's rule), all-fail fires anyof:, " +
       "element depth works, $ref members inline") {
    val sc =
      """{"type": "object",
        | "$defs": {"short": {"type": "string", "maxLength": 3}},
        | "properties": {
        |  "m": {"anyOf": [{"$ref": "#/$defs/short"},
        |                  {"type": "integer", "multipleOf": 2}]},
        |  "w": {"anyOf": [{"minimum": 10}, {"type": "boolean"}]},
        |  "arr": {"type": "array",
        |          "items": {"anyOf": [{"type": "integer", "minimum": 0},
        |                              {"type": "string"}]}}}}""".stripMargin
    val got = JsonSchemaGate.validate(Seq(
        (1L, """{"m": "ab"}"""),       // member 1 → pass
        (2L, """{"m": 4}"""),          // member 2 → pass
        (3L, """{"m": "abcd"}"""),     // maxLength AND type both fail → anyof
        (4L, """{"m": 7}"""),          // 7 % 2 ≠ 0, not a string → anyof
        (5L, """{"w": "zz"}"""),       // string VACUOUSLY satisfies member 1
        (6L, """{"w": 3}"""),          // 3 < 10 and not boolean → anyof
        (7L, """{"arr": [1, "a", 2]}"""),
        (8L, """{"arr": [1, -2]}"""),  // -2 fails both members → element anyof
        (9L, """{"x": 1}"""))          // absent: nothing fires
      .toDF("id", "raw"), "raw", sc, parsedCol = None)
      .select("id", "violations").as[(Long, String)].collect().toMap
    assert(got(1L) == "" && got(2L) == "" && got(5L) == "" &&
      got(7L) == "" && got(9L) == "")
    assert(got(3L) == "anyof:$.m")
    assert(got(4L) == "anyof:$.m")
    assert(got(6L) == "anyof:$.w")
    assert(got(8L) == "anyof:$.arr[]")
  }

  test("not (r16): satisfaction of the subschema IS the violation — " +
       "incl. the vacuous-pass rule (not: {minimum} rejects strings), " +
       "at the root, at paths, and at element depth") {
    val sc =
      """{"type": "object",
        | "not": {"required": ["legacy"]},
        | "properties": {
        |  "p": {"not": {"type": "integer", "multipleOf": 3}},
        |  "q": {"not": {"minimum": 5}},
        |  "arr": {"type": "array", "items": {"not": {"const": "bad"}}}}}"""
        .stripMargin
    val got = JsonSchemaGate.validate(Seq(
        (1L, """{"p": 2, "q": 4}"""),
        (2L, """{"p": 9}"""),           // satisfies int+multipleOf 3 → not
        (3L, """{"p": "x"}"""),         // type term fires → NOT satisfied → pass
        (4L, """{"q": 7}"""),           // 7 >= 5 satisfies → not
        (5L, """{"q": "s"}"""),         // string VACUOUSLY satisfies minimum → not
        (6L, """{"legacy": 1, "p": 2}"""),  // root not: carries legacy
        (7L, """{"arr": ["ok", "bad"]}"""), // element not
        (8L, """{"arr": [1, "good"]}"""))
      .toDF("id", "raw"), "raw", sc, parsedCol = None)
      .select("id", "violations").as[(Long, String)].collect().toMap
    assert(got(1L) == "" && got(3L) == "" && got(8L) == "")
    assert(got(2L) == "not:$.p")
    assert(got(4L) == "not:$.q")
    assert(got(5L) == "not:$.q")
    assert(got(6L).contains("not:$"))
    assert(got(7L) == "not:$.arr[]")
    // PINNED subset divergence (documented at the `not` compile site):
    // the subset's typed enum/const skip non-scalar values, so under
    // negation a JSON null SATISFIES {const: "bad"} and `not` fires —
    // a full 2020-12 validator would pass (null fails const, not
    // succeeds). Both engines and the independent reference agree on
    // the subset rule; declaring the member's type restores full-spec
    // behavior, also pinned here.
    val divergence = JsonSchemaGate.validate(Seq(
        (1L, """{"u": null}"""),
        (2L, """{"t": null}"""))
      .toDF("id", "raw"), "raw",
      """{"type": "object", "properties": {
        |  "u": {"not": {"const": "bad"}},
        |  "t": {"not": {"type": "string", "const": "bad"}}}}""".stripMargin,
      parsedCol = None)
      .select("id", "violations").as[(Long, String)].collect().toMap
    assert(divergence(1L) == "not:$.u") // subset semantics, not 2020-12
    assert(divergence(2L) == "")        // typed member: full-spec result
  }

  test("dependentSchemas (r16): key presence (incl. JSON null) requires " +
       "the object to satisfy the paired subschema — at the root, " +
       "nested, and element depth; non-identifier keys abort") {
    val sc =
      """{"type": "object",
        | "dependentSchemas": {
        |   "credit": {"required": ["billing"],
        |              "properties": {"limit": {"minimum": 100}}}},
        | "properties": {
        |  "credit": {"type": "boolean"},
        |  "billing": {"type": "string"},
        |  "limit": {"type": "number"},
        |  "cfg": {"type": "object",
        |          "dependentSchemas": {"b": {"required": ["c"]}}},
        |  "arr": {"type": "array",
        |          "items": {"dependentSchemas": {"k": {"required": ["v"]}}}}}}"""
        .stripMargin
    val got = JsonSchemaGate.validate(Seq(
        (1L, """{"credit": true, "billing": "b", "limit": 200}"""),
        (2L, """{"billing": "b"}"""),            // no credit: nothing fires
        (3L, """{"credit": true, "limit": 200}"""),  // billing missing
        (4L, """{"credit": null, "billing": "b", "limit": 50}"""), // JSON null
                                                 // IS present; limit < 100
        (5L, """{"cfg": {"b": 1}}"""),           // nested: c missing
        (6L, """{"cfg": {"b": 1, "c": 2}}"""),
        (7L, """{"arr": [{"k": 1}, {"k": 1, "v": 2}]}"""), // element depth
        (8L, """{"arr": [{"v": 2}]}"""))
      .toDF("id", "raw"), "raw", sc, parsedCol = None)
      .select("id", "violations").as[(Long, String)].collect().toMap
    assert(got(1L) == "" && got(2L) == "" && got(6L) == "" && got(8L) == "")
    assert(got(3L) == "depschema:$.credit")
    // null credit IS present (fires depschema) and also fails the
    // declared boolean type — root checks emit before property checks
    assert(got(4L) == "depschema:$.credit,type:$.credit")
    assert(got(5L) == "depschema:$.cfg.b")
    assert(got(7L) == "depschema:$.arr[].k")
    val bad = intercept[IllegalArgumentException] {
      JsonSchemaGate.validate(Seq((1L, "{}")).toDF("id", "raw"), "raw",
        """{"type": "object", "dependentSchemas":
          | {"a.b": {"required": ["c"]}}}""".stripMargin, parsedCol = None)
    }
    assert(bad.getMessage.contains("non-identifier dependentSchemas"))
  }

  test("patternProperties (r16): selector-matched keys validate their " +
       "values per inner term; declared properties still re-validate " +
       "when matched; sibling additionalProperties admits matched keys; " +
       "element depth works; the schema stays a loud abort nowhere") {
    val sc =
      """{"type": "object", "additionalProperties": false,
        | "patternProperties": {"^x_": {"type": "integer", "minimum": 0}},
        | "properties": {
        |  "name": {"type": "string"},
        |  "cfg":  {"type": "object",
        |           "patternProperties": {"^opt": {"enum": ["on", "off"]}}},
        |  "rows": {"type": "array",
        |           "items": {"type": "object",
        |                     "patternProperties": {"^w": {"type": "number"}}}}}}"""
        .stripMargin
    val got = JsonSchemaGate.validate(Seq(
        (1L, """{"name": "a", "x_n": 3, "cfg": {"optA": "on"}, "rows": [{"w1": 1.5}]}"""),
        (2L, """{"x_n": "s"}"""),               // selected value off-type
        (3L, """{"x_n": -2}"""),                // selected value under minimum
        (4L, """{"zz": 1}"""),                  // unmatched key: extra (closed)
        (5L, """{"cfg": {"optB": "maybe"}}"""), // nested selector enum
        (6L, """{"rows": [{"w1": "heavy"}]}"""),// element-depth selector
        (7L, """{"cfg": {"other": 5}}"""))      // unmatched nested key: open cfg
      .toDF("id", "raw"), "raw", sc, parsedCol = None)
      .select("id", "violations").as[(Long, String)].collect().toMap
    assert(got(1L) == "" && got(7L) == "")
    assert(got(2L) == "pprop:$.type")
    assert(got(3L) == "pprop:$.min")
    assert(got(4L) == "extra:$")
    assert(got(5L) == "pprop:$.cfg.enum")
    assert(got(6L) == "pprop:$.rows[].type")
    // a declared property that ALSO matches a selector validates against
    // both (JSON Schema: properties and patternProperties both apply)
    val both = JsonSchemaGate.validate(
      Seq((1L, """{"wide": "s"}""")).toDF("id", "raw"), "raw",
      """{"type": "object",
        | "patternProperties": {"^w": {"type": "number"}},
        | "properties": {"wide": {"type": "string"}}}""".stripMargin,
      parsedCol = None).select("violations").as[String].head()
    assert(both == "pprop:$.type")
    val e = intercept[IllegalArgumentException] {
      JsonSchemaGate.validate(Seq((1L, "{}")).toDF("id", "raw"), "raw",
        """{"type": "object", "patternProperties": {"(?=x)": {}}}""",
        parsedCol = None)
    }
    assert(e.getMessage.contains("lookaround"))
  }

  test("keyword argument nodes are TYPE-CHECKED at compile (r14): a " +
       "draft-4 boolean exclusiveMinimum, a fractional minLength, or a " +
       "numeric pattern abort instead of silently coercing") {
    def gate(sc: String) = JsonSchemaGate.validate(
      Seq((1L, "{}")).toDF("id", "raw"), "raw", sc, parsedCol = None)
    def aborts(sc: String, msg: String): Unit = {
      val e = intercept[IllegalArgumentException] { gate(sc) }
      assert(e.getMessage.contains(msg), s"got: ${e.getMessage}")
    }
    // draft-4 boolean form would have compiled to the numeric bound 1.0
    aborts("""{"type": "object", "properties":
             | {"n": {"type": "number", "minimum": 1,
             |        "exclusiveMinimum": true}}}""".stripMargin,
      "exclusiveMinimum must be a JSON number")
    aborts("""{"type": "object", "properties":
             | {"s": {"type": "string", "minLength": 2.7}}}""".stripMargin,
      "minLength must be a JSON non-negative integer")
    aborts("""{"type": "object", "properties":
             | {"s": {"type": "string", "maxLength": -1}}}""".stripMargin,
      "maxLength must be non-negative")
    aborts("""{"type": "object", "properties":
             | {"s": {"type": "string", "pattern": 5}}}""".stripMargin,
      "pattern must be a JSON string")
    aborts("""{"type": "object", "properties":
             | {"n": {"type": "number", "maximum": "10"}}}""".stripMargin,
      "maximum must be a JSON number")
    aborts("""{"type": "object", "properties":
             | {"s": {"enum": "abc"}}}""".stripMargin,
      "enum must be a JSON array")
    aborts("""{"type": "object", "required": "user"}""",
      "required must be a JSON array")
  }

  test("regex dialect guard (r14): \\Z and possessive quantifiers abort; " +
       "unescaped $ anchors END OF TEXT (the RE2 semantics both engines " +
       "then share), so a trailing newline fails the match") {
    def gate(sc: String, raws: (Long, String)*) = JsonSchemaGate.validate(
      raws.toSeq.toDF("id", "raw"), "raw", sc, parsedCol = None)
      .select("id", "violations").as[(Long, String)].collect().toMap
    def patSchema(p: String) =
      s"""{"type": "object", "properties":
         | {"s": {"type": "string", "pattern": "$p"}}}""".stripMargin
    val z = intercept[IllegalArgumentException] {
      gate(patSchema("""a\\Z"""), 1L -> "{}")
    }
    assert(z.getMessage.contains("\\Z"))
    val poss = intercept[IllegalArgumentException] {
      gate(patSchema("a*+b"), 1L -> "{}")
    }
    assert(poss.getMessage.contains("possessive"))
    // Java's default $ would accept "u1\n" (it matches before a final
    // line terminator); the gate normalizes $ to end-of-text, agreeing
    // with DuckDB's RE2 — and [$] stays a literal dollar
    val got = gate(patSchema("^u[0-9]+$"),
      1L -> """{"s": "u1"}""",
      2L -> """{"s": "u1\n"}""", // JSON \n escape: the value ends in a newline
      3L -> """{"s": "u1x"}""")
    assert(got(1L) == "")
    assert(got(2L) == "pattern:$.s")
    assert(got(3L) == "pattern:$.s")
    val lit = gate(patSchema("""^[$]ok"""),
      1L -> """{"s": "$ok"}""", 2L -> """{"s": "ok"}""")
    assert(lit(1L) == "" && lit(2L) == "pattern:$.s")
    // reluctant quantifiers stay in subset (shared by both dialects)
    val rel = gate(patSchema("^a+?b"), 1L -> """{"s": "aab"}""")
    assert(rel(1L) == "")
  }

  test("the gate's projection chain stays WHOLE-STAGE-CODEGEN fused with " +
       "per-element items checks present (the FUSION.md r6 rule) — " +
       "including the r14 kinds (extra-key, unique, union types) and " +
       "the r15 kinds (contains, propertyNames)") {
    val sc =
      """{"type": "object", "additionalProperties": false,
        | "propertyNames": {"pattern": "^[a-z]+$"},
        | "properties": {
        |  "user": {"type": ["object", "null"],
        |           "additionalProperties": false,
        |           "properties": {"id": {"type": "integer"}}},
        |  "tags": {"type": "array", "uniqueItems": true,
        |           "contains": {"type": "string", "pattern": "^a"},
        |           "items": {"type": ["string", "null"], "minLength": 1,
        |                     "enum": ["ab", "cd"]}}}}""".stripMargin
    val v = JsonSchemaGate.validate(
      Seq((1L, """{"tags": ["ab"], "user": {"id": 1}}"""))
        .toDF("id", "raw"), "raw", sc,
      parsedCol = None)
    v.collect()
    val plan = v.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    // every Project node must be inside whole-stage codegen ("* Project"):
    // a HOF spelling of the items checks is CodegenFallback and de-fuses
    // the WHOLE chain (parse + every path check), which is why they run
    // as the native VariantItemsViolates loop instead
    val unfused = plan.linesIterator
      .filter(l => l.contains("Project (") && !l.contains("* Project"))
      .toSeq
    assert(unfused.isEmpty,
      s"projection dropped out of whole-stage codegen:\n${unfused.mkString("\n")}")
  }

  test("input columns colliding with internal working names survive intact") {
    val sc = """{"type": "object",
               | "properties": {"k": {"type": "integer"}}}""".stripMargin
    // __jsv and __jst0 are the gate's own first picks — a real input
    // column with those names must pass through untouched
    val df = Seq((1L, """{"k": 1}""", "keepme", 42L))
      .toDF("id", "raw", "__jsv", "__jst0")
    val v = JsonSchemaGate.validate(df, "raw", sc, parsedCol = None)
    assert(v.columns.count(_ == "__jsv") == 1 &&
      v.columns.count(_ == "__jst0") == 1)
    assert(v.select("__jsv", "__jst0", "is_valid")
      .as[(String, Long, Boolean)].head() == (("keepme", 42L, true)))
  }

  test("non-identifier property names abort (path injection guard)") {
    val bad = """{"type": "object", "properties": {"a'] || x": {"type": "string"}}}"""
    val e = intercept[IllegalArgumentException] {
      JsonSchemaGate.validate(Seq((1L, "{}")).toDF("id", "raw"), "raw", bad)
    }
    assert(e.getMessage.contains("non-identifier"))
  }

  test("config pipeline json_schema op: annotate, filter, enforce") {
    val base = java.nio.file.Files.createTempDirectory("jsgate").toString
    Seq((1L, """{"k": 1}"""), (2L, """{"nope": 1}"""), (3L, "junk"))
      .toDF("event_id", "raw").write.parquet(s"$base/msgs")
    def conf(modeKnobs: String) =
      s"""{"stages": [
         | {"name": "src", "op": "parquet", "path": "$base/msgs"},
         | {"name": "gate", "op": "json_schema", "from": "src",
         |  "json": "raw", $modeKnobs
         |  "schema": {"type": "object", "required": ["k"],
         |             "properties": {"k": {"type": "integer"}}}}
         |]}""".stripMargin
    def run(modeKnobs: String) = graft.pipeline.ConfigPipeline
      .fromJson(spark, conf(modeKnobs)).output("gate")
    val annotated = run("") // default mode: annotate
    assert(annotated.count() == 3 &&
      annotated.columns.contains("violations") &&
      annotated.columns.contains("parsed"))
    assert(run("\"mode\": \"filter\",")
      .select("event_id").as[Long].collect().toSet == Set(1L))
    val e = intercept[IllegalArgumentException] {
      run("\"mode\": \"enforce\", \"maxErrors\": 1,").collect()
    }
    assert(e.getMessage.contains("error budget"))
  }
}
