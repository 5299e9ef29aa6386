package graft.json

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MTL query-language front-end (reference `modelling/treehorn_yaccer.py`,
  * sample program `query_text.mtl`).
  *
  * Supported surface (matching the reference's grammar):
  * {{{
  * QUERY q IS SELECT a.x AS col1, fn(b.y) AS col2
  *   FROM obj START AT TOP
  *   GO DOWN UNTIL HAS KEY x AS a
  *   GO DOWN UNTIL HAS KEY y AS b;
  * IN QUERY q col1 IS A UNIQUE PROPERTY name OF ENTITY user;
  * IN QUERY q col2 IS A PROPERTY email OF ENTITY user NAMED BY col1;
  * IN QUERY q user NAMED BY col1 IS RELATED TO city NAMED BY c AS livesin;
  * }}}
  * Python `IS A PYTHON FUNCTION IMPORTED FROM ...` declarations are accepted
  * and ignored; function applications resolve against a caller-supplied
  * registry of `Column => Column` (the Spark-native equivalent).
  *
  * The parser is a small hand-rolled recursive-descent (no parser-generator
  * dependency); the executor compiles straight onto [[TreeWalk.extract]], so
  * an MTL query plans exactly like the programmatic API.
  */
object MtlParser {

  final case class Selection(fn: Option[String], label: String, key: String, alias: String)
  final case class Query(name: String, selections: Seq[Selection], from: String,
                         captures: Seq[TreeWalk.Capture])
  final case class Property(query: String, alias: String, unique: Boolean,
                            propName: String, entity: String, namedBy: Option[String])
  final case class Relation(query: String, srcEntity: String, srcAlias: String,
                            dstEntity: String, dstAlias: String, rel: String)
  final case class Program(queries: Map[String, Query], properties: Seq[Property],
                           relations: Seq[Relation])

  // ----------------------------------------------------------------- lexer
  private def tokenize(text: String): Vector[String] = {
    val noComments = text.linesIterator.map(l => l.takeWhile(_ != '#')).mkString("\n")
    val buf = Vector.newBuilder[String]
    var i = 0
    val s = noComments
    while (i < s.length) {
      val c = s(i)
      if (c.isWhitespace) i += 1
      else if (c == ';' || c == ',' || c == '(' || c == ')') { buf += c.toString; i += 1 }
      else {
        val j = s.indexWhere(ch => ch.isWhitespace || ";,()".contains(ch), i)
        val end = if (j < 0) s.length else j
        buf += s.substring(i, end)
        i = end
      }
    }
    buf.result()
  }

  // ---------------------------------------------------------------- parser
  def parse(text: String): Program = {
    val toks = tokenize(text)
    var pos = 0
    def peek: String = if (pos < toks.length) toks(pos) else ""
    def next(): String = { val t = peek; pos += 1; t }
    def expect(t: String): Unit = {
      val got = next()
      require(got.equalsIgnoreCase(t), s"expected '$t' but got '$got' at token $pos")
    }
    def labelKey(t: String): (String, String) = {
      val idx = t.indexOf('.')
      require(idx > 0, s"expected label.key, got '$t'")
      (t.substring(0, idx), t.substring(idx + 1))
    }

    val queries = Map.newBuilder[String, Query]
    val props = Seq.newBuilder[Property]
    val rels = Seq.newBuilder[Relation]

    def parseSelection(): Selection = {
      val t = next()
      if (peek == "(") { // fn ( label.key )
        expect("("); val (l, k) = labelKey(next()); expect(")")
        expect("AS"); Selection(Some(t), l, k, next())
      } else {
        val (l, k) = labelKey(t)
        expect("AS"); Selection(None, l, k, next())
      }
    }

    def parseQuery(): Unit = {
      val name = next(); expect("IS"); expect("SELECT")
      val sels = Seq.newBuilder[Selection]
      sels += parseSelection()
      while (peek == ",") { next(); sels += parseSelection() }
      expect("FROM"); val from = next()
      val caps = Seq.newBuilder[TreeWalk.Capture]
      while (!peek.equalsIgnoreCase(";") && peek.nonEmpty) {
        if (peek.equalsIgnoreCase("START")) { next(); expect("AT"); expect("TOP") }
        else {
          expect("GO"); expect("DOWN"); expect("UNTIL"); expect("HAS"); expect("KEY")
          val key = next(); expect("AS"); caps += TreeWalk.Capture(key, next())
        }
      }
      expect(";")
      queries += name -> Query(name, sels.result(), from, caps.result())
    }

    def parseInQuery(): Unit = {
      val qname = next()
      val subject = next()
      if (peek.equalsIgnoreCase("IS")) {
        next()
        if (peek.equalsIgnoreCase("A")) {
          next()
          val unique = peek.equalsIgnoreCase("UNIQUE")
          if (unique) next()
          expect("PROPERTY"); val propName = next()
          expect("OF"); expect("ENTITY"); val entity = next()
          val namedBy = if (peek.equalsIgnoreCase("NAMED")) {
            next(); expect("BY"); Some(next())
          } else None
          expect(";")
          props += Property(qname, subject, unique, propName, entity, namedBy)
        } else sys.error(s"unsupported assertion at '$peek'")
      } else if (peek.equalsIgnoreCase("NAMED")) {
        next(); expect("BY"); val srcAlias = next()
        expect("IS"); expect("RELATED"); expect("TO"); val dstEntity = next()
        expect("NAMED"); expect("BY"); val dstAlias = next()
        expect("AS"); val rel = next(); expect(";")
        rels += Relation(qname, subject, srcAlias, dstEntity, dstAlias, rel)
      } else sys.error(s"unsupported IN QUERY clause at '$peek'")
    }

    while (pos < toks.length) {
      val t = next()
      if (t.equalsIgnoreCase("QUERY")) parseQuery()
      else if (t.equalsIgnoreCase("IN")) { expect("QUERY"); parseInQuery() }
      else {
        // `foo IS A PYTHON FUNCTION IMPORTED FROM x.y.z;` — skip to ';'
        while (!next().equals(";") && pos < toks.length) {}
      }
    }
    Program(queries.result(), props.result(), rels.result())
  }

  // -------------------------------------------------------------- executor
  /** Run one named query of the program against a document DataFrame.
    * `functions` resolves MTL function applications (reference: imported
    * Python callables) to Column transforms; `identity` is built in.
    */
  def run(df: DataFrame, program: Program, queryName: String,
          functions: Map[String, Column => Column] = Map.empty): DataFrame = {
    val q = program.queries.getOrElse(queryName, sys.error(s"no query '$queryName'"))
    val fns = functions + ("identity" -> identity[Column] _)
    val base = TreeWalk.extract(df, q.captures,
      q.selections.map(s => s"${s.label}.${s.key}" -> s.alias))
    q.selections.filter(_.fn.isDefined).foldLeft(base) { (d, s) =>
      val f = fns.getOrElse(s.fn.get, sys.error(s"unknown MTL function '${s.fn.get}'"))
      d.withColumn(s.alias, f(col(s.alias)))
    }
  }

  /** Entity tables implied by the program's property assertions: one DF per
    * entity with its key property (UNIQUE / NAMED BY target) first,
    * deduplicated on it.
    */
  def entityTables(df: DataFrame, program: Program, queryName: String,
                   functions: Map[String, Column => Column] = Map.empty): Map[String, DataFrame] = {
    val rows = run(df, program, queryName, functions)
    val byEntity = program.properties.filter(_.query == queryName).groupBy(_.entity)
    byEntity.map { case (entity, ps) =>
      val keyAlias = ps.find(_.unique).map(_.alias)
        .orElse(ps.flatMap(_.namedBy).headOption)
        .getOrElse(ps.head.alias)
      val cols = ps.map(p => col(p.alias).as(p.propName))
      entity -> rows.select(cols: _*).dropDuplicates(
        ps.find(_.alias == keyAlias).map(_.propName).getOrElse(ps.head.propName))
    }
  }

  /** Edge tables from the program's relationship assertions:
    * (src_id, dst_id, rel), distinct.
    */
  def relationTables(df: DataFrame, program: Program, queryName: String,
                     functions: Map[String, Column => Column] = Map.empty): Seq[DataFrame] = {
    val rows = run(df, program, queryName, functions)
    program.relations.filter(_.query == queryName).map { r =>
      rows.select(col(r.srcAlias).as("src_id"), col(r.dstAlias).as("dst_id"))
        .withColumn("rel", lit(r.rel)).distinct()
    }
  }
}
