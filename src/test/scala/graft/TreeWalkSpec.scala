package graft

import org.apache.spark.sql.functions._

import graft.json.TreeWalk

class TreeWalkSpec extends SparkSpec {
  import spark.implicits._

  private def nestedDf = {
    // root: {id, meta: {owner}, payload: {items: [{sku, qty}], note}}
    Seq(
      (1L, "alice", Seq(("a1", 2), ("a2", 5)), "n1"),
      (2L, "bob", Seq(("b1", 1)), "n2"))
      .toDF("id", "owner", "raw_items", "note")
      .select(col("id"), struct(col("owner")).as("meta"),
        struct(
          transform(col("raw_items"),
            x => struct(x.getField("_1").as("sku"), x.getField("_2").as("qty"))).as("items"),
          col("note")).as("payload"))
  }

  test("pathsToKey resolves nested paths at plan time") {
    val paths = TreeWalk.pathsToKey(nestedDf.schema, "qty")
    assert(paths.map(_.map(s => (s.field, s.isArray))) ==
      Seq(Seq(("payload", false), ("items", true), ("qty", false))))
    assert(TreeWalk.pathsToKey(nestedDf.schema, "owner").head.map(_.field) ==
      Seq("meta", "owner"))
    assert(TreeWalk.pathsToKey(nestedDf.schema, "missing").isEmpty)
  }

  test("goDownUntilKey descends through structs and explodes arrays") {
    val got = TreeWalk.goDownUntilKey(nestedDf, "qty", "item", keep = Seq("id"))
      .as[(Long, Int)].collect().toSet
    assert(got == Set((1L, 2), (1L, 5), (2L, 1)))
    val owners = TreeWalk.goDownUntilKey(nestedDf, "owner", "o", keep = Seq("id"))
      .as[(Long, String)].collect().toSet
    assert(owners == Set((1L, "alice"), (2L, "bob")))
  }

  test("flattenAtKey surfaces every field of the struct containing the key") {
    val got = TreeWalk.flattenAtKey(nestedDf, "qty", "item", keep = Seq("id"))
    assert(got.columns.toSeq == Seq("id", "item_sku", "item_qty"))
    assert(got.as[(Long, String, Int)].collect().toSet ==
      Set((1L, "a1", 2), (1L, "a2", 5), (2L, "b1", 1)))
  }
}
