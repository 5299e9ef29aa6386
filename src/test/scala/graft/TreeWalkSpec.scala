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

  test("walk: GoDown then GoUp anchors output at the ancestor instance") {
    // down to the item level, up to the payload (which holds note)
    val got = TreeWalk.walk(nestedDf,
      Seq(TreeWalk.GoDown(TreeWalk.HasKey("qty"), "item"),
          TreeWalk.GoUp(TreeWalk.HasKey("note"), "pay")),
      Seq("item.sku" -> "sku", "pay.note" -> "note"), keep = Seq("id"))
    assert(got.as[(Long, String, String)].collect().toSet ==
      Set((1L, "a1", "n1"), (1L, "a2", "n1"), (2L, "b1", "n2")))
  }

  test("walk: compound conditions and value predicates") {
    // And + HasAncestorKey resolve at plan time; where filters rows
    val got = TreeWalk.walk(nestedDf,
      Seq(TreeWalk.GoDown(TreeWalk.And(TreeWalk.HasKey("qty"),
          TreeWalk.HasAncestorKey("note")), "item")),
      Seq("item.sku" -> "sku", "item.qty" -> "qty"), keep = Seq("id"),
      where = Seq("item.qty" -> (_ >= lit(2))))
    assert(got.as[(Long, String, Int)].collect().toSet ==
      Set((1L, "a1", 2), (1L, "a2", 5)))
    // HasDescendantKey lands on the first enclosing struct, not the leaf
    val pay = TreeWalk.walk(nestedDf,
      Seq(TreeWalk.GoDown(TreeWalk.HasDescendantKey("qty"), "pay")),
      Seq("pay.note" -> "note"), keep = Seq("id"))
    assert(pay.as[(Long, String)].collect().toSet == Set((1L, "n1"), (2L, "n2")))
    // Not/Or compose: the only struct with neither owner nor note is the item
    val items = TreeWalk.walk(nestedDf,
      Seq(TreeWalk.GoDown(TreeWalk.Not(TreeWalk.Or(TreeWalk.HasKey("owner"),
          TreeWalk.HasKey("note"))), "x")),
      Seq("x.sku" -> "sku"), keep = Seq("id"))
    assert(items.as[(Long, String)].collect().toSet ==
      Set((1L, "a1"), (1L, "a2"), (2L, "b1")))
    // a condition no node meets fails loudly at plan time
    intercept[RuntimeException] {
      TreeWalk.walk(nestedDf,
        Seq(TreeWalk.GoDown(TreeWalk.And(TreeWalk.HasKey("owner"),
            TreeWalk.HasKey("qty")), "x")),
        Seq("x.sku" -> "sku"))
    }
  }

  test("walk reuses explodes on a down-up-down chain (no self cross product)") {
    import spark.implicits._
    val doc = Seq((1L, Seq((10L, "a"), (20L, "b"), (30L, "c"))))
      .toDF("root_id", "items")
      .select(col("root_id"),
        struct(col("items").cast("array<struct<sku:bigint,note:string>>")
          .as("items")).as("payload"))
    val out = TreeWalk.walk(doc,
      Seq(TreeWalk.GoDown(TreeWalk.HasKey("sku"), "a"),
          TreeWalk.GoUp(TreeWalk.HasDescendantKey("sku"), "p"),
          TreeWalk.GoDown(TreeWalk.HasKey("sku"), "b")),
      Seq("a.sku" -> "s1", "b.sku" -> "s2"), keep = Seq("root_id"))
      .as[(Long, Long, Long)].collect().toSet
    // one row per item, each paired with ITSELF — not |items|² pairs
    assert(out == Set((1L, 10L, 10L), (1L, 20L, 20L), (1L, 30L, 30L)))
  }
}
