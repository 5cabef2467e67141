package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite
import graft.flatten.JsonFlattener
import graft.flatten.JsonFlattener.Guards

/** Exercises every traversal branch of the reference walker
  * (json_flattener_v2.py:138-186): dict scalars as scoped inheritance,
  * list-of-dicts with nested scalar lists, sibling-scope isolation,
  * list-of-lists, guards, manifest. */
class FlattenerSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val doc =
    """{"org": "acme", "meta": {"v": 1},
       "items": [
         {"sku": "a", "qty": 2, "tags": ["x", "y"], "dims": {"w": 3}},
         {"sku": "b", "qty": 5, "tags": []}
       ],
       "codes": [[1, 2], [3]]}"""

  private val schema = StructType.fromDDL(
    "org STRING, meta STRUCT<v: INT>, " +
    "items ARRAY<STRUCT<sku: STRING, qty: INT, tags: ARRAY<STRING>, dims: STRUCT<w: INT>>>, " +
    "codes ARRAY<ARRAY<INT>>")

  private lazy val tables: Map[String, org.apache.spark.sql.DataFrame] = {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    JsonFlattener.flatten(Seq(doc).toDF("doc"), "doc", schema)
  }

  test("plan discovers one table per array path") {
    val names = JsonFlattener.plan(schema).map(_.name).sorted
    assert(names == Seq("codes", "items", "items_tags"))
  }

  test("items table: root scalars inherited, element scalars prefixed, meta scoped out") {
    val items = tables("items").orderBy("_elem_index").collect()
    assert(items.length == 2)
    val cols = tables("items").columns.toSet
    assert(cols.contains("org") && cols.contains("items_sku") && cols.contains("items_qty"))
    // meta.v belongs to the meta sibling scope, not to items (no leakage)
    assert(!cols.contains("meta_v"))
    assert(items(0).getAs[String]("items_sku") == "a")
    assert(items(1).getAs[String]("items_sku") == "b")
    assert(items(0).getAs[String]("org") == "acme")
    assert(items(0).getAs[String]("_path") == "/items/0")
  }

  test("nested scalar list: parent element scalars inherited, single value column") {
    val tags = tables("items_tags").orderBy("_path").collect()
    assert(tags.length == 2) // x, y — second item's tags are empty
    assert(tags.map(_.getAs[String]("items_tags")).toSeq == Seq("x", "y"))
    assert(tags.forall(_.getAs[String]("items_sku") == "a"))
    assert(tags.forall(_.getAs[Int]("items_qty") == 2))
    assert(tags(0).getAs[String]("_path") == "/items/0/tags/0")
  }

  test("parent linkage: child _parent_id equals parent row's _row_id") {
    val items = tables("items").select("_row_id", "_path").collect()
      .map(r => r.getAs[String]("_path") -> r.getAs[Long]("_row_id")).toMap
    val tags = tables("items_tags").select("_parent_id").collect()
    assert(tags.forall(_.getAs[Long]("_parent_id") == items("/items/0")))
  }

  test("list-of-lists flattens into one value table") {
    val codes = tables("codes").orderBy("_path").collect()
    assert(codes.map(_.getAs[Int]("codes")).toSeq == Seq(1, 2, 3))
    assert(codes.map(_.getAs[String]("_path")).toSeq ==
      Seq("/codes/0/0", "/codes/0/1", "/codes/1/0"))
    assert(codes.forall(_.getAs[String]("org") == "acme"))
  }

  test("guards: maxRows limits, maxCols keeps meta columns") {
    import spark.implicits._
    val g = JsonFlattener.flatten(Seq(doc).toDF("doc"), "doc", schema,
      guards = Guards(maxRows = Some(1), maxCols = Some(7)))
    assert(g("items").count() == 1)
    val cols = g("items").columns.toSeq
    JsonFlattener.metaCols.foreach(m => assert(cols.contains(m), s"missing meta $m"))
    assert(cols.length <= 7)
  }

  test("maxDepth prunes deep tables from the plan") {
    val shallow = JsonFlattener.plan(schema, Guards(maxDepth = Some(1)))
    assert(shallow.map(_.name).sorted == Seq("codes", "items"))
  }

  test("options: joiner renames table and column paths") {
    import spark.implicits._
    val t = JsonFlattener.flatten(Seq(doc).toDF("doc"), "doc", schema,
      options = JsonFlattener.Options(joiner = "."))
    assert(t.keySet == Set("codes", "items", "items.tags"))
    val cols = t("items").columns.toSet
    assert(cols.contains("items.sku") && cols.contains("items.qty"))
    assert(!cols.contains("items_sku"))
    // lineage columns keep their fixed names regardless of joiner
    assert(cols.contains("_path") && t("items").count() == 2)
  }

  test("options: numericToFloat casts own integral scalars, not inherited ones") {
    import spark.implicits._
    val d = """{"n": 7, "items": [{"sku": "a", "qty": 2}]}"""
    val sch = StructType.fromDDL(
      "n INT, items ARRAY<STRUCT<sku: STRING, qty: INT>>")
    val t = JsonFlattener.flatten(Seq(d).toDF("doc"), "doc", sch,
      options = JsonFlattener.Options(numericToFloat = true))("items")
    // element's own qty floats; inherited root n stays integral (the
    // reference applies _maybe_float at emission, never to inherited dicts)
    assert(t.schema("items_qty").dataType.typeName == "double")
    assert(t.schema("n").dataType.typeName == "integer")
    val row = t.head()
    assert(row.getAs[Double]("items_qty") == 2.0 && row.getAs[Int]("n") == 7)
  }

  test("options: emitEmptyParent=false drops struct elements with no own scalars") {
    import spark.implicits._
    val d = """{"items": [
      {"sku": "a", "tags": ["x"]},
      {"tags": ["y", "z"]},
      {"sku": "c"}]}"""
    val sch = StructType.fromDDL(
      "items ARRAY<STRUCT<sku: STRING, tags: ARRAY<STRING>>>")
    val dfIn = Seq(d).toDF("doc")
    // default (engine behavior): every element row emitted
    val all = JsonFlattener.flatten(dfIn, "doc", sch)("items")
    assert(all.count() == 3)
    // reference CLI default: the scalar-less element contributes no parent
    // row, but its CHILD rows (tags) still flow
    val opts = JsonFlattener.Options(emitEmptyParent = false)
    val t = JsonFlattener.flatten(dfIn, "doc", sch, options = opts)
    assert(t("items").count() == 2)
    assert(t("items").select("items_sku").collect().map(_.getString(0)).sorted
      .toSeq == Seq("a", "c"))
    assert(t("items_tags").count() == 3) // x, y, z — children unaffected
  }

  test("manifest reports sorted columns and types per table") {
    val m = JsonFlattener.manifest(tables)
    assert(m("items")._1.contains("items_sku"))
    assert(m("items")._2("items_qty") == "int")
    assert(m.keySet == Set("codes", "items", "items_tags"))
  }

  test("docId seeds pointers for multi-document inputs") {
    import spark.implicits._
    val two = Seq((7L, doc), (8L, doc)).toDF("id", "doc")
    val t = JsonFlattener.flatten(two, "doc", schema, docId = Some("id"))("items")
    val paths = t.select("_path").collect().map(_.getString(0)).sorted
    assert(paths.toSeq == Seq("/7/items/0", "/7/items/1", "/8/items/0", "/8/items/1"))
    // ids unique across docs
    assert(t.select("_row_id").distinct().count() == 4)
  }
}
