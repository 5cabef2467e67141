package graft.flatten

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Nested-JSON document -> relational child tables with lineage columns.
  *
  * Spark-first redesign of the reference's recursive row-walker
  * (scripts/json_flattener_v2.py:123-208): instead of a per-document Python
  * generator, the *schema* is walked once at plan time and each array path
  * ("tableName") becomes one DataFrame built from `from_json` + a chain of
  * `posexplode_outer` — fully distributed, codegen'd, no driver-side
  * recursion over data.
  *
  * Semantics preserved from the reference:
  *  - dict scalars become *scoped inheritance* for descendant rows, keys
  *    prefixed with the underscore-joined path (prefix_keys, :49-59)
  *  - list-of-dict elements contribute their scalar fields prefixed by the
  *    list path; nested lists/dicts recurse with inherited context (:162-183)
  *  - list-of-scalar elements produce rows with a single column named by the
  *    path (:158-161); list-of-lists recurse into the same table (:184-186)
  *  - lineage columns tableName, _path (JSON pointer), _elem_index, _depth
  *  - guards: max depth / rows / cols with meta-column preservation (:87-118)
  *
  * Declared divergence (SURVEY §3.3): `_row_id`/`_parent_id` are
  * deterministic xxhash64 values of the (document id, JSON pointer) pair
  * rather than a mutable emission counter — a global counter is
  * order-dependent and cannot exist in a distributed scan. Parent linkage
  * survives: a nested row's `_parent_id` equals the `_row_id` of its
  * enclosing list element's row in the parent table.
  */
object JsonFlattener {

  final case class Guards(
      maxDepth: Option[Int] = None,
      maxRows: Option[Int] = None,
      maxCols: Option[Int] = None)

  /** The reference CLI's traversal options (json_flattener_v2.py:123-133):
    *  - `joiner` separates path segments in table and column names;
    *  - `numericToFloat` mirrors --numeric-to-float: a row's OWN integral
    *    scalar values are cast to double (booleans preserved). Inherited
    *    ancestor scalars stay integral — the reference floats only the
    *    values it merges into the row at emission time (`_maybe_float` is
    *    applied to the element's scalars, never to the inherited dict);
    *  - `emitEmptyParent` mirrors --emit-empty-parent: when false (the
    *    reference CLI default), a list-of-dict element contributes a parent
    *    row only if it has at least one own scalar value. The engine
    *    default is true — schema-driven flattening emits every element row
    *    (a declared divergence: from_json cannot distinguish a key present
    *    with null from an absent key, so "has scalars" is approximated as
    *    "any own scalar non-null"). */
  final case class Options(
      joiner: String = "_",
      numericToFloat: Boolean = false,
      emitEmptyParent: Boolean = true)

  val metaCols: Seq[String] =
    Seq("tableName", "_row_id", "_parent_id", "_path", "_elem_index", "_depth")

  /** One array path in the schema = one output table. `arraySegments` are
    * the dotted struct paths of each successive array to explode. */
  final case class TablePlan(name: String, arraySegments: Seq[String], depth: Int)

  /** All array paths (tables) reachable in `schema` within the depth guard. */
  def plan(schema: StructType, guards: Guards = Guards(),
           joiner: String = "_"): Seq[TablePlan] = {
    val out = Seq.newBuilder[TablePlan]
    def structFields(st: StructType, path: Seq[String], arrays: Seq[String], depth: Int): Unit =
      st.fields.foreach { f =>
        descend(f.dataType, path :+ f.name, arrays, depth + 1)
      }
    def descend(dt: DataType, path: Seq[String], arrays: Seq[String], depth: Int): Unit = {
      if (guards.maxDepth.exists(depth > _)) return
      dt match {
        case s: StructType => structFields(s, path, arrays, depth)
        case a: ArrayType =>
          val chain = arrays :+ path.mkString(".")
          out += TablePlan(path.mkString(joiner), chain, depth)
          a.elementType match {
            case es: StructType => structFields(es, path, chain, depth)
            case ea: ArrayType => descend(ea, path, chain, depth + 1) // handled as same-name deeper table
            case _ => // scalar elements
          }
        case _ =>
      }
    }
    structFields(schema, Nil, Nil, 0)
    // list-of-lists re-adds the same name; keep the deepest chain per name
    out.result().groupBy(_.name).map { case (_, plans) =>
      plans.maxBy(_.arraySegments.length)
    }.toSeq.sortBy(_.name)
  }

  /** Backtick-quoted reference to an internal __inh_ column — inherited
    * names embed the user-chosen joiner, which may contain dots that col()
    * would otherwise parse as struct-field access. */
  private def inhCol(n: String): Column = col(s"`__inh_$n`")

  private def isScalar(dt: DataType): Boolean =
    !dt.isInstanceOf[StructType] && !dt.isInstanceOf[ArrayType]

  private def scalarCols(st: StructType, prefix: Seq[String], c: Column,
                         joiner: String): Seq[(String, Column)] =
    st.fields.toSeq.filter(f => isScalar(f.dataType)).map { f =>
      (prefix :+ f.name).mkString(joiner) -> c.getField(f.name)
    }

  /** Flatten `df(jsonCol)` (a JSON string column) into one DataFrame per
    * array path. `docId` (optional column name) seeds the lineage pointer so
    * ids are unique across documents. */
  def flatten(df: DataFrame, jsonCol: String, schema: StructType,
              docId: Option[String] = None,
              guards: Guards = Guards(),
              options: Options = Options()): Map[String, DataFrame] = {
    val parsed = df.withColumn("__doc", from_json(col(jsonCol), schema))
    plan(schema, guards, options.joiner).map { tp =>
      tp.name -> buildTable(parsed, schema, tp, docId, guards, options)
    }.toMap
  }

  /** State contract between explode levels: the DataFrame has exactly
    * columns __inh_<name>... (inherited scalars), __ptr (JSON pointer of the
    * current element), __pptr (pointer of the enclosing element or null),
    * __idx (element index), __el (current element value). */
  private def buildTable(parsed: DataFrame, schema: StructType, tp: TablePlan,
                         docId: Option[String], guards: Guards,
                         options: Options = Options()): DataFrame = {
    val initPtr = docId.map(d => concat(lit("/"), col(d).cast("string"))).getOrElse(lit(""))
    var cur = parsed.select(
      initPtr.as("__ptr"),
      lit(null).cast("string").as("__pptr"),
      lit(null).cast("int").as("__idx"),
      col("__doc").as("__el"))
    var curType: DataType = schema
    var inheritedNames: Seq[String] = Nil
    var consumed: Seq[String] = Nil

    tp.arraySegments.foreach { seg =>
      val segPath = seg.split("\\.").toSeq
      val rel = segPath.drop(consumed.length)
      // pure-expression struct descent from __el to the array column
      var c: Column = col("__el")
      var t: DataType = curType
      var newInh: Seq[(String, Column)] = Nil
      var prefix = consumed
      var ptrSuffix = ""
      rel.dropRight(1).foreach { step =>
        t match {
          case st: StructType =>
            newInh = newInh ++ scalarCols(st, prefix, c, options.joiner)
            c = c.getField(step)
            t = st.fields.find(_.name == step).map(_.dataType).getOrElse(StringType)
            prefix = prefix :+ step
            ptrSuffix += s"/$step"
          case _ =>
        }
      }
      val (arrCol, elemType, arrPtrName) = t match {
        case st: StructType =>
          newInh = newInh ++ scalarCols(st, prefix, c, options.joiner)
          val last = rel.last
          val at = st.fields.find(_.name == last).map(_.dataType) match {
            case Some(ArrayType(e, _)) => e
            case other => other.getOrElse(StringType)
          }
          (c.getField(last), at, ptrSuffix + s"/${rel.last}")
        case ArrayType(e, _) => (c, e, ptrSuffix) // list-of-lists: __el IS the array
        case _ => (c, t, ptrSuffix)
      }
      val inh = inheritedNames.map(n => n -> inhCol(n)) ++ newInh
      cur = cur.select(
        (inh.map { case (n, e) => e.as(s"__inh_$n") } :+
          concat(col("__ptr"), lit(arrPtrName)).as("__base") :+
          col("__ptr").as("__prevptr") :+
          arrCol.as("__arr")): _*)
      cur = cur
        .select(col("*"), posexplode_outer(col("__arr")).as(Seq("__i", "__e")))
        .filter(col("__i").isNotNull)
      cur = cur.select(
        (inh.map { case (n, _) => inhCol(n) } :+
          concat(col("__base"), lit("/"), col("__i").cast("string")).as("__ptr") :+
          (if (consumed.isEmpty && docId.isEmpty) lit(null).cast("string")
           else if (consumed.isEmpty) lit(null).cast("string")
           else col("__prevptr")).as("__pptr") :+
          col("__i").as("__idx") :+
          col("__e").as("__el")): _*)
      inheritedNames = inh.map(_._1)
      curType = elemType
      consumed = segPath
    }

    val isIntegral: DataType => Boolean = {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    // numericToFloat applies to the row's OWN scalars only — the reference
    // floats values at emission time, never the inherited dict (see Options)
    def maybeFloat(c: Column, dt: DataType): Column =
      if (options.numericToFloat && isIntegral(dt)) c.cast("double") else c
    val elemCols: Seq[(String, Column)] = curType match {
      case st: StructType =>
        val prefix = tp.arraySegments.last.split("\\.").toSeq
        st.fields.toSeq.filter(f => isScalar(f.dataType)).map { f =>
          (prefix :+ f.name).mkString(options.joiner) ->
            maybeFloat(col("__el").getField(f.name), f.dataType)
        }
      case dt => Seq(tp.name -> maybeFloat(col("__el"), dt))
    }
    // emitEmptyParent=false: a struct element with no own scalar values
    // contributes no row (the reference's prefixed-empty rule; struct types
    // with zero scalar fields emit nothing at all under this option)
    val emptyParentFilter: Option[Column] = curType match {
      case _: StructType if !options.emitEmptyParent =>
        val own = elemCols.map(_._2.isNotNull)
        Some(if (own.isEmpty) lit(false) else own.reduce(_ || _))
      case _ => None
    }
    val dataCols = inheritedNames.map(n => n -> inhCol(n)) ++ elemCols
    val kept = guards.maxCols match {
      case Some(mc) => dataCols.take(math.max(0, mc - metaCols.length))
      case None => dataCols
    }
    val filtered = emptyParentFilter.map(cur.filter).getOrElse(cur)
    val out = filtered.select(
      (kept.map { case (n, c) => c.as(n) } ++ Seq(
        lit(tp.name).as("tableName"),
        xxhash64(col("__ptr")).as("_row_id"),
        when(col("__pptr").isNotNull, xxhash64(col("__pptr")))
          .otherwise(lit(null).cast("long")).as("_parent_id"),
        col("__ptr").as("_path"),
        col("__idx").cast("int").as("_elem_index"),
        lit(tp.depth).as("_depth"))): _*)
    // maxRows truncation sorts on the JSON pointer path before limit
    // (path-lexicographic, not the reference row-walker's document order —
    // "/a/10" sorts before "/a/2"; declared divergence, same spirit as
    // _row_id). Deterministic when pointers are unique, i.e. whenever a
    // docId column seeds them (multi-document inputs without docId produce
    // identical paths across documents, leaving the choice among ties
    // arbitrary — pass docId if maxRows must be reproducible). Cost is
    // bounded: Spark plans sort+limit as TakeOrderedAndProject over at
    // most maxRows per partition, never a full sort of the table.
    guards.maxRows.map(n => out.orderBy(col("_path")).limit(n)).getOrElse(out)
  }

  /** Schema manifest: per table, sorted column names and Spark type names
    * (the reference's SchemaManifest, :64-82, derived statically from the
    * plan instead of observed per row). */
  def manifest(tables: Map[String, DataFrame]): Map[String, (Seq[String], Map[String, String])] =
    tables.map { case (name, df) =>
      val cols = df.schema.fields.map(_.name).sorted.toSeq
      name -> (cols, df.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap)
    }
}
