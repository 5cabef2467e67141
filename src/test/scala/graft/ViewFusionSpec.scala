package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{GetJsonObject, JsonToStructs}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.compile.{DemoSpecs, PipelineCompiler}

/** graft.plans.FuseJsonAccess: compiled JSON views must parse the payload
  * once per row (one JsonToStructs), not once per mapped column, with output
  * byte-identical to get_json_object per column (SURVEY §4 row 1).
  */
class ViewFusionSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    graft.functions.FlinkCompat.register(s) // installs FuseJsonAccess
    s
  }

  private def jsonToStructsCount(plan: LogicalPlan): Int =
    plan.collect { case n =>
      n.expressions.map(_.collect { case _: JsonToStructs => 1 }.sum).sum
    }.sum

  private def projectGetJsonCount(plan: LogicalPlan): Int =
    plan.collect { case p: Project =>
      p.projectList.map(_.collect { case _: GetJsonObject => 1 }.sum).sum
    }.sum

  // Truth table: every payload shape whose get_json_object result could
  // plausibly diverge from a from_json(all-string-schema) field access.
  private val payloads = Seq(
    """{"a":"x","b":"y"}""",                          // plain strings
    """{"a":{"n":1,"m":"s"},"b":[1,2,"t"]}""",        // nested -> JSON text
    """{"a":1.50,"b":1e2}""",                         // number normalization
    """{"a":null,"b":true}""",                        // JSON null / boolean
    """{"b":"only"}""",                               // missing key
    """not json at all""",                            // malformed payload
    null,                                             // NULL payload
    """{"a":"","b":" sp  "}""",                       // empty / padded
    """{"a":"hé","b":"\"q\""}"""                 // unicode + escapes
  )

  // literal-backed rows constant-fold to a LocalRelation before the rule
  // runs — round-trip through parquet so the Project survives to optimize.
  private def viaParquet(df: DataFrame, name: String): DataFrame = {
    val p = java.nio.file.Files.createTempDirectory("vf_").resolve(name).toString
    df.write.mode("overwrite").parquet(p)
    spark.read.parquet(p)
  }

  test("fused multi-access output matches per-column get_json_object exactly") {
    import spark.implicits._
    val df = viaParquet(
      payloads.zipWithIndex.map { case (p, i) => (i, p) }.toDF("id", "p"), "t")
    df.createOrReplaceTempView("vf_t")
    val fused = spark.sql(
      """SELECT id, get_json_object(p, '$.a') AS a, get_json_object(p, '$.b') AS b
         FROM vf_t""")
    assert(jsonToStructsCount(fused.queryExecution.optimizedPlan) == 1,
      fused.queryExecution.optimizedPlan.toString)
    assert(projectGetJsonCount(fused.queryExecution.optimizedPlan) == 0)
    // ground truth: single-access projects are below the fusion threshold
    val gtA = spark.sql("SELECT id, get_json_object(p, '$.a') AS a FROM vf_t")
    val gtB = spark.sql("SELECT id, get_json_object(p, '$.b') AS b FROM vf_t")
    assert(jsonToStructsCount(gtA.queryExecution.optimizedPlan) == 0)
    val got = fused.collect().map(r => (r.getInt(0), (r.getString(1), r.getString(2)))).toMap
    val expA = gtA.collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    val expB = gtB.collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    payloads.indices.foreach { i =>
      assert(got(i)._1 == expA(i), s"row $i col a: got ${got(i)._1}, want ${expA(i)}")
      assert(got(i)._2 == expB(i), s"row $i col b: got ${got(i)._2}, want ${expB(i)}")
    }
  }

  test("exotic paths stay on get_json_object (fallback), simple ones fuse") {
    import spark.implicits._
    viaParquet(Seq((1, """{"a":"x","b":"y","n":{"m":"deep"}}"""))
      .toDF("id", "p"), "w").createOrReplaceTempView("vf_w")
    // nested dot + array-step paths are the remaining unfused classes
    val df = spark.sql(
      """SELECT get_json_object(p, '$.a') AS a,
                get_json_object(p, '$.b') AS b,
                get_json_object(p, '$.n.m') AS nm,
                get_json_object(p, '$[0]') AS arr
         FROM vf_w""")
    val plan = df.queryExecution.optimizedPlan
    assert(jsonToStructsCount(plan) == 1)
    assert(projectGetJsonCount(plan) == 2) // nested + array survive as-is
    val r = df.collect()(0)
    assert(r.getString(0) == "x" && r.getString(1) == "y" &&
      r.getString(2) == "deep" && r.isNullAt(3))
  }

  test("single-level bracket paths fuse as literal keys (VERDICT r10 #7)") {
    // the reference's quoted-field escape: $['weird key'] / $['a.b'] name
    // LITERAL top-level keys (the dot is a key character, not a path step)
    import spark.implicits._
    viaParquet(Seq((1, """{"a":"x","weird key":"w","a.b":"dotted"}"""))
      .toDF("id", "p"), "bk").createOrReplaceTempView("vf_bk")
    val df = spark.sql(
      """SELECT get_json_object(p, '$.a') AS a,
                get_json_object(p, "$['weird key']") AS w,
                get_json_object(p, "$['a.b']") AS d
         FROM vf_bk""")
    val plan = df.queryExecution.optimizedPlan
    assert(jsonToStructsCount(plan) == 1, plan.toString)
    assert(projectGetJsonCount(plan) == 0, plan.toString)
    val r = df.collect()(0)
    assert(r.getString(0) == "x" && r.getString(1) == "w" &&
      r.getString(2) == "dotted")
    // parity on the null/missing cases: bracket access of a missing key and
    // of a NULL payload, unfused ground truth vs fused
    viaParquet(Seq((1, """{"z":"only"}"""), (2, null))
      .toDF("id", "p"), "bk2").createOrReplaceTempView("vf_bk2")
    val f2 = spark.sql(
      """SELECT id, get_json_object(p, "$['weird key']") AS w,
                get_json_object(p, "$['z']") AS z
         FROM vf_bk2""")
    assert(jsonToStructsCount(f2.queryExecution.optimizedPlan) == 1)
    val rows = f2.collect().map(r => r.getInt(0) ->
      (Option(r.getString(1)), Option(r.getString(2)))).toMap
    assert(rows(1) == (None, Some("only")))
    assert(rows(2) == (None, None))
  }

  test("a single distinct path does not trigger the rewrite") {
    import spark.implicits._
    viaParquet(Seq((1, """{"a":"x"}""")).toDF("id", "p"), "s")
      .createOrReplaceTempView("vf_s")
    val df = spark.sql(
      "SELECT get_json_object(p, '$.a') AS a1, get_json_object(p, '$.a') AS a2 FROM vf_s")
    assert(jsonToStructsCount(df.queryExecution.optimizedPlan) == 0)
    val r = df.collect()(0)
    assert(r.getString(0) == "x" && r.getString(1) == "x")
  }

  test("compiled multi-JSON-column view plans exactly one JsonToStructs per view") {
    // the colspec shape: one topic payload column, k JSON-mapped columns —
    // the plan the reference compiles to k JSON_VALUE re-parses per row.
    val dir = "/root/testdata/sf0.001"
    // `k` is a typed passthrough of the PK so ground-truth queries can key
    // their rows with a SINGLE JSON access (two would fuse and test nothing).
    Tables.events(spark, dir).select(
      col("event_id").as("k"),
      to_json(struct(
        lit("evt").as("tbl"), col("event_id"), col("user_id"), col("event_type"),
        col("value").cast("decimal(10,2)").cast("string").as("amt"))).as("val"))
      .createOrReplaceTempView("vf_topic")
    graft.functions.FlinkCompat.register(spark)
    val vw = spark.sql(
      """SELECT CAST(TRIM(JSON_VALUE(CAST(val AS STRING), '$.event_id')) AS BIGINT) AS EVENT_ID,
                CAST(TRIM(JSON_VALUE(CAST(val AS STRING), '$.user_id')) AS BIGINT) AS USER_ID,
                CAST(TRIM(JSON_VALUE(CAST(val AS STRING), '$.event_type')) AS STRING) AS EVENT_TYPE,
                CAST(NULLIF(TRIM(JSON_VALUE(CAST(val AS STRING), '$.amt')), '') AS DOUBLE) AS AMT
         FROM vf_topic
         WHERE JSON_VALUE(CAST(val AS STRING), '$.tbl') = 'evt'""")
    val plan = vw.queryExecution.optimizedPlan
    assert(jsonToStructsCount(plan) == 1, plan.toString)
    assert(projectGetJsonCount(plan) == 0, plan.toString)
    // the discriminator filter's single JSON access is untouched
    val filterParses = plan.collect { case f: Filter =>
      f.condition.collect { case _: GetJsonObject => 1 }.sum
    }.sum
    assert(filterParses >= 1)
    // Full materialization of EVERY view column (a count() re-optimizes and
    // prunes the hoisted-common-expr AMT column away before the rule runs,
    // which is exactly how the sibling-alias execution crash stayed
    // invisible): collect all columns and value-compare against per-column
    // single-access ground truth (single distinct path => unfused).
    val got = vw.collect().map(r =>
        r.getLong(0) -> (r.getLong(1), r.getString(2),
          if (r.isNullAt(3)) null else java.lang.Double.valueOf(r.getDouble(3))))
      .toMap
    assert(got.nonEmpty)
    def groundTruth(expr: String): Map[Long, Any] = {
      val df = spark.sql(s"SELECT k AS K, $expr AS V FROM vf_topic")
      assert(jsonToStructsCount(df.queryExecution.optimizedPlan) == 0,
        "ground-truth query must stay unfused: " +
          df.queryExecution.optimizedPlan.toString)
      df.collect().map(r => r.getLong(0) -> r.get(1)).toMap
    }
    val gtUser = groundTruth(
      "CAST(TRIM(JSON_VALUE(CAST(val AS STRING), '$.user_id')) AS BIGINT)")
    val gtType = groundTruth(
      "CAST(TRIM(JSON_VALUE(CAST(val AS STRING), '$.event_type')) AS STRING)")
    val gtAmt = groundTruth(
      "CAST(NULLIF(TRIM(JSON_VALUE(CAST(val AS STRING), '$.amt')), '') AS DOUBLE)")
    val n = Tables.events(spark, dir).count()
    assert(got.size == n)
    got.foreach { case (id, (u, t, a)) =>
      assert(u == gtUser(id), s"row $id USER_ID")
      assert(t == gtType(id), s"row $id EVENT_TYPE")
      assert(a == gtAmt(id), s"row $id AMT: got $a want ${gtAmt(id)}")
    }
  }

  test("duplicate-key payloads: fused takes the LAST occurrence (documented divergence)") {
    // get_json_object (Jackson streaming, first match wins) returns the FIRST
    // duplicate; from_json's row builder overwrites, so the fused plan
    // returns the LAST. This is a pinned, documented divergence (duplicate
    // keys are invalid per RFC 8259 §4 "names within an object SHOULD be
    // unique"); see the FuseJsonAccess scaladoc.
    import spark.implicits._
    viaParquet(Seq((1, """{"a":"first","b":"y","a":"second"}"""))
      .toDF("id", "p"), "dup").createOrReplaceTempView("vf_dup")
    val fused = spark.sql(
      "SELECT get_json_object(p, '$.a') AS a, get_json_object(p, '$.b') AS b FROM vf_dup")
    assert(jsonToStructsCount(fused.queryExecution.optimizedPlan) == 1)
    val r = fused.collect()(0)
    assert(r.getString(0) == "second" && r.getString(1) == "y")
    val unfused = spark.sql("SELECT get_json_object(p, '$.a') AS a FROM vf_dup")
    assert(jsonToStructsCount(unfused.queryExecution.optimizedPlan) == 0)
    assert(unfused.collect()(0).getString(0) == "first")
  }

  test("width-32 production view (q_view_parse_wide) plans exactly one parse") {
    val df = SparkEntry.queries("q_view_parse_wide")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.optimizedPlan
    assert(jsonToStructsCount(plan) == 1, plan.toString)
    assert(projectGetJsonCount(plan) == 0, plan.toString)
    // the crashing pre-r10 shape: materialize every column, incl. the
    // NULLIF hoisted-common-expr one
    val rows = df.collect()
    assert(rows.length > 0)
    assert(rows.exists(r => !r.isNullAt(1)))   // typ
    assert(rows.exists(r => !r.isNullAt(33)))  // f31
  }

  test("COMPILED width-32 STTM view (q_sttm_wide) plans exactly one parse") {
    // VERDICT r10 #5: the fusion's pre-r10 crash was on the COMPILED shape
    // (RewriteWithExpression splits the NULLIF columns across Projects);
    // q_view_parse_wide locks the hand-built equivalent, this locks
    // spec -> PipelineCompiler -> FuseJsonAccess -> execution at width.
    val df = SparkEntry.queries("q_sttm_wide")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.optimizedPlan
    assert(jsonToStructsCount(plan) == 1, plan.toString)
    assert(projectGetJsonCount(plan) == 0, plan.toString)
    // materialize EVERY column (count() would re-optimize and prune the
    // hoisted-common-expr columns away before the rule runs). Column order
    // is the compiler's deterministic lexicographic order, so index by name.
    val iId = df.schema.fieldIndex("EVENT_ID")
    val iTyp = df.schema.fieldIndex("TYP")
    val iF31 = df.schema.fieldIndex("F31")
    val rows = df.collect()
    assert(rows.length > 0)
    assert(rows.exists(r => !r.isNullAt(iTyp)))
    assert(rows.exists(r => !r.isNullAt(iF31)))
    // spot value: F31 = event_id + 31 wherever the payload is non-null
    rows.filter(r => !r.isNullAt(iF31)).take(5).foreach { r =>
      assert(r.getLong(iF31) == r.getLong(iId) + 31)
    }
  }

  test("demo pipeline still runs green end-to-end with the rule installed") {
    Tables.events(spark, "/root/testdata/sf0.001").createOrReplaceTempView("events")
    Tables.customer(spark, "/root/testdata/sf0.001").createOrReplaceTempView("customer")
    val outputs = PipelineCompiler
      .compile(DemoSpecs.jsonPipeline, DemoSpecs.jsonOptions).run(spark)
    assert(outputs("EVENTS_VW").count() > 0)
    assert(outputs("FGAC_USER_REF").count() > 0)
  }
}
