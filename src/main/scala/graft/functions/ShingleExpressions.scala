package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native sorted-distinct character-n-gram hash array of a string column.
  *
  * The declarative formulation — `array_sort(array_distinct(transform(
  * charShingles(text, n), h)))` — nests THREE higher-order functions, and
  * Spark evaluates higher-order functions via CodegenFallback: every
  * shingle pays interpreted expression-tree walking, boxing, and a fresh
  * per-element projection. Measured at sf0.1 that interpretation costs
  * ~2 s per corpus pass vs 0.15 s for this expression (one tight JVM loop
  * per document, whole-stage-codegen'd via a static call) — the dominant
  * term of every MinHash/LSH query's hash stage, and at 100 TB a
  * fleet-wide CPU sink. This is exactly the "custom codegen Expression
  * beats the built-in composition" escape hatch, used only because the
  * built-in path cannot fuse the loop.
  *
  * Hash modes mirror the two established column formulations BIT-FOR-BIT
  * (ShingleSpec asserts equality against both):
  *  - parity: `conv(substring(md5(s), 1, 15), 16, 10)` — the top 60 bits
  *    of the md5 digest as an unsigned long (what [[graft.operators.TextDedup.stableHash]]
  *    computes via string hex conversion, reproducible in any SQL engine);
  *  - production: `pmod(xxhash64(s), mod)` via the same XxHash64Function
  *    (seed 42) Spark's codegen'd xxhash64 uses.
  * `mod > 0` applies the positive modulus; `mod <= 0` returns the raw
  * 60-bit / xxhash64 value.
  *
  * Shingle semantics mirror [[graft.operators.TextDedup.charShingles]]:
  * positions 1..len-n+1 of n characters each (SQL substring semantics,
  * code points not bytes); text shorter than n yields the whole text as
  * its single shingle. Output is ascending and duplicate-free — the
  * invariant the PPJoin prefix filter and the merge-walk verifier
  * ([[SortedIntersectCount]]) rely on.
  */
case class ShingleHashes(child: Expression, n: Int, parity: Boolean,
                         mod: Long) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes requires a string input, got ${dt.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[UTF8String], n, parity, mod)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleHashes.compute(" +
        s"$c, $n, $parity, ${mod}L);")

  override protected def withNewChildInternal(
      newChild: Expression): ShingleHashes = copy(child = newChild)
}

object ShingleHashes {

  private val md5 = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** One tight loop per document: hash every n-char window, sort, dedup.
    * Public because generated code calls it statically. */
  def compute(text: UTF8String, n: Int, parity: Boolean,
              mod: Long): ArrayData = {
    val len = text.numChars()
    val count = math.max(len - n + 1, 1)
    val out = new Array[Long](count)
    val md = if (parity) md5.get() else null
    var i = 0
    while (i < count) {
      val sh = text.substringSQL(i + 1, n)
      var v =
        if (parity) {
          md.reset()
          val d = md.digest(sh.getBytes)
          // top 60 bits of the digest == conv(substring(hex, 1, 15), 16, 10)
          (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
            ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
            ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
            ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
        } else XxHash64Function.hash(sh, StringType, 42L)
      if (mod > 0L) v = ((v % mod) + mod) % mod
      out(i) = v
      i += 1
    }
    java.util.Arrays.sort(out)
    var w = 0
    var r = 1
    while (r < count) {
      if (out(r) != out(w)) { w += 1; out(w) = out(r) }
      r += 1
    }
    val m = w + 1
    new GenericArrayData(
      if (m == count) out else java.util.Arrays.copyOf(out, m))
  }

  /** Idempotent per-session registration (temp function registry). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "shingle_hashes", exprs => {
        def scalar[A](e: Expression): A = e.eval().asInstanceOf[A]
        ShingleHashes(exprs(0), scalar[Int](exprs(1)),
          scalar[Boolean](exprs(2)), exprs(3).eval() match {
            case l: Long => l
            case i: Int => i.toLong
          })
      }, "scala_udf")

  /** Sorted-distinct shingle-hash array Column (requires [[register]]). */
  def shingleHashes(text: Column, n: Int, parity: Boolean,
                    mod: Long): Column =
    call_function("shingle_hashes", text, lit(n), lit(parity), lit(mod))
}
