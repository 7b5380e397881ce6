package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native codegen kernels for the sketch/vector hot loops (SURVEY §7.3's
  * "performance-only custom expressions"). Each is bit-identical to the
  * higher-order-function formulation it replaces — same integer math, same
  * sequential double-fold order — so swapping them into an oracle-declared
  * query never changes a hash. The interpreted `transform`/`aggregate`
  * folds allocate per-element closures and ArrayData cells; these run one
  * tight primitive loop per row inside whole-stage codegen. */
object Sketches {

  /** vec_dot(array<float>, array<float>) → double: sequential fold, same
    * order as aggregate(zip_with(...)) and DuckDB list_sum(list_transform). */
  case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "vec_dot"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val xs = a.asInstanceOf[ArrayData].toFloatArray()
      val ys = b.asInstanceOf[ArrayData].toFloatArray()
      val n = math.min(xs.length, ys.length)
      var dot = 0.0; var i = 0
      while (i < n) { dot += xs(i).toDouble * ys(i).toDouble; i += 1 }
      dot
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val xs = ctx.freshName("xs"); val ys = ctx.freshName("ys")
        val n = ctx.freshName("n"); val i = ctx.freshName("i")
        val dot = ctx.freshName("dot")
        s"""
           |float[] $xs = $a.toFloatArray();
           |float[] $ys = $b.toFloatArray();
           |int $n = Math.min($xs.length, $ys.length);
           |double $dot = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $dot += (double) $xs[$i] * (double) $ys[$i];
           |}
           |${ev.value} = $dot;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** simhash32(array<bigint>) → bigint: 32-bit majority-vote fingerprint
    * over token ids. Bit i of the result is set iff more than half the ids
    * have bit i set — identical to the SQL
    * `aggregate(sequence(0,31), …, 2*size(filter(ids, bit i)) > size)`
    * formulation, in one pass instead of 32. */
  case class SimHash32(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "simhash32"

    override def nullSafeEval(input: Any): Any = {
      val ids = input.asInstanceOf[ArrayData].toLongArray()
      val cnt = new Array[Int](32)
      var i = 0
      while (i < ids.length) {
        val h = ids(i); var b = 0
        while (b < 32) { cnt(b) += ((h >>> b) & 1L).toInt; b += 1 }
        i += 1
      }
      var out = 0L; var b = 0
      while (b < 32) { if (2 * cnt(b) > ids.length) out |= 1L << b; b += 1 }
      out
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val ids = ctx.freshName("ids"); val cnt = ctx.freshName("cnt")
        val i = ctx.freshName("i"); val b = ctx.freshName("b")
        val h = ctx.freshName("h"); val out = ctx.freshName("out")
        s"""
           |long[] $ids = $a.toLongArray();
           |int[] $cnt = new int[32];
           |for (int $i = 0; $i < $ids.length; $i++) {
           |  long $h = $ids[$i];
           |  for (int $b = 0; $b < 32; $b++) { $cnt[$b] += (int) (($h >>> $b) & 1L); }
           |}
           |long $out = 0L;
           |for (int $b = 0; $b < 32; $b++) {
           |  if (2 * $cnt[$b] > $ids.length) $out |= 1L << $b;
           |}
           |${ev.value} = $out;
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** shingles3(array<string>) → array<string>: distinct 3-token shingles
    * joined by single spaces, first-occurrence order — value-identical to
    * `array_distinct(transform(sequence(1, size(t)-2), i -> concat_ws(' ',
    * element_at(t,i), element_at(t,i+1), element_at(t,i+2))))` on inputs of
    * ≥3 tokens (shorter inputs: this returns [], the SQL form errors on
    * element_at(…, 0) — and the DuckDB oracle's generate_series form also
    * returns []). Exists because the SQL form hides an O(tokens²) trap:
    * Catalyst CollapseProject inlines the upstream `split` into the lambda
    * and Spark does not CSE inside higher-order-function lambdas, so every
    * shingle element re-splits the whole text (measured 292 s at sf0.1 for
    * the inverted-index join; ~3 s with this node). A native expression has
    * no lambda to inline into. Interpreted eval (CodegenFallback) is fine:
    * one JVM-compiled loop per row. */
  case class Shingles3(child: Expression) extends UnaryExpression
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "shingles3"

    private val SPACE = org.apache.spark.unsafe.types.UTF8String.fromString(" ")

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val seen = new java.util.LinkedHashSet[org.apache.spark.unsafe.types.UTF8String]()
      var i = 0
      while (i + 2 < n) {
        seen.add(org.apache.spark.unsafe.types.UTF8String.concatWs(SPACE,
          arr.getUTF8String(i), arr.getUTF8String(i + 1), arr.getUTF8String(i + 2)))
        i += 1
      }
      new GenericArrayData(seen.toArray[AnyRef](new Array[AnyRef](seen.size())))
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** minhash16(array<bigint>) → array<bigint>: 16 MinHash signatures under
    * the fixed permutation family h_j(x) = ((2j+3)·x + 5j+7) mod 1000003
    * over ids already reduced mod 1000003 — identical arithmetic to the
    * `transform(sequence(0,15), j -> array_min(...))` formulation (16
    * passes) in a single pass. Empty input → all-Long.MaxValue signature
    * (array_min of empty is null upstream; fixtures never produce it). */
  case class MinHash16(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "minhash16"

    private val P = 1000003L

    override def nullSafeEval(input: Any): Any = {
      val ids = input.asInstanceOf[ArrayData].toLongArray()
      val sig = Array.fill(16)(Long.MaxValue)
      var i = 0
      while (i < ids.length) {
        val h = ids(i); var j = 0
        while (j < 16) {
          val v = ((2 * j + 3) * h + 5 * j + 7) % P
          if (v < sig(j)) sig(j) = v
          j += 1
        }
        i += 1
      }
      new GenericArrayData(sig)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val ids = ctx.freshName("ids"); val sig = ctx.freshName("sig")
        val i = ctx.freshName("i"); val j = ctx.freshName("j")
        val h = ctx.freshName("h"); val v = ctx.freshName("v")
        s"""
           |long[] $ids = $a.toLongArray();
           |long[] $sig = new long[16];
           |java.util.Arrays.fill($sig, Long.MAX_VALUE);
           |for (int $i = 0; $i < $ids.length; $i++) {
           |  long $h = $ids[$i];
           |  for (int $j = 0; $j < 16; $j++) {
           |    long $v = ((2L * $j + 3L) * $h + 5L * $j + 7L) % ${P}L;
           |    if ($v < $sig[$j]) $sig[$j] = $v;
           |  }
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Thread-local MD5 so per-token hashing never re-does provider lookup
    * (MessageDigest.getInstance walks the provider list on every call). */
  private val tlMd5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Value of the first 15 hex chars of md5(b) — i.e. the top 60 bits of
    * the digest — read straight off the digest bytes. Bit-identical to
    * `CAST(conv(substr(md5(x), 1, 15), 16, 10) AS BIGINT)` (and DuckDB's
    * `('0x' || substr(md5(x), 1, 15))::BIGINT`) without materializing the
    * 32-char hex string or re-parsing it (one digest + bit math vs three
    * string allocations per token). */
  def md5Long60(b: Array[Byte]): Long = {
    val md = tlMd5.get(); md.reset()
    val d = md.digest(b)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0L) >>> 4)
  }

  /** Jaro similarity of two strings — the textbook definition DuckDB's
    * `jaro_similarity` implements (match window ⌊max(|a|,|b|)/2⌋−1,
    * transpositions halved), verified value-identical on the classic
    * record-linkage vectors (MARTHA/MARHTA 0.9611…, DIXON/DICKSONX
    * 0.7666…) and on 3006 fuzz pairs at 1e-12. Division order matches
    * the (m/|a| + m/|b| + (m−t)/m)/3 spelling so the doubles agree
    * bit-for-bit at the round-6 grain. Edge pin: DuckDB 1.0 returns 0.0
    * when EITHER side is empty — including both-empty (empirically
    * verified; rapidfuzz's convention of 1.0 for ("","") is NOT what the
    * oracle engine does), so the length guard runs before the equality
    * shortcut. */
  def jaro(a: String, b: String): Double = {
    val la = a.length; val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    if (a == b) return 1.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val aM = new Array[Boolean](la); val bM = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window); val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bM(j) && a.charAt(i) == b.charAt(j)) {
          aM(i) = true; bM(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0; var k = 0
    i = 0
    while (i < la) {
      if (aM(i)) {
        while (!bM(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    (md / la + md / lb + (md - t / 2) / md) / 3.0
  }

  /** Jaro-Winkler: Jaro plus the common-prefix boost (scale 0.1, prefix
    * capped at 4), applied only above the 0.7 boost threshold — the
    * DuckDB `jaro_winkler_similarity` semantics the oracle compares
    * against. */
  def jaroWinkler(a: String, b: String): Double = {
    val j = jaro(a, b)
    if (j <= 0.7) return j
    var l = 0
    val max = math.min(4, math.min(a.length, b.length))
    while (l < max && a.charAt(l) == b.charAt(l)) l += 1
    j + l * 0.1 * (1.0 - j)
  }

  /** jaro_winkler(string, string) → double, codegen. */
  case class JaroWinkler(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "jaro_winkler"

    override def nullSafeEval(a: Any, b: Any): Any =
      jaroWinkler(a.toString, b.toString)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) =>
        s"graft.functions.Sketches.jaroWinkler($a.toString(), $b.toString())")

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** tid60(string) → long: the engine's deterministic 60-bit token id
    * (see [[md5Long60]]). Hot inside `transform(...)` lambdas, which
    * Spark evaluates interpreted per element — exactly where collapsing
    * the md5→hex→substr→conv chain to one digest pays most. */
  case class Tid60(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "tid60"

    override def nullSafeEval(s: Any): Any =
      md5Long60(s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.Sketches.md5Long60($c.getBytes())")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }
}
