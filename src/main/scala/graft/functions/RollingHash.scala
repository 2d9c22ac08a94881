package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hashes of every `window`-char substring:
  * out(i) = Σ_j charAt(i+j)·base^(window−1−j) mod `mod` — the winnowing /
  * content-defined-chunking kernel. Value-identical to the HOF form
  * `transform(seq, i -> aggregate(slice(chars, i, w), 0L, (a,x) ->
  * (a*base + x) % mod))`, but O(n) (each step ROLLS the previous hash:
  * drop the leading term, shift, add the next char) instead of O(n·w)
  * re-folds, and codegen'd instead of interpreted lambda dispatch. With
  * mod ≤ ~2^31 and 16-bit chars every intermediate fits a long. Strings
  * shorter than the window yield an empty array.
  */
case class RollingHash(child: Expression, window: Int, base: Long, mod: Long)
    extends UnaryExpression {

  // base and mod both ≤ 2^31: every intermediate (h*base + char) stays
  // below 2^62 + 2^47, so the Long arithmetic in eval/codegen never wraps
  require(window > 0 && base > 0 && base <= Int.MaxValue.toLong &&
    mod > 1 && mod <= Int.MaxValue.toLong,
    s"bad rolling-hash params (window=$window base=$base mod=$mod)")

  // type-checked post-resolution (a constructor require would fire on the
  // unresolved child)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"RollingHash expects a string column, got ${child.dataType}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // base^(window-1) mod mod — the weight of the outgoing character
  private lazy val pow: Long =
    (1 until window).foldLeft(1L)((p, _) => p * base % mod)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val n = s.length
    val m = n - window + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](m)
    var h = 0L
    var i = 0
    while (i < window) { h = (h * base + s.charAt(i)) % mod; i += 1 }
    out(0) = h
    var w = 1
    while (w < m) {
      h = (h - s.charAt(w - 1) * pow % mod + mod) % mod
      h = (h * base + s.charAt(w + window - 1)) % mod
      out(w) = h
      w += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val s = ctx.freshName("s")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val arr = ctx.freshName("arr")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val w = ctx.freshName("w")
      s"""
         |String $s = $x.toString();
         |int $n = $s.length();
         |int $m = $n - $window + 1;
         |long[] $arr = new long[$m > 0 ? $m : 0];
         |if ($m > 0) {
         |  long $h = 0L;
         |  for (int $i = 0; $i < $window; $i++) {
         |    $h = ($h * ${base}L + $s.charAt($i)) % ${mod}L;
         |  }
         |  $arr[0] = $h;
         |  for (int $w = 1; $w < $m; $w++) {
         |    $h = ($h - $s.charAt($w - 1) * ${pow}L % ${mod}L + ${mod}L) % ${mod}L;
         |    $h = ($h * ${base}L + $s.charAt($w + $window - 1)) % ${mod}L;
         |    $arr[$w] = $h;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}
