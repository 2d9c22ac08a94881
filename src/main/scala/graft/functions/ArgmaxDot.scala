package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, SQLOrderingUtil}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Index of the row-vector's best centroid: argmax over `cents` of
  * `dot(vec[offset ..< offset+sub], cents(i)) + bias(i)`, ties to the
  * SMALLEST index — the coarse-quantizer assignment (Ivf) and per-subspace
  * PQ encode kernel.
  *
  * Value-identical to the expression-forest formulation it replaces
  * (`-array_max(array(struct(VecDot(slice(vec,...), lit(c_i)) + b_i, -i))).ni`):
  *  - the dot is the same strict left-to-right Double fold as [[VecDot]],
  *    truncated to the shorter operand (slice past the end of `vec` yields
  *    a shorter slice, hence a partial dot — mirrored by the `n` bound);
  *  - score comparison uses [[SQLOrderingUtil.compareDoubles]], the exact
  *    ordering Spark's struct max uses for DoubleType (NaN greatest,
  *    -0.0 == 0.0), with strict `>` so equal scores keep the first
  *    (smallest) index, matching `max (score, -i)` lexicographic order;
  *  - a NULL input row scores every centroid equal (all-null dots), which
  *    the struct formulation resolved to index 0 — mirrored here (the
  *    expression is therefore never null, which also spares the planner
  *    the inferred `isnotnull(<whole argmax tree>)` join-key filter that
  *    used to re-evaluate the forest once more per row).
  *
  * Why not the expression forest: cells×(slice + dot + struct) built a
  * plan-tree of hundreds of nodes per reference — tens of KB of generated
  * source PER DISTINCT PLAN, paying Janino compilation (~1-2 s) on every
  * action that touches assignment/encode, and falling back to interpreted
  * eval per element where codegen declines. This kernel is a ~20-line
  * generated loop with the centroid matrix attached as a reference object
  * (source text identical across Lloyd passes and plans, so the compiled
  * class is cached), and it lives inside WholeStageCodegen.
  */
case class ArgmaxDot(
    child: Expression,
    cents: Array[Array[Double]],
    bias: Array[Double],
    offset: Int)
    extends UnaryExpression {

  require(cents.nonEmpty, "ArgmaxDot needs at least one centroid")
  require(bias == null || bias.length == cents.length,
    "bias length must match centroid count")

  override def dataType: DataType = IntegerType

  override def nullable: Boolean = false

  // a wrong input type must surface at analysis time, not as a runtime
  // IllegalArgumentException out of elemFloat
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ArgmaxDot requires array<float> or array<double> input, " +
        s"got ${other.catalogString}")
  }

  // case-class equality on Array params is reference-based, which defeats
  // semanticEquals / subexpression elimination / ReuseExchange for
  // structurally equal kernels — compare array CONTENTS instead. The
  // planner calls equals/hashCode on every expression-map lookup and the
  // optimizer churns out fresh copies per rule pass, so BOTH must stay
  // O(1) on the hot path: hashCode deliberately folds in only the matrix
  // SHAPE (content-equal matrices agree, so the contract holds), and
  // equals fast-paths on shared instances (Pq/Ivf reuse one matrix object
  // across a whole plan) before falling back to a content compare.
  override def equals(other: Any): Boolean = other match {
    case a: ArgmaxDot =>
      child == a.child && offset == a.offset &&
        ((cents eq a.cents) || java.util.Arrays.deepEquals(
          cents.asInstanceOf[Array[AnyRef]], a.cents.asInstanceOf[Array[AnyRef]])) &&
        ((bias eq a.bias) || java.util.Arrays.equals(bias, a.bias))
    case _ => false
  }

  override def hashCode(): Int = java.util.Objects.hash(
    child, Integer.valueOf(offset),
    Integer.valueOf(cents.length),
    Integer.valueOf(if (bias == null) -1 else bias.length))

  private lazy val elemFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"ArgmaxDot expects array<float|double>, got $other")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return 0
    val arr = v.asInstanceOf[ArrayData]
    val len = arr.numElements()
    var best = 0
    var bestScore = 0.0
    var i = 0
    while (i < cents.length) {
      val c = cents(i)
      var s = 0.0
      val n = math.min(c.length, len - offset)
      var j = 0
      while (j < n) {
        val x = if (elemFloat) arr.getFloat(offset + j).toDouble
          else arr.getDouble(offset + j)
        s += x * c(j)
        j += 1
      }
      if (bias != null) s += bias(i)
      if (i == 0 || SQLOrderingUtil.compareDoubles(s, bestScore) > 0) {
        best = i
        bestScore = s
      }
      i += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val centsRef = ctx.addReferenceObj("cents", cents, "double[][]")
    val biasRef = if (bias == null) null
      else ctx.addReferenceObj("bias", bias, "double[]")
    val arr = ctx.freshName("arr")
    val getX = if (elemFloat) s"(double) $arr.getFloat" else s"$arr.getDouble"
    val best = ctx.freshName("best")
    val bestScore = ctx.freshName("bestScore")
    val i = ctx.freshName("i")
    val j = ctx.freshName("j")
    val n = ctx.freshName("n")
    val s = ctx.freshName("s")
    val c = ctx.freshName("c")
    val biasAdd = if (biasRef == null) "" else s"$s += $biasRef[$i];"
    ev.copy(isNull = FalseLiteral, code = code"""
      ${childGen.code}
      int $best = 0;
      if (!${childGen.isNull}) {
        org.apache.spark.sql.catalyst.util.ArrayData $arr = ${childGen.value};
        double $bestScore = 0.0;
        for (int $i = 0; $i < $centsRef.length; $i++) {
          double[] $c = $centsRef[$i];
          double $s = 0.0;
          int $n = Math.min($c.length, $arr.numElements() - $offset);
          for (int $j = 0; $j < $n; $j++) {
            $s += $getX($offset + $j) * $c[$j];
          }
          $biasAdd
          if ($i == 0 ||
              org.apache.spark.sql.catalyst.util.SQLOrderingUtil.compareDoubles($s, $bestScore) > 0) {
            $best = $i;
            $bestScore = $s;
          }
        }
      }
      int ${ev.value} = $best;
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): ArgmaxDot =
    copy(child = newChild)
}
