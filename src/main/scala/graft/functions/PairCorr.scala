package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Pearson correlation of two sparse series over their COMMON
  * positions, in one codegen'd merge pass: `[n, r]` where n is the
  * common-session count and r the unrounded coefficient, or NULL when
  * the pair is invalid (n < minDays, or either side has zero variance
  * — corr undefined).
  *
  * Inputs are two (index, value) series, each as a pair of parallel
  * arrays sorted ascending by index (`array<int>` indices,
  * `array<double>` values). SORTEDNESS IS A PRECONDITION, not
  * checked: the merge walks both series once, so unsorted indices
  * silently skip common positions (the SQL-facade registration
  * repeats this contract — build the arrays with `sort_array` over
  * the collected (index, value) structs, as [[graft.operators
  * .Warehouse.returnCorrOf]] does). A slot where either the index or
  * the value is NULL is skipped on that side — a null session carries
  * no observation (without the guard, ArrayData.getInt would read a
  * phantom index 0). The merge accumulates n, Σx, Σy, Σx²,
  * Σy², Σxy in index order and finishes with
  * r = (Σxy − ΣxΣy/n) / √((Σx² − Σx²/n)(Σy² − Σy²/n)) — the same
  * IEEE754 operations in the same order as the Catalyst-column
  * formulation it replaces, so results are bit-identical.
  *
  * Why ONE fused expression instead of a moments primitive plus
  * Column arithmetic (and why not densify onto the session grid and
  * take six [[VectorDot]]s, the round-5..7 shape)? Three measured
  * traps at sf0.1, where the merge over a candidate pair is ~100× the
  * cost of a double op so every extra evaluation is a full reprice:
  *  - dense grids: building them with `transform(sequence(0, n-1),
  *    i -> m[i])` probes a Catalyst map per grid slot — `GetMapValue`
  *    is a linear scan — and ships #grid·3 doubles per symbol·bucket
  *    through the tile shuffle;
  *  - filters on derived columns (`n ≥ minDays`, `cden > 0`) are
  *    pushed into the tile-join CONDITION with the merge inlined per
  *    conjunct term, and join-condition codegen does no
  *    common-subexpression elimination — NINE evaluations per
  *    candidate row, 6.4 s of an 8 s query;
  *  - folding validity into a `when(valid, r)` Column keeps the merge
  *    inside CaseWhen branches, which subexpression elimination
  *    treats as conditionally-evaluated and will not share.
  * Fused, the validity rule is ordinary Java control flow, the
  * expression appears in ONE Project whose two array extractions CSE
  * to a single evaluation, and the invalid case is a NULL that sorts
  * after every real coefficient.
  */
case class PairCorr(aIdx: Expression, aVal: Expression,
    bIdx: Expression, bVal: Expression, minDays: Int)
  extends QuaternaryExpression {

  override def first: Expression = aIdx
  override def second: Expression = aVal
  override def third: Expression = bIdx
  override def fourth: Expression = bVal

  override def nullable: Boolean = true

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = {
    def intArr(t: DataType) = t match {
      case ArrayType(IntegerType, _) => true; case _ => false
    }
    def dblArr(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true; case _ => false
    }
    if (intArr(aIdx.dataType) && dblArr(aVal.dataType) &&
        intArr(bIdx.dataType) && dblArr(bVal.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "pair_corr expects (array<int>, array<double>, array<int>, " +
        s"array<double>), got ${aIdx.dataType}, ${aVal.dataType}, " +
        s"${bIdx.dataType}, ${bVal.dataType}")
  }

  override def nullSafeEval(ai: Any, av: Any, bi: Any, bv: Any): Any = {
    val aI = ai.asInstanceOf[ArrayData]; val aV = av.asInstanceOf[ArrayData]
    val bI = bi.asInstanceOf[ArrayData]; val bV = bv.asInstanceOf[ArrayData]
    val la = math.min(aI.numElements(), aV.numElements())
    val lb = math.min(bI.numElements(), bV.numElements())
    var ia = 0; var ib = 0
    var n = 0.0; var sx = 0.0; var sy = 0.0
    var sxx = 0.0; var syy = 0.0; var sxy = 0.0
    while (ia < la && ib < lb) {
      if (aI.isNullAt(ia) || aV.isNullAt(ia)) ia += 1
      else if (bI.isNullAt(ib) || bV.isNullAt(ib)) ib += 1
      else {
        val da = aI.getInt(ia); val db = bI.getInt(ib)
        if (da < db) ia += 1
        else if (db < da) ib += 1
        else {
          val x = aV.getDouble(ia); val y = bV.getDouble(ib)
          n += 1.0; sx += x; sy += y
          sxx += x * x; syy += y * y; sxy += x * y
          ia += 1; ib += 1
        }
      }
    }
    if (n < minDays) null
    else {
      val cden = math.sqrt((sxx - sx * sx / n) * (syy - sy * sy / n))
      if (!(cden > 0)) null
      else new GenericArrayData(
        Array[Double](n, (sxy - sx * sy / n) / cden))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (ai, av, bi, bv) => {
      val la = ctx.freshName("la"); val lb = ctx.freshName("lb")
      val ia = ctx.freshName("ia"); val ib = ctx.freshName("ib")
      val da = ctx.freshName("da"); val db = ctx.freshName("db")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val n = ctx.freshName("n"); val sx = ctx.freshName("sx")
      val sy = ctx.freshName("sy"); val sxx = ctx.freshName("sxx")
      val syy = ctx.freshName("syy"); val sxy = ctx.freshName("sxy")
      val cden = ctx.freshName("cden")
      s"""
         |int $la = java.lang.Math.min($ai.numElements(), $av.numElements());
         |int $lb = java.lang.Math.min($bi.numElements(), $bv.numElements());
         |int $ia = 0, $ib = 0;
         |double $n = 0.0, $sx = 0.0, $sy = 0.0;
         |double $sxx = 0.0, $syy = 0.0, $sxy = 0.0;
         |while ($ia < $la && $ib < $lb) {
         |  if ($ai.isNullAt($ia) || $av.isNullAt($ia)) { $ia++; }
         |  else if ($bi.isNullAt($ib) || $bv.isNullAt($ib)) { $ib++; }
         |  else {
         |    int $da = $ai.getInt($ia);
         |    int $db = $bi.getInt($ib);
         |    if ($da < $db) { $ia++; }
         |    else if ($db < $da) { $ib++; }
         |    else {
         |      double $x = $av.getDouble($ia);
         |      double $y = $bv.getDouble($ib);
         |      $n += 1.0; $sx += $x; $sy += $y;
         |      $sxx += $x * $x; $syy += $y * $y; $sxy += $x * $y;
         |      $ia++; $ib++;
         |    }
         |  }
         |}
         |if ($n < $minDays) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $cden = java.lang.Math.sqrt(
         |    ($sxx - $sx * $sx / $n) * ($syy - $sy * $sy / $n));
         |  if (!($cden > 0)) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |      new double[]{$n, ($sxy - $sx * $sy / $n) / $cden});
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression,
      newFourth: Expression): Expression =
    copy(aIdx = newFirst, aVal = newSecond, bIdx = newThird, bVal = newFourth)
}

object PairCorr {
  /** Column API: `[n, corr]` over common indices of two index-sorted
    * sparse series, NULL when fewer than `minDays` common positions
    * or either side is constant.
    */
  def pair_corr(aIdx: Column, aVal: Column, bIdx: Column, bVal: Column,
      minDays: Int): Column =
    GraftShim.column(PairCorr(GraftShim.expression(aIdx),
      GraftShim.expression(aVal), GraftShim.expression(bIdx),
      GraftShim.expression(bVal), minDays))
}
