package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native two-level IVF cell ranking — the corpus-side hot loop of the
  * trained-quantizer family (s20/s21/s22 search, d08 semantic dedup).
  *
  * The composed form ranks cells with interpreted higher-order
  * functions: `array_sort(transform(groups, g -> struct(key(g), ...)))`
  * allocates a struct and evaluates an interpreted expression tree per
  * CENTROID per row — at corpus-scaled K that is O(√K + probes·√K)
  * struct allocations and interpreter dispatches per corpus row, and
  * HOF lambdas block whole-stage codegen around them (the same class of
  * overhead that motivated [[DotProduct]] in round 5 and the t24
  * pair-builder fix this round). This expression runs the identical
  * selection as tight primitive loops over the broadcast's ArrayData.
  *
  * Bit-exact contract (the DuckDB oracles hash-match on it):
  *   - distances/keys use the SAME arithmetic as the Column forms:
  *     l2 = (dot(v,v) - 2.0*dot(v,cv)) + dot(cv,cv), each dot the
  *     left-to-right fold; negcos = -(dot(v,cv)/(nrm*cnrm)) with the
  *     zero-norm guard flipping to +1e308 (ranks last) — exactly
  *     Similarity.l2Key / SemDedup.negGuardedCos;
  *   - comparisons use SQL double semantics (-0.0 == 0.0; keys are
  *     never NaN — the guard precludes it), ties break on the id
  *     ascending — exactly `array_sort`'s struct order and the
  *     oracle's ORDER BY key, id;
  *   - the group cut happens BEFORE cell ranking: top `coarseProbes`
  *     groups by (key, gid), then top `probes` cells by (key, cid)
  *     among those groups' members — exactly the nested slice of the
  *     composed form.
  *
  * Returns the ranked cell ids (ascending rank; length ≤ probes; empty
  * for an empty codebook — `try_element_at(_, 1)` then yields the same
  * null the composed assign face produced). Null on null inputs.
  */
case class TwoLevelRankCells(v: Expression, nrm: Expression, groups: Expression,
    metric: String, coarseProbes: Int, probes: Int)
    extends Expression with Serializable {

  override def children: Seq[Expression] = Seq(v, nrm, groups)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def doubles(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _                        => false
    }
    val groupsOk = groups.dataType match {
      case ArrayType(StructType(Array(g0, g1, g2, g3)), _) =>
        g0.dataType == LongType && doubles(g1.dataType) && g2.dataType == DoubleType &&
          (g3.dataType match {
            case ArrayType(StructType(Array(c0, c1, c2)), _) =>
              c0.dataType == LongType && doubles(c1.dataType) && c2.dataType == DoubleType
            case _ => false
          })
      case _ => false
    }
    if (doubles(v.dataType) && nrm.dataType == DoubleType && groupsOk &&
        (metric == "l2" || metric == "negcos") && coarseProbes > 0 && probes > 0)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "rank_cells_two_level expects (array<double>, double, " +
        "array<struct<gid:bigint,gv:array<double>,gnrm:double," +
        "members:array<struct<cid:bigint,cv:array<double>,cnrm:double>>>>) " +
        s"with metric l2|negcos; got (${v.dataType}, ${nrm.dataType}, ${groups.dataType}, $metric)")
  }

  /** SQL double comparison: -0.0 == 0.0 (SQLOrderingUtil's contract).
    * Keys are never NaN on the sanctioned inputs (the negcos guard maps
    * degenerate norms to +1e308 and l2 sums of finite products stay
    * finite), but the comparator is TOTAL anyway: a NaN produced by an
    * Inf/NaN corpus vector falls through to `java.lang.Double.compare`,
    * which sorts NaN largest — exactly SQLOrderingUtil / `array_sort` /
    * the oracle's ORDER BY, so selection can never become
    * comparator-order-dependent.
    */
  private def cmp(x: Double, y: Double): Int =
    if (x == y) 0 else if (x < y) -1 else if (x > y) 1
    else java.lang.Double.compare(x, y)

  private val isL2 = metric == "l2"

  private def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  private def key(varr: ArrayData, nv: Double, cv: ArrayData, cnrm: Double): Double =
    if (isL2) (dot(varr, varr) - 2.0 * dot(varr, cv)) + dot(cv, cv)
    else {
      val p = nv * cnrm
      if (p > 0) -(dot(varr, cv) / p) else 1e308
    }

  /** In-place partial selection of the first `take` positions of `idx`
    * ordered by (keys(idx), ids(idx)) ascending — selection sort over a
    * tiny prefix; total order because ids are unique.
    */
  private def selectTop(keys: Array[Double], ids: Array[Long], idx: Array[Int],
      take: Int): Unit = {
    val n = idx.length
    var a = 0
    while (a < take) {
      var best = a
      var b = a + 1
      while (b < n) {
        val c = cmp(keys(idx(b)), keys(idx(best)))
        if (c < 0 || (c == 0 && ids(idx(b)) < ids(idx(best)))) best = b
        b += 1
      }
      val t = idx(a); idx(a) = idx(best); idx(best) = t
      a += 1
    }
  }

  override def eval(input: InternalRow): Any = {
    val vAny = v.eval(input)
    val gAny = groups.eval(input)
    if (vAny == null || gAny == null) return null
    val nrmAny = nrm.eval(input)
    val nv = if (nrmAny == null) 0.0 else nrmAny.asInstanceOf[Double]
    rank(vAny.asInstanceOf[ArrayData], nv, gAny.asInstanceOf[ArrayData])
  }

  /** The compiled kernel — shared verbatim by interpreted eval and the
    * generated code (which invokes it through a codegen reference
    * object). Inputs are non-null; never returns null.
    */
  def rank(varr: ArrayData, nv: Double, garr: ArrayData): ArrayData = {
    val ng = garr.numElements()
    if (ng == 0) return new GenericArrayData(Array.empty[Any])
    // level 1: rank the coarse groups
    val gk = new Array[Double](ng)
    val gids = new Array[Long](ng)
    val gidx = Array.tabulate(ng)(identity)
    var i = 0
    while (i < ng) {
      val g = garr.getStruct(i, 4)
      gk(i) = key(varr, nv, g.getArray(1), g.getDouble(2))
      gids(i) = g.getLong(0)
      i += 1
    }
    val gTake = math.min(coarseProbes, ng)
    selectTop(gk, gids, gidx, gTake)
    // level 2: rank the selected groups' member cells
    var total = 0
    i = 0
    while (i < gTake) { total += garr.getStruct(gidx(i), 4).getArray(3).numElements(); i += 1 }
    val ck = new Array[Double](total)
    val cids = new Array[Long](total)
    val cidx = Array.tabulate(total)(identity)
    var o = 0
    i = 0
    while (i < gTake) {
      val members = garr.getStruct(gidx(i), 4).getArray(3)
      val nm = members.numElements()
      var j = 0
      while (j < nm) {
        val m = members.getStruct(j, 3)
        ck(o) = key(varr, nv, m.getArray(1), m.getDouble(2))
        cids(o) = m.getLong(0)
        j += 1; o += 1
      }
      i += 1
    }
    val cTake = math.min(probes, total)
    selectTop(ck, cids, cidx, cTake)
    val out = new Array[Any](cTake)
    i = 0
    while (i < cTake) { out(i) = cids(cidx(i)); i += 1 }
    new GenericArrayData(out)
  }

  /** Real codegen (no CodegenFallback): the containing stage stays inside
    * whole-stage codegen — s20/s21/s22/d08's corpus scans keep their
    * filter/project/scan fused — and the kernel itself runs as the
    * compiled [[rank]] method through a reference object, the same
    * technique Spark's own regexp/json expressions use for loops too
    * structured to inline as Java strings.
    */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = ctx.addReferenceObj("twoLevelRankKernel", this, classOf[TwoLevelRankCells].getName)
    val vG = v.genCode(ctx)
    val nG = nrm.genCode(ctx)
    val gG = groups.genCode(ctx)
    val nv = ctx.freshName("nv")
    val arrayCls = classOf[ArrayData].getName
    ev.copy(code =
      code"""
        ${vG.code}
        ${gG.code}
        boolean ${ev.isNull} = true;
        $arrayCls ${ev.value} = null;
        if (!${vG.isNull} && !${gG.isNull}) {
          ${nG.code}
          double $nv = ${nG.isNull} ? 0.0 : ${nG.value};
          ${ev.value} = $kernel.rank(${vG.value}, $nv, ${gG.value});
          ${ev.isNull} = false;
        }
      """)
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(v = newChildren(0), nrm = newChildren(1), groups = newChildren(2))
}

object RankFunctions {
  /** Ranked top-`probes` cell ids under a two-level nested-broadcast
    * codebook — see [[TwoLevelRankCells]].
    */
  def rank_cells_two_level(v: Column, nrm: Column, groups: Column,
      metric: String, coarseProbes: Int, probes: Int): Column =
    ColumnBridge.column(TwoLevelRankCells(
      ColumnBridge.expression(v), ColumnBridge.expression(nrm),
      ColumnBridge.expression(groups), metric, coarseProbes, probes))
}
