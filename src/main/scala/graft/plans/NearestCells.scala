package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types._

/** Native IVF cell assignment: the `n` nearest centroid ids for one
  * vector, in one primitive pass — the per-row core of
  * [[graft.ops.Similarity]]'s `nearestCells`.
  *
  * `cents` is the bounded centroid array (struct(cid LONG, centv ARRAY),
  * broadcast as a one-row cross join, so the plan stays lazy); output is
  * ARRAY<BIGINT> of the chosen cell ids in rank order. The declarative
  * twin — transform + struct + array_sort with a comparator lambda —
  * evaluates an interpreted when-chain per comparison and allocates a
  * struct per centroid per row, which measured ~20 us/row at 16 cells;
  * this loop is the same arithmetic without the per-element machinery.
  *
  * Ordering contract (bit-identical to the HOF form it replaces, which
  * the IVF-family oracles replay): distance = sqrt of the left-to-right
  * (x-y)^2 double fold ([[L2Sq]]'s contract — null array, null element
  * or length mismatch -> null distance; NaN folds to null); rank by
  * distance asc, null distances last, ties by cid asc. A fully
  * degenerate vector therefore still lands in the lowest cent_ids.
  */
case class NearestCells(vec: Expression, cents: Expression, n: Expression)
    extends TernaryExpression with CodegenFallback {

  override def first: Expression = vec
  override def second: Expression = cents
  override def third: Expression = n
  override def prettyName: String = "nearest_cells"

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  @transient private lazy val vecIsFloat =
    vec.dataType.asInstanceOf[ArrayType].elementType == FloatType
  @transient private lazy val centIsFloat = {
    val st = cents.dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType]
    st(1).dataType.asInstanceOf[ArrayType].elementType == FloatType
  }

  override def eval(input: InternalRow): Any = {
    val centsV = cents.eval(input)
    if (centsV == null) return null
    val nV = n.eval(input)
    if (nV == null) return null
    val take = nV.asInstanceOf[Number].intValue()
    val vecV = vec.eval(input) // null vector -> every distance null
    val x = vecV.asInstanceOf[ArrayData]
    val ca = centsV.asInstanceOf[ArrayData]
    val m = ca.numElements()
    val dist = new Array[Double](m)
    val isNullD = new Array[Boolean](m)
    val cid = new Array[Long](m)
    var i = 0
    while (i < m) {
      val s = ca.getStruct(i, 2)
      cid(i) = s.getLong(0)
      val cv = if (s.isNullAt(1)) null else s.getArray(1)
      var d = Double.NaN
      var dNull = true
      if (x != null && cv != null && x.numElements() == cv.numElements()) {
        var acc = 0.0
        var ok = true
        var j = 0
        val len = x.numElements()
        while (ok && j < len) {
          if (x.isNullAt(j) || cv.isNullAt(j)) ok = false
          else {
            val xj = if (vecIsFloat) x.getFloat(j).toDouble else x.getDouble(j)
            val yj = if (centIsFloat) cv.getFloat(j).toDouble else cv.getDouble(j)
            val dd = xj - yj
            acc += dd * dd
            j += 1
          }
        }
        if (ok) {
          d = math.sqrt(acc)
          dNull = d.isNaN // NaN input elements fold to null, like the HOF twin
        }
      }
      dist(i) = d; isNullD(i) = dNull
      i += 1
    }
    // rank: distance asc, nulls last, ties cid asc (selection over <=m ids)
    val idx = Array.range(0, m)
    val ord = new Ordering[Int] {
      override def compare(a: Int, b: Int): Int = {
        if (isNullD(a) && isNullD(b)) java.lang.Long.compare(cid(a), cid(b))
        else if (isNullD(a)) 1
        else if (isNullD(b)) -1
        else {
          val c = java.lang.Double.compare(dist(a), dist(b))
          if (c != 0) c else java.lang.Long.compare(cid(a), cid(b))
        }
      }
    }
    scala.util.Sorting.stableSort(idx)(ord)
    // clamp below at 0: `n` is a public Column input, and a negative value
    // must yield an empty assignment, not a NegativeArraySizeException
    val k = math.max(0, math.min(take, m))
    val out = new Array[Long](k)
    var o = 0
    while (o < k) { out(o) = cid(idx(o)); o += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): NearestCells =
    copy(vec = newFirst, cents = newSecond, n = newThird)
}

object NearestCells {
  def apply(vec: Column, cents: Column, n: Column): Column =
    GraftBridge.column(NearestCells(GraftBridge.expression(vec),
      GraftBridge.expression(cents), GraftBridge.expression(n)))
}
