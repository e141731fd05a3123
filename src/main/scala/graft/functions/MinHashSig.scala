package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** All MinHash signature slots of one base-hash array in a single pass —
  * the fused form of NumHashes `array_min(transform(hs, h → (h·aᵢ+bᵢ) %
  * P))` subtrees. The unfused form scans the shingle-hash array once PER
  * PERMUTATION and allocates an intermediate array each time; here one
  * loop over the elements updates all permutation minima in a primitive
  * long[] — the shingle array is read once per row total.
  *
  * Math is BIT-IDENTICAL to the unfused form (the (aᵢ, bᵢ) constants come
  * from the same [[DetHash]] derivations the DuckDB oracle SQL inlines):
  * h ∈ [0, P) and aᵢ < P keep h·aᵢ+bᵢ < 2⁶² (no overflow), and `%` on
  * non-negative longs equals `pmod`. Empty input (or all-null elements —
  * the unfused `transform` lowers null elements to null, which array_min
  * skips) yields the P sentinel per slot, exactly the `coalesce(..., P)`
  * of the unfused form.
  */
case class MinHashSlots(child: Expression, as: Array[Long], bs: Array[Long],
                        p: Long) extends UnaryExpression {
  require(as.length == bs.length && as.nonEmpty, "need matching (a, b) arrays")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_slots"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> input, got ${other.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    MinHashSlots.compute(v.asInstanceOf[ArrayData], as, bs, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("as", as, "long[]")
    val bRef = ctx.addReferenceObj("bs", bs, "long[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.MinHashSlots.compute($v, $aRef, $bRef, ${p}L);")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSlots =
    copy(child = newChild)
}

object MinHashSlots {
  def compute(hs: ArrayData, as: Array[Long], bs: Array[Long],
              p: Long): ArrayData = {
    val k = as.length
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, p) // sentinel: empty set → P per slot
    val n = hs.numElements()
    var i = 0
    while (i < n) {
      if (!hs.isNullAt(i)) {
        val h = hs.getLong(i)
        var j = 0
        while (j < k) {
          val v = (h * as(j) + bs(j)) % p
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    ArrayData.toArrayData(mins)
  }

  /** Column API: the NumHashes signature slots over a base-hash column. */
  def column(hs: Column, as: Array[Long], bs: Array[Long], p: Long): Column =
    GraftShim.column(MinHashSlots(GraftShim.expression(hs), as, bs, p))
}
