package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** K-minimum-values (KMV) distinct-count sketch as a native
  * `TypedImperativeAggregate`: the aggregation state is the `k` smallest
  * DISTINCT hash values seen so far — a bounded TreeSet, never more than
  * `k` longs — so the partial/final split Spark applies to every
  * aggregate gives the textbook distributed sketch for free: each map
  * task clamps its partition to ≤ k values, the exchange carries one
  * k-long sketch per task (NOT the distinct keys, which is what an exact
  * `count(distinct)` shuffles), and merge is a set-union re-clamp.
  * Estimate: distinct ≈ (k−1) / r_k with r_k the k-th smallest hash
  * normalized to [0, 1) — Beyer et al., "On Synopses for Distinct-Value
  * Estimation Under Multiset Operations" (SIGMOD'07).
  *
  * Input is the engine's deterministic 60-bit hash ([[DetHash.base60]]),
  * so unlike HLL++ (`approx_count_distinct`, engine-specific sketch) the
  * whole estimate is bit-reproducible in the DuckDB oracle: the k-th
  * smallest distinct md5-derived hash is plain SQL.
  *
  * Sketches are mergeable across unions of datasets (merge = TreeSet
  * union + clamp), the property that lets 100 TB cardinality roll up
  * from per-partition/per-day sketches without re-reading data.
  */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k > 1, "KMV needs k > 1")

  override def prettyName: String = "kmv_sketch"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires bigint input (a [[DetHash.base60]] hash), got ${other.sql}")
  }

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def insert(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit =
    if (buf.size < k || h < buf.last) {
      if (buf.add(h) && buf.size > k) buf.pollLast()
    }

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
                     other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) insert(buf, it.next())
    buf
  }

  /** Ascending array of the sketch's hashes (TreeSet iterates sorted). */
  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    ArrayData.toArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketchAgg =
    copy(child = newChild)
}

object KmvSketch {
  /** Column API: the k-smallest-distinct-hashes sketch of a long hash
    * column, as an ascending `array<bigint>`.
    */
  def column(hash: Column, k: Int): Column =
    GraftShim.column(KmvSketchAgg(GraftShim.expression(hash), k).toAggregateExpression())
}
