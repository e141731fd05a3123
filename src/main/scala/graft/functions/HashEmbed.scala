package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All `dims` signed feature-hash counts of a token array in ONE pass —
  * the fused form of the explode → (doc_id, dim) groupBy → reassembly
  * pipeline in [[graft.operators.TextAnalysis.hashEmbeddingSketch]].
  *
  * Why fuse: the agg formulation is the right shape when a document's
  * token stream is wider than a row can hold, but for per-document
  * embedding it pays TWO shuffles ((doc_id, dim) partial sums, then the
  * (doc_id) reassembly) for what is per-row arithmetic. This expression
  * turns the whole embedding into a scan-fused projection: zero
  * exchanges at any corpus size, one md5 per token, one primitive
  * long[dims] accumulator per row.
  *
  * Math is BIT-IDENTICAL to the agg path, which remains the constant
  * source of truth for the DuckDB oracle: dim = low log2(dims) bits of
  * [[DetHash.base60]] (the same JVM md5 the `conv(substring(md5...)))`
  * expression computes — spec-pinned equal), sign = bit log2(dims).
  * Null tokens contribute nothing (the agg path filters them at the
  * generator output). One honest difference, documented at the call
  * sites: a document with NO surviving dims yields the all-zero counts
  * array here, where the agg path's group never forms.
  */
case class HashEmbedCounts(child: Expression, dims: Int)
    extends UnaryExpression {
  require(dims > 0 && (dims & (dims - 1)) == 0, "dims must be a power of two")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hash_embed_counts"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${other.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    HashEmbedMath.counts(v.asInstanceOf[ArrayData], dims)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.HashEmbedMath.counts($v, $dims);")

  override protected def withNewChildInternal(newChild: Expression): HashEmbedCounts =
    copy(child = newChild)
}

/** Static core of [[HashEmbedCounts]] (shared by eval and generated code). */
object HashEmbedMath {
  def counts(tokens: ArrayData, dims: Int): ArrayData = {
    val out = new Array[Long](dims)
    val mask = dims - 1
    val shift = java.lang.Integer.numberOfTrailingZeros(dims)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = DetHash.base60(tokens.getUTF8String(i).toString)
        out((h & mask).toInt) += (if (((h >> shift) & 1L) == 0L) 1L else -1L)
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

object HashEmbed {
  /** Column wrapper: `array<string>` tokens → `array<long>` dims counts. */
  def hashEmbedCounts(tokens: Column, dims: Int): Column =
    GraftShim.column(HashEmbedCounts(GraftShim.expression(tokens), dims))
}
