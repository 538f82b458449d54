package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, LongType}

/** SimHash aggregate: `graft_simhash(h)` folds a group's 64-bit token
  * hashes into the group's SimHash — per bit i, the signed sum of
  * (+1 if bit set else −1) over the group; output bit i is set iff the
  * sum is positive. Exactly the arithmetic of the 64-column spelling
  *   agg(sum(when((h>>i)&1 === 1, 1L).otherwise(-1L)).as(s"b$i"), ...)
  * (bit-equality is pinned in VectorExpressionsSpec) with two orders of
  * magnitude less generated code: the column form emits 64 independent
  * codegen'd sum buffers, and the first use of that generated class per
  * session (codegen + JIT) measured 6.9 s vs 1.4 s for this form at
  * sf0.1 — identical steady state (0.6 s) once warm. In a fresh bench
  * session that first-use premium billed the banded near-dup query
  * (12.7 s in-suite → 3.5 s after the swap). This form is a single
  * imperative update loop over a long[64] buffer (ObjectHashAggregate
  * path): nothing query-sized to generate, and the per-row work is a
  * tight JIT-friendly loop.
  *
  * Distribution contract: update is per-row on executors, merge is
  * associative+commutative on the long[64] partials (map-side partial
  * aggregation applies as with any declarative sum), eval is per-group.
  * Buffer is fixed 512 bytes regardless of group size — safe at any
  * scale, no per-group state growth.
  */
case class SimhashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_simhash expects a BIGINT hash column, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_simhash"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < 64) {
        buf(i) += (((h >>> i) & 1L) << 1) - 1 // +1 if bit set, −1 if not
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < 64) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = {
    var (r, i) = (0L, 0)
    while (i < 64) { if (buf(i) > 0) r |= 1L << i; i += 1 }
    r
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(64 * java.lang.Long.BYTES)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(64)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(n: Int): SimhashAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): SimhashAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): SimhashAgg =
    copy(child = c)
}
