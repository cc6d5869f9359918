package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** One-pass k-wide MinHash signature as a native imperative aggregate
  * (the third custom-extension class alongside the scalar Expressions
  * and the TopKPerKey physical operator): the mutable buffer is the
  * k-vector of minima, updated per shingle, merged element-wise — one
  * aggregation pass instead of k parallel min() columns, and the
  * partial buffers ride Spark's ordinary partial-aggregation
  * machinery (map-side combine before the shuffle).
  *
  * Hash recurrence is exactly `xxhash64(shingle, seed)`:
  * hash(seedInt, hash(input, 42)) over the input's own type — so
  * signatures are bit-equal to a k-column min() formulation over the
  * SAME input (spec: MinHashAggSpec). dedup_minhash_lsh feeds it
  * xxhash64-hashed gram LONGS (8-byte shuffle keys), not the gram
  * strings.
  */
case class MinHashAggExpr(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  override def createAggregationBuffer(): Array[Long] = Array.fill(k)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val base = XxHash64Function.hash(v, child.dataType, 42L)
      var s = 0
      while (s < k) {
        // seed literals in the columnar form are Int → hash as IntegerType
        val h = XxHash64Function.hash(s, IntegerType, base)
        if (h < buf(s)) buf(s) = h
        s += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * k)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(o: Int): MinHashAggExpr =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashAggExpr =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): MinHashAggExpr =
    copy(child = cs.head)
}

object MinHashAgg {
  /** Column API: `df.groupBy("doc_id").agg(MinHashAgg(col("sh"), 64))`. */
  def apply(shingle: Column, k: Int): Column =
    ColumnBridge.column(
      MinHashAggExpr(ColumnBridge.expression(shingle), k).toAggregateExpression())
}
