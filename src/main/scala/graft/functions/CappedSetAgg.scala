package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Mutable buffer for [[CappedSetAggExpr]]: distinct (id, tag) pairs
  * up to `cap`; the moment a (cap+1)-th DISTINCT id arrives the group
  * is HOT — the flag is kept and members stop accumulating, so the
  * buffer is bounded at cap entries no matter how many rows (or how
  * many distinct ids) the group really has. Linear containment is
  * fine: cap is a small constant (the dedup df-cap), not data-sized. */
final class CappedSetBuffer(cap: Int) {
  val ids = new Array[Long](cap)
  val tags = new Array[Long](cap)
  var n = 0
  var hot = false

  def add(id: Long, tag: Long): Unit = {
    if (!hot) {
      var i = 0
      while (i < n) { if (ids(i) == id) return; i += 1 }
      if (n == ids.length) hot = true
      else { ids(n) = id; tags(n) = tag; n += 1 }
    }
  }
}

/** Capped distinct-set-with-overflow aggregate: collects the distinct
  * (id, tag) members of a group — up to `cap` of them — and reports
  * whether the group overflowed (`hot`), in ONE aggregation pass.
  *
  * This fuses what the posting-list dedup pipeline previously needed
  * three shuffles for: a count-only pass to find hot grams (df > cap),
  * an anti-join to exclude them, and a collect_set of the survivors.
  * The cap bounds every aggregation buffer by construction (a
  * stop-gram shared by 10^8 docs costs cap entries + a flag, never a
  * 10^8-element array), and partial buffers ride Spark's ordinary
  * map-side combine — at scale the shuffle moves ≤ cap entries per
  * group per mapper. Hot groups evaluate to an empty member list +
  * hot=true: callers re-derive hot-group members from the base
  * relation, which is exactly what the count-first design did too. */
case class CappedSetAggExpr(
    id: Expression,
    tag: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CappedSetBuffer] {

  override def children: Seq[Expression] = Seq(id, tag)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_capped_set"

  private val memberType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("nsh", LongType, nullable = false)))

  override def dataType: DataType = StructType(Seq(
    StructField("ds", ArrayType(memberType, containsNull = false), nullable = false),
    StructField("hot", BooleanType, nullable = false)))

  override def createAggregationBuffer(): CappedSetBuffer = new CappedSetBuffer(cap)

  override def update(buf: CappedSetBuffer, input: InternalRow): CappedSetBuffer = {
    val idV = id.eval(input)
    if (idV != null) {
      val tagV = tag.eval(input)
      buf.add(idV.asInstanceOf[Long], if (tagV == null) 0L else tagV.asInstanceOf[Long])
    }
    buf
  }

  override def merge(b1: CappedSetBuffer, b2: CappedSetBuffer): CappedSetBuffer = {
    if (b2.hot) b1.hot = true
    var i = 0
    while (i < b2.n && !b1.hot) { b1.add(b2.ids(i), b2.tags(i)); i += 1 }
    b1
  }

  override def eval(buf: CappedSetBuffer): Any = {
    val members: Array[Any] =
      if (buf.hot) Array.empty
      else Array.tabulate[Any](buf.n)(i =>
        new GenericInternalRow(Array[Any](buf.ids(i), buf.tags(i))))
    new GenericInternalRow(Array[Any](new GenericArrayData(members), buf.hot))
  }

  override def serialize(buf: CappedSetBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(1 + 4 + 16 * buf.n)
    bb.put(if (buf.hot) 1.toByte else 0.toByte)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putLong(buf.ids(i)); bb.putLong(buf.tags(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CappedSetBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new CappedSetBuffer(cap)
    buf.hot = bb.get() == 1.toByte
    val n = bb.getInt()
    var i = 0
    while (i < n) { buf.ids(i) = bb.getLong(); buf.tags(i) = bb.getLong(); i += 1 }
    buf.n = n
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): CappedSetAggExpr =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CappedSetAggExpr =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): CappedSetAggExpr =
    copy(id = cs(0), tag = cs(1))
}

object CappedSetAgg {
  /** Column API: `df.groupBy(...).agg(CappedSetAgg(col("doc_id"), col("nsh"), 32))`.
    * Both columns must be LongType. */
  def apply(id: Column, tag: Column, cap: Int): Column =
    ColumnBridge.column(
      CappedSetAggExpr(ColumnBridge.expression(id), ColumnBridge.expression(tag), cap)
        .toAggregateExpression())
}
