package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded bottom-k DISTINCT (key, id) aggregate with a carried payload —
  * the KMV register builder's partial ([[graft.functions.Sketches]]): per
  * group, the k lexicographically smallest distinct (kmv_key, kmv_id)
  * pairs, each carrying a long payload (a weight; `1` when unused),
  * returned as a sorted `array<struct<kmv_key, kmv_id, kmv_w>>`.
  *
  * The point is the MEMORY BOUND, by construction (VERDICT r13 item 4):
  * the former `collect_set -> array_sort -> slice` partial materialized
  * every partition-local distinct id before the k-cut — an O(partition
  * distinct) array on a skewed single-group partition. This aggregate's
  * state is a capped ordered map that never holds more than k entries at
  * ANY stage: map-side partial aggregation inserts-with-eviction row by
  * row (O(log k) per row), the shuffled partial is k entries, and merge
  * re-inserts under the same cap — O(k) per group end to end, independent
  * of how many rows or distinct ids a partition holds. That is the 100 TB
  * shape: a single hash aggregate whose partials bound both memory and
  * shuffle bytes, with no `spark_partition_id` two-level dance.
  *
  * Semantics are EXACTLY the bottom-k law the window replay defines
  * (bottomK of a union == bottomK of bottomK's — FunctionsSpec pins the
  * output against the ordered-window reference): dedup is by (key, id);
  * the payload rides along and must be a stable function of the id (the
  * weighted-KMV contract — equal pairs keep the first payload seen).
  * NULL key/id rows are skipped (callers filter; belt and braces here
  * keeps the cap arithmetic honest); a NULL payload reads as 1.
  *
  * Not codegen'd: aggregation buffers of object type run on the
  * ObjectHashAggregate path, which is exactly what a TypedImperativeAggregate
  * asks for — the per-row work is a tree insert, not an expression eval.
  */
case class BottomKPairs(
    first: Expression,   // key (string)
    second: Expression,  // id (string)
    third: Expression,   // payload (long; lit(1L) when unused)
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeMap[(String, String), Long]]
  with TernaryLike[Expression] {

  require(k >= 1 && k <= (1 << 20), s"bottomK k out of range: $k")

  override def prettyName: String = "bottom_k_pairs"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("kmv_key", StringType, nullable = false),
    StructField("kmv_id", StringType, nullable = false),
    StructField("kmv_w", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): mutable.TreeMap[(String, String), Long] =
    mutable.TreeMap.empty[(String, String), Long]

  /** Insert under the cap: reject without touching the tree when the pair
    * cannot enter (>= the current kth and the buffer is full) — on sorted
    * or mostly-duplicate input most rows take this O(log k) compare-only
    * path and the tree never churns.
    */
  private def insert(buf: mutable.TreeMap[(String, String), Long],
      pair: (String, String), w: Long): Unit = {
    if (buf.size < k) { if (!buf.contains(pair)) buf.update(pair, w) }
    else {
      val last = buf.lastKey
      val c = Ordering[(String, String)].compare(pair, last)
      if (c < 0 && !buf.contains(pair)) {
        buf.update(pair, w)
        buf.remove(buf.lastKey)
      }
      // c >= 0: equal pair is already present; a larger pair can't enter
    }
  }

  override def update(buf: mutable.TreeMap[(String, String), Long],
      input: InternalRow): mutable.TreeMap[(String, String), Long] = {
    val kv = first.eval(input)
    val id = second.eval(input)
    if (kv != null && id != null) {
      val w = third.eval(input) match { case null => 1L; case x: Long => x }
      insert(buf, (kv.asInstanceOf[UTF8String].toString,
        id.asInstanceOf[UTF8String].toString), w)
    }
    buf
  }

  override def merge(buf: mutable.TreeMap[(String, String), Long],
      other: mutable.TreeMap[(String, String), Long]): mutable.TreeMap[(String, String), Long] = {
    other.foreach { case (pair, w) => insert(buf, pair, w) }
    buf
  }

  override def eval(buf: mutable.TreeMap[(String, String), Long]): Any =
    new GenericArrayData(buf.iterator.map { case ((kv, id), w) =>
      InternalRow(UTF8String.fromString(kv), UTF8String.fromString(id), w)
    }.toArray[Any])

  override def serialize(buf: mutable.TreeMap[(String, String), Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case ((kv, id), w) =>
      // length-prefixed UTF-8 (writeUTF caps at 64 KiB — ids may be long)
      Seq(kv, id).foreach { s =>
        val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        out.writeInt(b.length); out.write(b)
      }
      out.writeLong(w)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeMap[(String, String), Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    (0 until n).foreach { _ =>
      def str(): String = {
        val b = new Array[Byte](in.readInt()); in.readFully(b)
        new String(b, java.nio.charset.StandardCharsets.UTF_8)
      }
      val kv = str(); val id = str()
      buf.update((kv, id), in.readLong())
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): BottomKPairs =
    copy(first = newFirst, second = newSecond, third = newThird)
}
