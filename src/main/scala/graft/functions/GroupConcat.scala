package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Impala `group_concat([DISTINCT] expr [, sep])`
  * (catalog/BuiltinsDb.java:928-950). The reference's element order is
  * undefined; this engine pins ascending order so results are identical
  * under any partitioning (SURVEY §7 hard part b). Implemented as a real
  * AggregateFunction (not an expression-builder rewrite) so the parser's
  * DISTINCT flag applies — `group_concat(DISTINCT x)` plans a distinct
  * aggregation like any builtin. */
case class GroupConcat(
    child: Expression,
    sep: Expression = Literal.create(", "),
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.ArrayList[UTF8String]] {
  // Callers register via ImpalaFunctions, which casts the child to string
  // (Impala group_concat accepts any arg by implicit cast); update()
  // assumes StringType input.

  private lazy val sepStr: String = sep match {
    case Literal(u: UTF8String, StringType) => u.toString
    case _ => throw new IllegalArgumentException("group_concat: separator must be a string literal")
  }

  override def children: Seq[Expression] = Seq(child, sep)
  override def nullable: Boolean = true
  override def dataType: DataType = StringType

  override def createAggregationBuffer(): java.util.ArrayList[UTF8String] =
    new java.util.ArrayList[UTF8String]()

  override def update(buf: java.util.ArrayList[UTF8String], input: InternalRow): java.util.ArrayList[UTF8String] = {
    val v = child.eval(input)
    // clone(): the eval result may be backed by a reused UnsafeRow buffer.
    if (v != null) buf.add(v.asInstanceOf[UTF8String].clone())
    buf
  }

  override def merge(buf: java.util.ArrayList[UTF8String], other: java.util.ArrayList[UTF8String]): java.util.ArrayList[UTF8String] = {
    buf.addAll(other); buf
  }

  override def eval(buf: java.util.ArrayList[UTF8String]): Any = {
    if (buf.isEmpty) return null
    // UTF8String.compareTo is unsigned-byte (binary/UTF-8) order — the
    // engine's binary collation, matching STRING_AGG ... ORDER BY in the
    // oracle; java.lang.String order (UTF-16 code units) diverges for
    // supplementary-plane characters.
    java.util.Collections.sort(buf)
    val sepU = UTF8String.fromString(sepStr)
    UTF8String.concatWs(sepU, buf.toArray(new Array[UTF8String](buf.size)): _*)
  }

  override def serialize(buf: java.util.ArrayList[UTF8String]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.forEach { s =>
      val b = s.getBytes
      out.writeInt(b.length)
      out.write(b)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.ArrayList[UTF8String] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new java.util.ArrayList[UTF8String](n)
    (1 to n).foreach { _ =>
      val b = new Array[Byte](in.readInt())
      in.readFully(b)
      buf.add(UTF8String.fromBytes(b))
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): GroupConcat = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): GroupConcat = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): GroupConcat =
    copy(child = c(0), sep = c(1))
  override def prettyName: String = "group_concat"
}
