package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** FNV-1a 64-bit hash utilities, codegen-callable (static methods). */
object FnvHashUtil {
  final val Prime = 0x100000001b3L
  final val Seed = 0xcbf29ce484222325L

  def hashBytes(bytes: Array[Byte]): Long = {
    var h = Seed
    var i = 0
    while (i < bytes.length) { h = (h ^ (bytes(i) & 0xffL)) * Prime; i += 1 }
    h
  }
  def hashUtf8(s: UTF8String): Long = hashBytes(s.getBytes)
  def hashRange(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = Seed
    var i = from
    while (i < until) { h = (h ^ (bytes(i) & 0xffL)) * Prime; i += 1 }
    h
  }
  // Fixed-width numerics hash their little-endian representation, matching
  // the byte-image hashing the reference's builtin registry declares for
  // fnv_hash over each primitive type (catalog/BuiltinsDb.java:48-61).
  def hashLong(v: Long, width: Int): Long = {
    var h = Seed
    var i = 0
    while (i < width) { h = (h ^ ((v >>> (8 * i)) & 0xffL)) * Prime; i += 1 }
    h
  }
  def hashDouble(v: Double): Long = hashLong(java.lang.Double.doubleToLongBits(v), 8)
  def hashFloat(v: Float): Long = hashLong(java.lang.Float.floatToIntBits(v).toLong & 0xffffffffL, 4)

  /** Impala stores DECIMAL(p,s) as a little-endian 4/8/16-byte two's
    * complement integer of the unscaled value (Decimal4/8/16Value; the
    * builtin registry declares fnv_hash over each width,
    * catalog/BuiltinsDb.java:48-61). This byte image is the single
    * source of truth for every hash function over decimals. */
  def decimalImage(d: org.apache.spark.sql.types.Decimal, precision: Int): Array[Byte] = {
    val width = if (precision <= 9) 4 else if (precision <= 18) 8 else 16
    val b = new Array[Byte](width)
    if (width <= 8) {
      val v = d.toUnscaledLong
      var i = 0
      while (i < width) { b(i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
    } else {
      val bi = d.toJavaBigDecimal.unscaledValue()
      val lo = bi.longValue()
      val hi = bi.shiftRight(64).longValue()
      var i = 0
      while (i < 8) { b(i) = ((lo >>> (8 * i)) & 0xff).toByte; i += 1 }
      while (i < 16) { b(i) = ((hi >>> (8 * (i - 8))) & 0xff).toByte; i += 1 }
    }
    b
  }

  def hashDecimal(d: org.apache.spark.sql.types.Decimal, precision: Int): Long =
    hashBytes(decimalImage(d, precision))
}

/** `fnv_hash(expr)` — Impala's FNV-1a hash builtin
  * (reference: catalog/BuiltinsDb.java:48-61 registers it per primitive
  * type). Whole-stage-codegen friendly via static helper calls. */
case class FnvHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(v: Any): Any = child.dataType match {
    case StringType => FnvHashUtil.hashUtf8(v.asInstanceOf[UTF8String])
    case BinaryType => FnvHashUtil.hashBytes(v.asInstanceOf[Array[Byte]])
    case BooleanType => FnvHashUtil.hashLong(if (v.asInstanceOf[Boolean]) 1L else 0L, 1)
    case ByteType => FnvHashUtil.hashLong(v.asInstanceOf[Byte].toLong, 1)
    case ShortType => FnvHashUtil.hashLong(v.asInstanceOf[Short].toLong, 2)
    case IntegerType | DateType => FnvHashUtil.hashLong(v.asInstanceOf[Int].toLong, 4)
    // Timestamps hash their 8-byte microsecond value. Documented divergence:
    // Impala's BE hashes its 16-byte boost TimestampValue layout (not
    // defined in the frontend-only reference repo), so timestamp hash
    // values differ from Impala while remaining stable within this engine.
    case LongType | TimestampType | TimestampNTZType => FnvHashUtil.hashLong(v.asInstanceOf[Long], 8)
    case FloatType => FnvHashUtil.hashFloat(v.asInstanceOf[Float])
    case DoubleType => FnvHashUtil.hashDouble(v.asInstanceOf[Double])
    case d: DecimalType => FnvHashUtil.hashDecimal(v.asInstanceOf[Decimal], d.precision)
    case other => throw new UnsupportedOperationException(s"fnv_hash: $other")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // static forwarders on the companion class — janino can't resolve the
    // Scala MODULE$ field through the dollar-suffixed object class name
    val u = "graft.functions.FnvHashUtil"
    val call: String => String = child.dataType match {
      case StringType => c => s"$u.hashUtf8($c)"
      case BinaryType => c => s"$u.hashBytes($c)"
      case BooleanType => c => s"$u.hashLong($c ? 1L : 0L, 1)"
      case ByteType => c => s"$u.hashLong((long)$c, 1)"
      case ShortType => c => s"$u.hashLong((long)$c, 2)"
      case IntegerType | DateType => c => s"$u.hashLong((long)$c, 4)"
      case LongType | TimestampType | TimestampNTZType => c => s"$u.hashLong($c, 8)"
      case FloatType => c => s"$u.hashFloat($c)"
      case DoubleType => c => s"$u.hashDouble($c)"
      case d: DecimalType =>
        c => s"$u.hashDecimal($c, ${d.precision})"
      case other => throw new UnsupportedOperationException(s"fnv_hash: $other")
    }
    defineCodeGen(ctx, ev, call)
  }

  override protected def withNewChildInternal(newChild: Expression): FnvHash = copy(newChild)
  override def prettyName: String = "fnv_hash"
}
