package graft.functions

import java.lang.reflect.{Method, Modifier}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.api.java.{UDF0, UDF1, UDF2, UDF3, UDF4}
import org.apache.spark.sql.types._

/** `CREATE FUNCTION ... AS '<class>'` — the Java-UDF DDL bridge
  * (hive/executor/UdfExecutor.java:61-290; CreateUdfStmt): resolves a
  * JVM class by name, binds the `evaluate` method matching the declared
  * signature by reflection, and registers it as a session UDF callable
  * from SQL. Two accepted forms:
  *
  *   CREATE FUNCTION name(STRING, INT) RETURNS STRING AS 'com.x.MyUdf'
  *   CREATE FUNCTION name AS 'com.x.MyUdf'   -- class must have exactly
  *                                           -- one evaluate() overload
  *
  * Matching follows the reference's conventions (UdfExecutor.getEvalMethod):
  * the method must be public, named `evaluate`, and its parameter/return
  * types must correspond to the declared SQL types (boxed or primitive
  * JVM numerics, java.lang.String for STRING). NULL handling is null-in →
  * null-out without invoking the method, so primitive-typed evaluate
  * signatures never see a null. DROP FUNCTION name unregisters.
  *
  * The invocation path is a Spark java UDF over boxed values — fine for
  * the DDL-compat surface; perf-critical engine functions are codegen'd
  * Catalyst expressions instead (ImpalaFunctions). */
object UdfDdl {

  private val CreateTyped =
    """(?is)\s*CREATE\s+FUNCTION\s+(\w+)\s*\(([^)]*)\)\s+RETURNS\s+(\w+)\s+AS\s+'([^']+)'\s*""".r
  private val CreateBare =
    """(?is)\s*CREATE\s+FUNCTION\s+(\w+)\s+AS\s+'([^']+)'\s*""".r
  private val Drop = """(?is)\s*DROP\s+FUNCTION\s+(?:IF\s+EXISTS\s+)?(\w+)\s*""".r

  /** Execute a CREATE/DROP FUNCTION statement. Returns the function name. */
  def apply(spark: SparkSession, ddl: String): String = ddl match {
    case CreateTyped(name, args, ret, cls) =>
      val argTypes = args.split(",").map(_.trim).filter(_.nonEmpty).map(sqlType)
      create(spark, name, cls, Some(argTypes.toSeq), sqlType(ret))
    case CreateBare(name, cls) =>
      create(spark, name, cls, None, NullType)
    case Drop(name) =>
      spark.sessionState.catalog.dropTempFunction(name, ignoreIfNotExists = true)
      name
    case other => throw new IllegalArgumentException(
      s"UdfDdl: not a CREATE/DROP FUNCTION statement: ${other.take(80)}")
  }

  private def sqlType(t: String): DataType = t.trim.toUpperCase match {
    case "STRING" | "VARCHAR" | "CHAR" => StringType
    case "TINYINT" => ByteType
    case "SMALLINT" => ShortType
    case "INT" | "INTEGER" => IntegerType
    case "BIGINT" => LongType
    case "FLOAT" => FloatType
    case "DOUBLE" => DoubleType
    case "BOOLEAN" => BooleanType
    case other => throw new IllegalArgumentException(s"UdfDdl: unsupported type $other")
  }

  /** JVM parameter classes acceptable for a SQL type (boxed or primitive,
    * the UdfExecutor convention). */
  private def jvmMatches(dt: DataType, c: Class[_]): Boolean = dt match {
    case StringType => c == classOf[String]
    case ByteType => c == classOf[java.lang.Byte] || c == java.lang.Byte.TYPE
    case ShortType => c == classOf[java.lang.Short] || c == java.lang.Short.TYPE
    case IntegerType => c == classOf[java.lang.Integer] || c == java.lang.Integer.TYPE
    case LongType => c == classOf[java.lang.Long] || c == java.lang.Long.TYPE
    case FloatType => c == classOf[java.lang.Float] || c == java.lang.Float.TYPE
    case DoubleType => c == classOf[java.lang.Double] || c == java.lang.Double.TYPE
    case BooleanType => c == classOf[java.lang.Boolean] || c == java.lang.Boolean.TYPE
    case _ => false
  }

  private def returnTypeOf(c: Class[_]): DataType = c match {
    case x if x == classOf[String] => StringType
    case x if x == classOf[java.lang.Byte] || x == java.lang.Byte.TYPE => ByteType
    case x if x == classOf[java.lang.Short] || x == java.lang.Short.TYPE => ShortType
    case x if x == classOf[java.lang.Integer] || x == java.lang.Integer.TYPE => IntegerType
    case x if x == classOf[java.lang.Long] || x == java.lang.Long.TYPE => LongType
    case x if x == classOf[java.lang.Float] || x == java.lang.Float.TYPE => FloatType
    case x if x == classOf[java.lang.Double] || x == java.lang.Double.TYPE => DoubleType
    case x if x == classOf[java.lang.Boolean] || x == java.lang.Boolean.TYPE => BooleanType
    case other => throw new IllegalArgumentException(
      s"UdfDdl: unsupported evaluate() return type $other")
  }

  private def create(spark: SparkSession, name: String, className: String,
      declared: Option[Seq[DataType]], declaredRet: DataType): String = {
    val cls = Class.forName(className)
    val candidates = cls.getMethods.toSeq
      .filter(m => m.getName == "evaluate" && Modifier.isPublic(m.getModifiers))
    if (candidates.isEmpty) throw new IllegalArgumentException(
      s"UdfDdl: $className has no public evaluate() method (UdfExecutor convention)")
    val method: Method = declared match {
      case Some(argTypes) =>
        candidates.find { m =>
          m.getParameterCount == argTypes.size &&
            m.getParameterTypes.toSeq.zip(argTypes).forall { case (c, dt) => jvmMatches(dt, c) }
        }.getOrElse(throw new IllegalArgumentException(
          s"UdfDdl: $className has no evaluate(${argTypes.map(_.simpleString).mkString(", ")})"))
      case None =>
        if (candidates.size > 1) throw new IllegalArgumentException(
          s"UdfDdl: $className has ${candidates.size} evaluate() overloads — " +
            "declare the signature: CREATE FUNCTION f(TYPE, ...) RETURNS TYPE AS '...'")
        candidates.head
    }
    val ret = declared match {
      case Some(_) =>
        val inferred = returnTypeOf(method.getReturnType)
        if (inferred != declaredRet) throw new IllegalArgumentException(
          s"UdfDdl: declared RETURNS ${declaredRet.simpleString} but evaluate() " +
            s"returns ${inferred.simpleString}")
        declaredRet
      case None => returnTypeOf(method.getReturnType)
    }
    val w = new ReflectiveUdf(className, method.getParameterTypes.map(_.getName))
    method.getParameterCount match {
      case 0 => spark.udf.register(name, new Call0(w), ret)
      case 1 => spark.udf.register(name, new Call1(w), ret)
      case 2 => spark.udf.register(name, new Call2(w), ret)
      case 3 => spark.udf.register(name, new Call3(w), ret)
      case 4 => spark.udf.register(name, new Call4(w), ret)
      case n => throw new IllegalArgumentException(
        s"UdfDdl: evaluate() arity $n not supported (max 4)")
    }
    name
  }

  /** Serializable invocation shim: java.lang.reflect.Method is not
    * serializable, so the UDF ships (class name, parameter type names)
    * and re-binds the method + a fresh instance lazily on each executor
    * (evaluate() is stateless by the Hive contract). */
  private final class ReflectiveUdf(className: String, paramTypeNames: Array[String])
    extends Serializable {
    @transient private lazy val method: Method = {
      val cls = Class.forName(className)
      cls.getMethods.find(m => m.getName == "evaluate" &&
        m.getParameterTypes.map(_.getName).sameElements(paramTypeNames)).get
    }
    @transient private lazy val instance: AnyRef =
      if (Modifier.isStatic(method.getModifiers)) null
      else Class.forName(className).getDeclaredConstructor().newInstance().asInstanceOf[AnyRef]
    /** Numeric widening to the declared parameter type — the analyzer
      * does not insert casts for opaque java UDFs, so an INT column bound
      * to a BIGINT parameter arrives as Integer and must be re-boxed. */
    private def coerce(a: AnyRef, t: String): AnyRef = a match {
      case n: java.lang.Number => t match {
        case "java.lang.Byte" | "byte" => java.lang.Byte.valueOf(n.byteValue())
        case "java.lang.Short" | "short" => java.lang.Short.valueOf(n.shortValue())
        case "java.lang.Integer" | "int" => java.lang.Integer.valueOf(n.intValue())
        case "java.lang.Long" | "long" => java.lang.Long.valueOf(n.longValue())
        case "java.lang.Float" | "float" => java.lang.Float.valueOf(n.floatValue())
        case "java.lang.Double" | "double" => java.lang.Double.valueOf(n.doubleValue())
        case _ => a
      }
      case _ => a
    }
    def invoke(args: AnyRef*): AnyRef =
      if (args.exists(_ == null)) null
      else method.invoke(instance,
        args.zip(paramTypeNames).map { case (a, t) => coerce(a, t) }: _*)
  }
  private final class Call0(w: ReflectiveUdf) extends UDF0[AnyRef] {
    override def call(): AnyRef = w.invoke()
  }
  private final class Call1(w: ReflectiveUdf) extends UDF1[AnyRef, AnyRef] {
    override def call(a: AnyRef): AnyRef = w.invoke(a)
  }
  private final class Call2(w: ReflectiveUdf) extends UDF2[AnyRef, AnyRef, AnyRef] {
    override def call(a: AnyRef, b: AnyRef): AnyRef = w.invoke(a, b)
  }
  private final class Call3(w: ReflectiveUdf) extends UDF3[AnyRef, AnyRef, AnyRef, AnyRef] {
    override def call(a: AnyRef, b: AnyRef, c: AnyRef): AnyRef = w.invoke(a, b, c)
  }
  private final class Call4(w: ReflectiveUdf) extends UDF4[AnyRef, AnyRef, AnyRef, AnyRef, AnyRef] {
    override def call(a: AnyRef, b: AnyRef, c: AnyRef, d: AnyRef): AnyRef = w.invoke(a, b, c, d)
  }
}
