package graft.table

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, Metadata, MetadataBuilder}

/** Typed object columns: arbitrary payloads stored as `binary` with a
  * logical-type tag in the column metadata — the Spark re-expression of the
  * reference's VarBinary-with-ObjectSerializer columns and Arrow
  * logical-type extension metadata (reference
  * org.knime.core.columnar/.../data/VarBinaryData.java
  * `setObject(int, T, ObjectSerializer<T>)`;
  * org.knime.core.columnar.arrow/.../extensiontypes/LogicalTypeExtensionType.java:59).
  *
  * A serializer registry maps logical-type names to codecs; columns carry
  * the name in `StructField.metadata` (survives Parquet round trips), so a
  * reader can resolve the codec without out-of-band knowledge. Catalyst
  * cannot optimize through opaque bytes — the engine keeps natively-typed
  * Spark columns wherever a Spark type exists (SURVEY.md §7 hard parts)
  * and reserves this path for genuinely foreign types.
  */
object ObjectColumns {

  val LogicalTypeKey = "graft.logicalType"

  /** Codec for one logical type. Implementations MUST be deterministic and
    * version-stable (the reference versions every column factory —
    * ArrowColumnDataFactoryVersion).
    */
  trait ObjectCodec[T] extends Serializable {
    def logicalType: String
    def serialize(value: T): Array[Byte]
    def deserialize(bytes: Array[Byte]): T
  }

  /** Built-in example codec: UTF-8 JSON-ish string payloads. */
  final class StringCodec(override val logicalType: String) extends ObjectCodec[String] {
    override def serialize(v: String): Array[Byte] = v.getBytes("UTF-8")
    override def deserialize(b: Array[Byte]): String = new String(b, "UTF-8")
  }

  private val registry = new java.util.concurrent.ConcurrentHashMap[String, ObjectCodec[_]]()

  def register(codec: ObjectCodec[_]): Unit = registry.put(codec.logicalType, codec)
  def codecFor(logicalType: String): Option[ObjectCodec[_]] = Option(registry.get(logicalType))

  def logicalTypeMetadata(logicalType: String): Metadata =
    new MetadataBuilder().putString(LogicalTypeKey, logicalType).build()

  /** Tag an existing binary column with its logical type. */
  def tagColumn(df: DataFrame, column: String, logicalType: String): DataFrame = {
    require(df.schema(column).dataType == BinaryType, s"$column must be binary")
    df.withColumn(column, col(column).as(column, logicalTypeMetadata(logicalType)))
  }

  /** Read the logical-type tag back from a column's metadata. */
  def logicalTypeOf(df: DataFrame, column: String): Option[String] = {
    val m = df.schema(column).metadata
    if (m.contains(LogicalTypeKey)) Some(m.getString(LogicalTypeKey)) else None
  }

  /** Encode a string column into a tagged object column using the
    * registered codec (UDF boundary — object columns are by definition
    * outside codegen).
    */
  def encodeStringColumn(df: DataFrame, column: String, logicalType: String): DataFrame = {
    val codec = codecFor(logicalType)
      .getOrElse(throw new IllegalArgumentException(s"no codec registered for $logicalType"))
      .asInstanceOf[ObjectCodec[String]]
    val enc = udf((s: String) => if (s == null) null else codec.serialize(s))
    tagColumn(df.withColumn(column, enc(col(column))), column, logicalType)
  }

  /** Decode a tagged object column back to string using the codec resolved
    * from the column metadata.
    */
  def decodeStringColumn(df: DataFrame, column: String): DataFrame = {
    val lt = logicalTypeOf(df, column)
      .getOrElse(throw new IllegalArgumentException(s"$column has no logical-type tag"))
    val codec = codecFor(lt)
      .getOrElse(throw new IllegalArgumentException(s"no codec registered for $lt"))
      .asInstanceOf[ObjectCodec[String]]
    val dec = udf((b: Array[Byte]) => if (b == null) null else codec.deserialize(b))
    df.withColumn(column, dec(col(column)))
  }
}
