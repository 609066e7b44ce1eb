package graft.functions

import org.apache.avro.Schema
import org.apache.avro.Schema.Type._
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Avro schema → Catalyst schema conversion.
  *
  * The reference relied on the `spark-avro` module's converter via
  * `from_avro` (reference `KafkaAvroToIceberg.scala:5,69`); that module
  * is absent in this environment, so the mapping is reimplemented over
  * the bundled core Avro library. Union-with-null maps to a nullable
  * field; fixed/bytes → BinaryType; enum → StringType.
  */
object AvroSchemaConverter {

  def toSqlType(schema: Schema): DataType = toSqlTypeWithNullability(schema)._1

  /** @return (catalyst type, nullable) */
  def toSqlTypeWithNullability(schema: Schema): (DataType, Boolean) =
    schema.getType match {
      case STRING | ENUM => (StringType, false)
      case BYTES | FIXED => (BinaryType, false)
      case INT           => (IntegerType, false)
      case LONG          => (LongType, false)
      case FLOAT         => (FloatType, false)
      case DOUBLE        => (DoubleType, false)
      case BOOLEAN       => (BooleanType, false)
      case NULL          => (NullType, true)
      case RECORD =>
        val fields = schema.getFields.asScala.map { f =>
          val (dt, nullable) = toSqlTypeWithNullability(f.schema())
          StructField(f.name(), dt, nullable)
        }.toArray
        (StructType(fields), false)
      case ARRAY =>
        val (dt, nullable) = toSqlTypeWithNullability(schema.getElementType)
        (ArrayType(dt, containsNull = nullable), false)
      case MAP =>
        val (dt, nullable) = toSqlTypeWithNullability(schema.getValueType)
        (MapType(StringType, dt, valueContainsNull = nullable), false)
      case UNION =>
        val branches = schema.getTypes.asScala.toSeq
        val (nonNull, hasNull) =
          (branches.filter(_.getType != NULL), branches.exists(_.getType == NULL))
        nonNull match {
          case Seq(only) =>
            val (dt, n) = toSqlTypeWithNullability(only)
            (dt, n || hasNull)
          case Seq(a, b)
              if Set(a.getType, b.getType) == Set(INT, LONG) =>
            (LongType, hasNull)
          case Seq(a, b)
              if Set(a.getType, b.getType) == Set(FLOAT, DOUBLE) =>
            (DoubleType, hasNull)
          case other =>
            // general union → struct of member branches (spark-avro's
            // convention member0, member1, ...)
            val fields = other.zipWithIndex.map { case (br, i) =>
              val (dt, _) = toSqlTypeWithNullability(br)
              StructField(s"member$i", dt, nullable = true)
            }
            (StructType(fields.toArray), hasNull)
        }
      case t => throw new IllegalArgumentException(s"Unsupported Avro type: $t")
    }

  def parse(json: String): Schema = new Schema.Parser().parse(json)
}
