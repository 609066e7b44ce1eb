package graft.functions

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericRecord}
import org.apache.avro.io.DecoderFactory
import org.apache.avro.util.Utf8
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.jdk.CollectionConverters._

/** `from_avro`-equivalent Catalyst expression: binary → struct, for
  * raw Avro record bodies WITHOUT a schema-registry wire header
  * (matching the reference's producer framing — reference
  * `TestAvroProducer.scala:56-63` writes plain `binaryEncoder` output,
  * which is the only reason its `from_avro` works).
  *
  * The `spark-avro` module is absent in this environment (SURVEY §7.0)
  * so decode is built on the bundled core Avro library. Codegen emits
  * a direct call on the referenced expression object — the expression
  * stays inside whole-stage codegen instead of forcing a fallback.
  */
case class AvroDeserialize(child: Expression, schemaJson: String)
    extends UnaryExpression {
  // (ExpectsInputTypes is sql-private in Spark 4; the binary-input
  // contract is enforced by the resolved child type instead.)
  require(schemaJson != null && schemaJson.nonEmpty, "schemaJson required")

  @transient private lazy val avroSchema: Schema =
    AvroSchemaConverter.parse(schemaJson)

  override lazy val dataType: DataType =
    AvroSchemaConverter.toSqlType(avroSchema)

  override def nullable: Boolean = true

  @transient private lazy val reader =
    new GenericDatumReader[GenericRecord](avroSchema)
  @transient private var reuseRecord: GenericRecord = _
  @transient private var reuseDecoder: org.apache.avro.io.BinaryDecoder = _

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    reuseDecoder =
      DecoderFactory.get().binaryDecoder(bytes, 0, bytes.length, reuseDecoder)
    reuseRecord = reader.read(reuseRecord, reuseDecoder)
    convert(reuseRecord, avroSchema).asInstanceOf[InternalRow]
  }

  /** Avro runtime value → Catalyst internal value. */
  private def convert(value: Any, schema: Schema): Any = {
    if (value == null) return null
    schema.getType match {
      case Schema.Type.RECORD =>
        val rec = value.asInstanceOf[GenericRecord]
        val fields = schema.getFields
        val out = new Array[Any](fields.size())
        var i = 0
        while (i < fields.size()) {
          out(i) = convert(rec.get(i), fields.get(i).schema())
          i += 1
        }
        InternalRow.fromSeq(out.toIndexedSeq)
      case Schema.Type.STRING | Schema.Type.ENUM =>
        UTF8String.fromString(value.toString)
      case Schema.Type.BYTES =>
        val bb = value.asInstanceOf[java.nio.ByteBuffer]
        val arr = new Array[Byte](bb.remaining()); bb.duplicate().get(arr); arr
      case Schema.Type.FIXED =>
        value.asInstanceOf[GenericData.Fixed].bytes().clone()
      case Schema.Type.INT | Schema.Type.LONG | Schema.Type.FLOAT |
          Schema.Type.DOUBLE | Schema.Type.BOOLEAN =>
        // INT|LONG / FLOAT|DOUBLE unions widened by the converter
        value match {
          case i: java.lang.Integer
              if AvroSchemaConverter.toSqlType(schema) == LongType =>
            i.longValue()
          case f: java.lang.Float
              if AvroSchemaConverter.toSqlType(schema) == DoubleType =>
            f.doubleValue()
          case other => other
        }
      case Schema.Type.ARRAY =>
        val el = schema.getElementType
        val items = value.asInstanceOf[java.util.Collection[Any]].asScala
          .map(convert(_, el)).toArray
        new GenericArrayData(items)
      case Schema.Type.MAP =>
        val vt = schema.getValueType
        val m = value.asInstanceOf[java.util.Map[Any, Any]].asScala
        ArrayBasedMapData(
          m.keys.map(k => UTF8String.fromString(k.toString)).toArray,
          m.values.map(convert(_, vt)).toArray)
      case Schema.Type.UNION =>
        val branches = schema.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
        if (branches.size == 1) convert(value, branches.head)
        else {
          // widened numeric unions
          value match {
            case i: java.lang.Integer => i.longValue()
            case l: java.lang.Long    => l
            case f: java.lang.Float   => f.doubleValue()
            case d: java.lang.Double  => d
            case _ =>
              // general union-as-struct: position of the runtime branch
              val idx = branches.indexWhere(b => runtimeMatches(value, b))
              val out = new Array[Any](branches.size)
              out(idx) = convert(value, branches(idx))
              InternalRow.fromSeq(out.toIndexedSeq)
          }
        }
      case Schema.Type.NULL => null
      case t => throw new IllegalArgumentException(s"Unsupported Avro type: $t")
    }
  }

  private def runtimeMatches(value: Any, branch: Schema): Boolean =
    branch.getType match {
      case Schema.Type.STRING => value.isInstanceOf[Utf8] || value.isInstanceOf[String]
      case Schema.Type.RECORD => value.isInstanceOf[GenericRecord]
      case Schema.Type.BOOLEAN => value.isInstanceOf[java.lang.Boolean]
      case Schema.Type.BYTES => value.isInstanceOf[java.nio.ByteBuffer]
      case _ => true
    }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("avroDeser", this)
    nullSafeCodeGen(ctx, ev, bytes =>
      s"${ev.value} = (${InternalRow.getClass.getName.stripSuffix("$")}) " +
        s"$ref.nullSafeEval($bytes);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "avro_decode"
}
