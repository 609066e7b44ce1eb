package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericDatumWriter, GenericRecord}
import org.apache.avro.io.EncoderFactory
import org.apache.spark.sql.{Column, SparkSession}

/** User-facing Avro helpers.
  *
  * `registerAvroDecode(spark)` installs a SQL function
  * `avro_decode(value BINARY, schemaJson STRING) → STRUCT<...>` backed
  * by [[AvroDeserialize]]; `avroDecode(col, json)` is the Column form.
  */
object avro {

  /** SQL builder — shared by per-session [[registerAvroDecode]] and
    * the cluster-wide [[graft.GraftExtensions]] injection. */
  private[graft] val decodeBuilder
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression =
    { exprs =>
      require(exprs.size == 2, "avro_decode(value, schemaJson)")
      val json = exprs(1) match {
        case lit: org.apache.spark.sql.catalyst.expressions.Literal =>
          lit.value.toString
        case other =>
          throw new IllegalArgumentException(
            s"avro_decode schema must be a string literal, got $other")
      }
      AvroDeserialize(exprs.head, json)
    }

  def registerAvroDecode(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "avro_decode", decodeBuilder, "built-in")

  /** Column-level decode; requires registerAvroDecode first. */
  def avroDecode(spark: SparkSession, value: Column, schemaJson: String): Column = {
    registerAvroDecode(spark)
    import org.apache.spark.sql.functions.{expr, lit}
    // route through the registry so no private Column constructors are needed
    val _ = lit(schemaJson)
    expr(s"avro_decode(value, '${schemaJson.replace("'", "''")}')")
  }

  /** Raw-body Avro serializer (no schema-registry wire header) — the
    * framing the reference producer uses (TestAvroProducer.scala:56-63). */
  final class Serializer(schema: Schema) extends Serializable {
    @transient private lazy val writer = new GenericDatumWriter[GenericRecord](schema)
    def serialize(rec: GenericRecord): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      val enc = EncoderFactory.get().binaryEncoder(out, null)
      writer.write(rec, enc)
      enc.flush()
      out.toByteArray
    }
  }

  /** The reference pipeline's record schema (KafkaAvroToIceberg.scala:40-52;
    * canonical fixture test/order.schema.json). */
  val OrderEventSchemaJson: String =
    """{"type":"record","name":"OrderEvent","namespace":"com.example",
       "fields":[{"name":"orderId","type":"string"},
                 {"name":"amount","type":"double"},
                 {"name":"ts","type":"string"}]}"""
}
