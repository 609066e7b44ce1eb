package graft

import graft.functions.{avro, AvroSchemaConverter}
import org.apache.avro.generic.GenericData
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

class AvroSpec extends SparkSpec {

  test("OrderEvent schema maps to the reference's catalyst struct") {
    val dt = AvroSchemaConverter.toSqlType(
      AvroSchemaConverter.parse(avro.OrderEventSchemaJson))
    assert(dt == StructType(Seq(
      StructField("orderId", StringType, nullable = false),
      StructField("amount", DoubleType, nullable = false),
      StructField("ts", StringType, nullable = false))))
  }

  test("union-with-null maps to nullable field") {
    val json =
      """{"type":"record","name":"R","fields":[
         {"name":"a","type":["null","string"]},
         {"name":"b","type":["int","null"]},
         {"name":"c","type":"long"}]}"""
    val dt = AvroSchemaConverter.toSqlType(AvroSchemaConverter.parse(json))
      .asInstanceOf[StructType]
    assert(dt("a").dataType == StringType && dt("a").nullable)
    assert(dt("b").dataType == IntegerType && dt("b").nullable)
    assert(dt("c").dataType == LongType && !dt("c").nullable)
  }

  test("array/map/nested-record conversion") {
    val json =
      """{"type":"record","name":"R","fields":[
         {"name":"xs","type":{"type":"array","items":"double"}},
         {"name":"m","type":{"type":"map","values":"string"}},
         {"name":"inner","type":{"type":"record","name":"I",
           "fields":[{"name":"k","type":"string"}]}}]}"""
    val dt = AvroSchemaConverter.toSqlType(AvroSchemaConverter.parse(json))
      .asInstanceOf[StructType]
    assert(dt("xs").dataType == ArrayType(DoubleType, containsNull = false))
    assert(dt("m").dataType ==
      MapType(StringType, StringType, valueContainsNull = false))
    assert(dt("inner").dataType ==
      StructType(Seq(StructField("k", StringType, nullable = false))))
  }

  test("avro_decode round-trips producer framing through SQL") {
    val schema = AvroSchemaConverter.parse(avro.OrderEventSchemaJson)
    val ser = new avro.Serializer(schema)
    val bytes = (1 to 5).map { i =>
      val rec = new GenericData.Record(schema)
      rec.put("orderId", s"order-$i")
      rec.put("amount", i * 1.5)
      rec.put("ts", s"2026-01-0$i")
      ser.serialize(rec)
    }
    avro.registerAvroDecode(spark)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(bytes.map(b => Row(b))),
      StructType(Seq(StructField("value", BinaryType))))
    val out = df.selectExpr(
        s"avro_decode(value, '${avro.OrderEventSchemaJson.replace("'", "''")}') AS data")
      .select("data.*")
      .orderBy("orderId")
      .collect()
    assert(out.length == 5)
    assert(out.head.getString(0) == "order-1")
    assert(out.head.getDouble(1) == 1.5)
    assert(out.last.getString(2) == "2026-01-05")
  }

  test("avro_decode survives whole-stage codegen (filter + projection)") {
    val schema = AvroSchemaConverter.parse(avro.OrderEventSchemaJson)
    val ser = new avro.Serializer(schema)
    val rec = new GenericData.Record(schema)
    rec.put("orderId", "x"); rec.put("amount", 9.0); rec.put("ts", "t")
    avro.registerAvroDecode(spark)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(ser.serialize(rec)))),
      StructType(Seq(StructField("value", BinaryType))))
    val n = df.selectExpr(
        s"avro_decode(value, '${avro.OrderEventSchemaJson.replace("'", "''")}') AS data")
      .where("data.amount > 1.0").count()
    assert(n == 1)
  }
}
