package graft

import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.schema.{LogicalTypeAnnotation, PrimitiveType, Types}
import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
import org.apache.hadoop.fs.Path

/** Writer for TIMESTAMP(NANOS) parquet fixtures: Spark cannot write
  * nanos itself, so the NanosEncodingSpec crafts the legacy events
  * encoding through parquet-mr's example API. */
object NanosProbe {

  /** Writes `<dir>/part-0.parquet` with the full events schema and
    * ts: INT64 TIMESTAMP(NANOS). Rows: (event_id, tsNanos, user_id,
    * event_type, value, props). */
  def writeNanosEvents(dir: String,
      rows: Seq[(Long, Long, Long, String, Double, String)]): Unit = {
    def i64 = Types.required(PrimitiveType.PrimitiveTypeName.INT64)
    def str(n: String) =
      Types.required(PrimitiveType.PrimitiveTypeName.BINARY)
        .as(LogicalTypeAnnotation.stringType()).named(n)
    val schema = Types.buildMessage()
      .addField(i64.named("event_id"))
      .addField(i64.as(LogicalTypeAnnotation.timestampType(false,
        TimeUnit.NANOS)).named("ts"))
      .addField(i64.named("user_id"))
      .addField(str("event_type"))
      .addField(Types.required(PrimitiveType.PrimitiveTypeName.DOUBLE)
        .named("value"))
      .addField(str("props"))
      .named("spark_schema")
    new java.io.File(dir).mkdirs()
    val p = new java.io.File(dir, "part-0.parquet")
    p.delete()
    val w = ExampleParquetWriter.builder(new Path(p.getAbsolutePath))
      .withType(schema).build()
    val gf = new SimpleGroupFactory(schema)
    rows.foreach { case (id, ts, uid, et, v, pr) =>
      val g = gf.newGroup()
      g.add("event_id", id); g.add("ts", ts); g.add("user_id", uid)
      g.add("event_type", et); g.add("value", v); g.add("props", pr)
      w.write(g)
    }
    w.close()
  }
}
