package graft

import graft.table.ObjectColumns
import org.apache.spark.sql.functions._

class ObjectColumnsSpec extends SparkSpec {
  import spark.implicits._

  ObjectColumns.register(new ObjectColumns.StringCodec("test.Payload"))

  test("encode → parquet round-trip → decode preserves values and metadata") {
    val df = Seq((1L, "alpha"), (2L, "βeta"), (3L, null.asInstanceOf[String])).toDF("id", "payload")
    val encoded = ObjectColumns.encodeStringColumn(df, "payload", "test.Payload")
    assert(ObjectColumns.logicalTypeOf(encoded, "payload").contains("test.Payload"))

    val path = java.nio.file.Files.createTempDirectory("objcol").resolve("t").toString
    encoded.write.parquet(path)
    val back = spark.read.parquet(path)
    // metadata survives the parquet round trip
    assert(ObjectColumns.logicalTypeOf(back, "payload").contains("test.Payload"))

    val decoded = ObjectColumns.decodeStringColumn(back, "payload")
      .orderBy($"id").collect()
    assert(decoded(0).getString(1) == "alpha")
    assert(decoded(1).getString(1) == "βeta")
    assert(decoded(2).isNullAt(1))
  }

  test("unknown logical type fails fast") {
    val df = Seq((1L, Array[Byte](1))).toDF("id", "payload")
    intercept[IllegalArgumentException] {
      ObjectColumns.decodeStringColumn(df, "payload") // untagged
    }
    intercept[IllegalArgumentException] {
      ObjectColumns.encodeStringColumn(
        Seq((1L, "x")).toDF("id", "payload"), "payload", "never.Registered")
    }
  }
}
