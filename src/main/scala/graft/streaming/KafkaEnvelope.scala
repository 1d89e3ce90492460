package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Kafka message envelope (SURVEY §2.1 S10/S11): the reference publishes
  * keyed JSON with compliance fields stamped into every message
  * (resources/kafka.py:121-188, public_resources.py:313-334). These
  * transforms produce/consume exactly that wire shape; the broker itself
  * is absent in this environment, so the envelope frame feeds either
  * `format("kafka")` (production) or file sinks (here).
  */
object KafkaEnvelope {

  /** Business rows -> (key, value) JSON envelope with compliance fields. */
  def wrap(df: DataFrame, keyCol: Column, dataSource: String, classification: String = "PUBLIC"): DataFrame =
    df.withColumn("data_source", lit(dataSource))
      .withColumn("data_classification", lit(classification))
      .select(
        keyCol.cast("string").as("key"),
        to_json(struct(col("*"))).as("value")
      )

  /** (key, value) envelope -> typed rows via the declared schema; parse
    * failures keep the raw value for quarantine (lenient-JSON parity).
    * from_json yields an all-null struct (not a null) on malformed input,
    * so detection goes through its corrupt-record column. */
  def unwrap(df: DataFrame, schema: StructType): DataFrame = {
    val withCorrupt = StructType(schema.fields :+
      org.apache.spark.sql.types.StructField("__corrupt", org.apache.spark.sql.types.StringType))
    val opts = Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> "__corrupt")
    df.select(col("key"), from_json(col("value"), withCorrupt, opts).as("r"), col("value"))
      .select(
        (schema.fieldNames.map(f => col(s"r.$f")) ++ Seq(
          col("key").as("__msg_key"),
          when(col("r.__corrupt").isNotNull, col("value")).as("__unparsed"))): _*
      )
  }
}
