package graft.operators

import org.apache.spark.ml.classification.RandomForestClassifier
import org.apache.spark.ml.evaluation.MulticlassClassificationEvaluator
import org.apache.spark.ml.feature.{StringIndexer, VectorAssembler}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.EmFunctions

/** ML feature engineering + model training (SURVEY §2.10 F5): the
  * reference's sklearn RandomForest + StandardScaler + train/test split
  * (assets/ml_assets.py:231-268) on spark.ml, with the pandas rolling/
  * shift feature windows (W3–W5) as Spark window functions.
  */
object MlFeatures {

  /** Event-level features: hour-of-day, day-of-week, z-scored value
    * (clipped ±3), rolling 30-day count per user (RANGE frame), trailing
    * 5-row mean (ROWS frame), next-event label (lead). */
  def eventFeatures(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(unix_timestamp(col("ts")))
    val trailing = Window.partitionBy("user_id").orderBy("event_id").rowsBetween(-5, -1)
    // global moments as a broadcast 1-row frame, not a driver .head():
    // keeps the whole feature build one lazy job with no eager scan
    val stats = events.agg(avg("value").as("mu"), stddev_pop("value").as("sigma"))
    events
      .crossJoin(broadcast(stats))
      .withColumn("hour_of_day", hour(col("ts")).cast("double"))
      .withColumn("day_of_week", dayofweek(col("ts")).cast("double"))
      .withColumn("value_z", EmFunctions.clip((col("value") - col("mu")) / col("sigma"), -3, 3))
      .drop("mu", "sigma")
      .withColumn("events_prev_30d",
        count(lit(1)).over(byUser.rangeBetween(-30L * 86400, -1)).cast("double"))
      .withColumn("trailing_avg_value", coalesce(avg(col("value")).over(trailing), lit(0.0)))
      .withColumn("label_next_type", lead(col("event_type"), 1).over(
        Window.partitionBy("user_id").orderBy("event_id")))
      .filter(col("label_next_type").isNotNull)
  }

  final case class TrainResult(accuracy: Double, featureImportances: Array[(String, Double)])

  /** Assemble → index label → RF classifier → accuracy on a held-out
    * split + top feature importances (ml_assets.py:272-273's top-k). */
  def trainNextEventModel(features: DataFrame, seed: Long = 42L): TrainResult = {
    val featureCols = Array("hour_of_day", "day_of_week", "value_z", "events_prev_30d", "trailing_avg_value")
    val assembled = new VectorAssembler()
      .setInputCols(featureCols).setOutputCol("features")
      .transform(features)
    val indexed = new StringIndexer()
      .setInputCol("label_next_type").setOutputCol("label")
      .fit(assembled).transform(assembled)
    val Array(train, test) = indexed.randomSplit(Array(0.8, 0.2), seed)
    val model = new RandomForestClassifier()
      .setNumTrees(20).setMaxDepth(5).setSeed(seed)
      .fit(train)
    val acc = new MulticlassClassificationEvaluator()
      .setMetricName("accuracy")
      .evaluate(model.transform(test))
    val importances = featureCols.zip(model.featureImportances.toArray).sortBy(-_._2)
    TrainResult(acc, importances)
  }
}
