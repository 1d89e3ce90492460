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

  /** The reference's agricultural risk-score model
    * (assets/ml_assets.py:340-410, feature construction :119-141)
    * re-expressed: daily station rollup (avg temp/humidity, total
    * precip), drought indicator = precip below its 20th percentile AND
    * temp above its 80th (pandas linear-interpolation quantiles ==
    * `percentile()`), per-metric z-scores on the pandas SAMPLE std
    * (precip/humidity inverted — low is risky), clipped ±3; composite
    * 0.4·t + 0.4·p + 0.2·h + 2·drought clipped to [0,10]; right-closed
    * pd.cut categories ((0,2]=LOW … (8,10]=EXTREME — a score of exactly
    * 0 falls outside every bin and yields null, faithfully); seasonal
    * month multiplier; adjusted = clip(score·mult, 0, 10).
    *
    * Scale shape: the daily frame is one A8-class rollup; ALL model
    * statistics ride ONE 1-row aggregate broadcast back over it (the
    * scalar-subquery shape), so everything after the rollup is map-side.
    * Outputs rounded 6 dp — the engines accumulate moments in different
    * orders (a17 precedent). */
  def agriculturalRiskScores(stgCoag: DataFrame): DataFrame = {
    def clip(c: org.apache.spark.sql.Column, lo: Double, hi: Double) =
      least(greatest(c, lit(lo)), lit(hi))
    // decimal-exact daily rollup (EmFunctions davg/dsum device): the
    // observation count per day grows with the station axis, and a plain
    // double avg() drifts past the 6-dp rounding boundary at ×10 scale
    val daily = stgCoag
      .groupBy(col("observation_date").as("event_date"))
      .agg(
        EmFunctions.davg(col("temperature_celsius")).as("avg_temperature"),
        EmFunctions.davg(col("relative_humidity_percent")).as("avg_humidity"),
        EmFunctions.dsum(col("precipitation_mm")).cast("double").as("total_precipitation"))
    val stats = daily.agg(
      avg("avg_temperature").as("t_mean"), stddev_samp("avg_temperature").as("t_std"),
      avg("total_precipitation").as("p_mean"), stddev_samp("total_precipitation").as("p_std"),
      avg("avg_humidity").as("h_mean"), stddev_samp("avg_humidity").as("h_std"),
      expr("percentile(total_precipitation, 0.2)").as("p_q20"),
      expr("percentile(avg_temperature, 0.8)").as("t_q80"))
    daily.crossJoin(broadcast(stats))
      .withColumn("drought_indicator",
        (col("total_precipitation") < col("p_q20") &&
          col("avg_temperature") > col("t_q80")).cast("int"))
      .withColumn("temperature_risk",
        clip((col("avg_temperature") - col("t_mean")) / col("t_std"), -3, 3))
      .withColumn("precipitation_risk",
        clip((col("p_mean") - col("total_precipitation")) / col("p_std"), -3, 3))
      .withColumn("humidity_risk",
        clip((col("h_mean") - col("avg_humidity")) / col("h_std"), -3, 3))
      .withColumn("agricultural_risk_score", clip(
        col("temperature_risk") * 0.4 + col("precipitation_risk") * 0.4 +
          col("humidity_risk") * 0.2 + col("drought_indicator") * 2.0, 0, 10))
      .withColumn("risk_category",
        when(col("agricultural_risk_score") > 8, "EXTREME")
          .when(col("agricultural_risk_score") > 6, "SEVERE")
          .when(col("agricultural_risk_score") > 4, "HIGH")
          .when(col("agricultural_risk_score") > 2, "MODERATE")
          .when(col("agricultural_risk_score") > 0, "LOW"))
      .withColumn("seasonal_multiplier", element_at(
        typedLit(Seq(0.5, 0.5, 0.7, 1.0, 1.2, 1.5, 1.5, 1.3, 1.0, 0.8, 0.6, 0.5)),
        month(col("event_date"))))
      .withColumn("adjusted_risk_score",
        clip(col("agricultural_risk_score") * col("seasonal_multiplier"), 0, 10))
      .select(
        col("event_date"),
        round(col("avg_temperature"), 6).as("avg_temperature"),
        round(col("avg_humidity"), 6).as("avg_humidity"),
        round(col("total_precipitation"), 6).as("total_precipitation"),
        col("drought_indicator"),
        round(col("temperature_risk"), 6).as("temperature_risk"),
        round(col("precipitation_risk"), 6).as("precipitation_risk"),
        round(col("humidity_risk"), 6).as("humidity_risk"),
        round(col("agricultural_risk_score"), 6).as("agricultural_risk_score"),
        col("risk_category"),
        col("seasonal_multiplier"),
        round(col("adjusted_risk_score"), 6).as("adjusted_risk_score"))
  }
}
