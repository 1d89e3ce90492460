package graft.streaming

import scala.collection.immutable.ListMap

/** Declarative topic provisioning (SURVEY §2.1 S12) — the reference's
  * AdminClient topic setup re-expressed as data plus deterministic
  * command/config emitters (resources/kafka.py:84-120 `create_topic`
  * defaults; :226-291 `setup_emergency_topics` six-topic plan).
  *
  * Provisioning is an external-infrastructure concern (no broker in this
  * environment, and none on a Spark cluster's critical path), so the
  * engine's job is to OWN the declaration — one source of truth the
  * deploy tooling renders — rather than to hold an AdminClient
  * connection. `cliCommands` renders standard `kafka-topics.sh` lines;
  * `adminConfigs` yields the per-topic config maps an AdminClient
  * `NewTopic` would carry. Both are pure and unit-tested.
  */
object TopicProvisioning {

  /** One topic declaration. `overrides` layers on `baseConfig` exactly as
    * the reference's `create_topic` merges its per-topic dict over the
    * shared defaults (kafka.py:88-97). */
  final case class TopicSpec(
      name: String,
      partitions: Int,
      replicationFactor: Int = 1,
      overrides: Map[String, String] = Map.empty
  ) {
    require(partitions > 0, s"topic $name: partitions must be > 0")
    require(replicationFactor > 0, s"topic $name: replicationFactor must be > 0")

    def resolvedConfig: ListMap[String, String] =
      baseConfig.foldLeft(ListMap.empty[String, String]) { case (acc, (k, v)) =>
        acc.updated(k, overrides.getOrElse(k, v))
      } ++ ListMap((overrides -- baseConfig.keys).toSeq.sortBy(_._1): _*)
  }

  private val DayMs = 24L * 60 * 60 * 1000

  /** Shared defaults every topic starts from (kafka.py:88-93). */
  val baseConfig: ListMap[String, String] = ListMap(
    "cleanup.policy" -> "delete",
    "retention.ms" -> (7 * DayMs).toString,
    "segment.ms" -> (1 * DayMs).toString,
    "compression.type" -> "gzip"
  )

  private def retained(days: Int): Map[String, String] =
    Map("retention.ms" -> (days * DayMs).toString)

  /** The six standard emergency-management topics (kafka.py:229-277):
    * per-source ingress topics sized by volume, plus a compacted
    * keep-latest metrics topic and an ML-prediction fan-out topic. */
  val emergencyTopics: Seq[TopicSpec] = Seq(
    TopicSpec("fema_disasters", partitions = 3, overrides = retained(30)),
    TopicSpec("noaa_weather_alerts", partitions = 5, overrides = retained(7)),
    TopicSpec("coagmet_weather", partitions = 3, overrides = retained(7)),
    TopicSpec("usda_agricultural_data", partitions = 2, overrides = retained(30)),
    TopicSpec("data_quality_metrics", partitions = 1,
      overrides = retained(90) ++ Map("cleanup.policy" -> "compact")),
    TopicSpec("ml_predictions", partitions = 2, overrides = retained(30))
  )

  /** AdminClient-shaped view: topic → (partitions, replication, config). */
  def adminConfigs(topics: Seq[TopicSpec] = emergencyTopics)
      : Seq[(String, Int, Int, Map[String, String])] =
    topics.map(t => (t.name, t.partitions, t.replicationFactor, t.resolvedConfig))

  /** Render runnable `kafka-topics.sh --create` lines — idempotent via
    * `--if-not-exists`, matching the reference's tolerate-already-exists
    * behavior (kafka.py:114-116). */
  def cliCommands(
      bootstrapServers: String,
      topics: Seq[TopicSpec] = emergencyTopics
  ): Seq[String] =
    topics.map { t =>
      val cfg = t.resolvedConfig.map { case (k, v) => s"--config $k=$v" }.mkString(" ")
      s"kafka-topics.sh --create --if-not-exists --bootstrap-server $bootstrapServers " +
        s"--topic ${t.name} --partitions ${t.partitions} " +
        s"--replication-factor ${t.replicationFactor} $cfg"
    }
}
