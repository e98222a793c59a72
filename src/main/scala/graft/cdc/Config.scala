package graft.cdc

import java.io.{InputStream, StringReader}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.yaml.snakeyaml.{LoaderOptions, Yaml}
import org.yaml.snakeyaml.constructor.SafeConstructor

import graft.cdc.Routing.TransformRule

/** YAML pipeline configuration (reference R8,
  * `reference/src/config/transform.rs:12-38`, shape `config.yaml:1-11`):
  *
  * {{{
  * kafka:
  *   bootstrap_servers: host:9092
  *   group: my-group
  *   bindings: [topic-a, topic-b]
  * transforms:
  *   - source_topic: topic-a
  *     db: mydb
  *     table: "orders_[0-9]+"   # regex
  *     target_topic: out-a
  * }}}
  *
  * Semantics preserved from the reference: rule order in the file is
  * routing priority (first match wins, `transform.rs:56-64`), and every
  * `table` pattern is validated (compiled) at load time with fail-fast
  * on an invalid regex (`transform.rs:33` `.unwrap()`). Parse errors
  * throw — config is driver-side, tiny, and a bad config must kill the
  * job before any executor starts.
  */
object Config {

  /** Kafka connectivity block (consumed by the [[graft.streaming.KafkaIO]]
    * adapter; unused in batch verification).
    */
  case class KafkaConf(bootstrapServers: String, group: String, bindings: Seq[String])

  /** Full parsed config: connectivity + ordered routing rules. */
  case class PipelineConf(kafka: KafkaConf, rules: Seq[TransformRule])

  def fromString(yamlText: String): PipelineConf = {
    // SafeConstructor: plain maps/lists/scalars only — the default
    // constructor instantiates arbitrary classes via `!!` tags, an RCE
    // vector if a config file is ever attacker-influenced.
    val yaml = new Yaml(new SafeConstructor(new LoaderOptions()))
    val root = yaml.load[java.util.Map[String, Object]](new StringReader(yamlText))
    require(root != null, "empty YAML config")

    def section(name: String): java.util.Map[String, Object] =
      root.get(name) match {
        case m: java.util.Map[_, _] => m.asInstanceOf[java.util.Map[String, Object]]
        case _ => throw new IllegalArgumentException(s"missing '$name' section")
      }
    def str(m: java.util.Map[String, Object], k: String): String =
      m.get(k) match {
        case s: String => s
        case null => throw new IllegalArgumentException(s"missing key '$k'")
        case other => other.toString
      }

    val k = section("kafka")
    val bindings = k.get("bindings") match {
      case l: java.util.List[_] => l.asScala.toSeq.map(_.toString)
      case _ => throw new IllegalArgumentException("kafka.bindings must be a list")
    }
    val kafka = KafkaConf(str(k, "bootstrap_servers"), str(k, "group"), bindings)

    val transforms = root.get("transforms") match {
      case l: java.util.List[_] =>
        l.asScala.toSeq.map { t =>
          val m = t.asInstanceOf[java.util.Map[String, Object]]
          TransformRule(str(m, "source_topic"), str(m, "db"),
            str(m, "table"), str(m, "target_topic"))
        }
      case _ => throw new IllegalArgumentException("missing 'transforms' section")
    }
    // Fail fast on bad regex at load time, like transform.rs:33.
    Routing.validate(transforms)
    PipelineConf(kafka, transforms)
  }

  def fromFile(path: String): PipelineConf =
    fromString(Files.readString(Paths.get(path)))

  /** Load from the classpath (fixtures ship in src/main/resources so
    * `graft.Verify` finds them regardless of working directory).
    */
  def fromResource(resource: String): PipelineConf = {
    val in: InputStream = getClass.getResourceAsStream(resource)
    require(in != null, s"resource not found: $resource")
    try fromString(new String(in.readAllBytes(), StandardCharsets.UTF_8))
    finally in.close()
  }
}
