package graft.cdc

import graft.SparkSpec

/** R8 YAML config loading (reference `transform.rs:12-38`,
  * `config.yaml:1-11`): shape parsing, rule order preservation,
  * fail-fast on invalid regex / malformed structure.
  */
class ConfigSpec extends SparkSpec {

  private val goodYaml =
    """kafka:
      |  bootstrap_servers: broker:9092
      |  group: g1
      |  bindings: [a-topic, b-topic]
      |transforms:
      |  - source_topic: a-topic
      |    db: db1
      |    table: "t_[0-9]+"
      |    target_topic: out-1
      |  - source_topic: b-topic
      |    db: db2
      |    table: "u_.*"
      |    target_topic: out-2
      |""".stripMargin

  test("parses kafka block and ordered transforms") {
    val conf = Config.fromString(goodYaml)
    assert(conf.kafka.bootstrapServers == "broker:9092")
    assert(conf.kafka.group == "g1")
    assert(conf.kafka.bindings == Seq("a-topic", "b-topic"))
    assert(conf.rules.map(_.targetTopic) == Seq("out-1", "out-2")) // order = priority
    assert(conf.rules.head.tableRegex == "t_[0-9]+")
  }

  test("classpath fixture loads and validates") {
    val conf = Config.fromResource("/graft/rules.yaml")
    assert(conf.rules.nonEmpty && conf.kafka.bindings.nonEmpty)
  }

  test("invalid table regex fails at load time (transform.rs:33 parity)") {
    intercept[Exception] {
      Config.fromString(goodYaml.replace("t_[0-9]+", "t_[0-9"))
    }
  }

  test("missing sections fail loudly") {
    intercept[IllegalArgumentException](Config.fromString("kafka: {}\n"))
    intercept[IllegalArgumentException](Config.fromString("transforms: []\n"))
  }
}
