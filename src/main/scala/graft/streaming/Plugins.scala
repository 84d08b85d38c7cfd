package graft.streaming

import scala.jdk.CollectionConverters._

/** Connector plugin discovery (reference: entry-point plugin registry,
  * pspf/plugins.py:7-73 — third-party packages register backends under
  * an entry-point group; the framework discovers them by name).
  *
  * JVM analog: java.util.ServiceLoader over the ConnectorProvider SPI —
  * a third-party jar ships an implementation plus a
  * `META-INF/services/graft.streaming.ConnectorProvider` entry and its
  * connector becomes creatable by short name with no code changes here.
  * (Spark's own DataSourceRegister for the graftlog format is the same
  * mechanism one layer down.)
  */
trait ConnectorProvider {
  /** Short name used for lookup (reference entry-point name). */
  def name: String
  /** Build a connector from string config (reference plugin kwargs). */
  def create(conf: Map[String, String]): Connector
}

object ConnectorPlugins {
  def discover(): Map[String, ConnectorProvider] =
    java.util.ServiceLoader.load(classOf[ConnectorProvider]).asScala
      .map(p => p.name -> p).toMap

  def create(name: String, conf: Map[String, String]): Connector = {
    val found = discover()
    found.getOrElse(name,
      throw new IllegalArgumentException(
        s"no connector plugin named '$name'; available: ${found.keys.toSeq.sorted.mkString(", ")}"))
      .create(conf)
  }
}

final class FileConnectorProvider extends ConnectorProvider {
  override def name: String = "file"
  override def create(conf: Map[String, String]): Connector =
    new FileConnector(
      conf.getOrElse("root", throw new IllegalArgumentException("file connector needs 'root'")),
      org.apache.spark.sql.types.StructType.fromDDL(
        conf.getOrElse("schema", throw new IllegalArgumentException(
          "file connector needs 'schema' (DDL string)"))))
}

final class GraftLogConnectorProvider extends ConnectorProvider {
  override def name: String = "graftlog"
  override def create(conf: Map[String, String]): Connector =
    new GraftLogConnector(
      conf.getOrElse("root", throw new IllegalArgumentException("graftlog connector needs 'root'")),
      conf.get("numPartitions").flatMap(_.toIntOption).getOrElse(4),
      conf.getOrElse("keyCol", "key"))
}

final class KafkaConnectorProvider extends ConnectorProvider {
  override def name: String = "kafka"
  /** `fallbackRoot` (optional) configures the jar-less envelope
    * fallback: a graftlog broker emulation at that root — so the
    * documented config-only swap works through the plugin path too,
    * not just direct construction. */
  override def create(conf: Map[String, String]): Connector =
    new KafkaConnector(
      conf.getOrElse("bootstrap",
        throw new IllegalArgumentException("kafka connector needs 'bootstrap'")),
      fallback = conf.get("fallbackRoot").map(r => new GraftLogConnector(r,
        conf.get("numPartitions").flatMap(_.toIntOption).getOrElse(4))))
}
