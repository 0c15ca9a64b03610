package graft.config

import scala.jdk.CollectionConverters._

/** Declarative dataset registry, mirroring the reference's
  * `config/datasets.yml` (reference: build.py:10-12 load; datasets.yml:1-26):
  * per-dataset glob pattern, staging table, natural key, typed columns.
  * Parsed with snakeyaml (vendored in /opt/spark/jars — no new deps).
  */
final case class ColumnSpec(name: String, dtype: String, nullable: Boolean)

final case class DatasetSpec(
    name: String,
    filenamePattern: String,
    stagingTable: String,
    naturalKey: Seq[String],
    columns: Seq[ColumnSpec])

object DatasetConfig {

  /** Parse a datasets.yml-shaped document. Shape (reference datasets.yml):
    * {{{
    * datasets:
    *   penalties:
    *     filename_pattern: "NH_Penalties_*.csv"
    *     staging_table: staging_penalties
    *     natural_key: [ccn, penalty_date, penalty_type]
    *     columns:
    *       ccn: {type: string}
    *       fine_amount: {type: numeric, nullable: true}
    * }}}
    */
  def parse(yamlText: String): Seq[DatasetSpec] = {
    val yaml = new org.yaml.snakeyaml.Yaml()
    val root = yaml.load[java.util.Map[String, Object]](yamlText)
    val datasets = root.get("datasets").asInstanceOf[java.util.Map[String, Object]]
    datasets.asScala.toSeq.map { case (name, specObj) =>
      val m = specObj.asInstanceOf[java.util.Map[String, Object]].asScala
      val cols = m.get("columns") match {
        case Some(cm: java.util.Map[_, _]) =>
          cm.asScala.toSeq.map { case (cn, cv) =>
            cv match {
              case cvm: java.util.Map[_, _] =>
                val cs = cvm.asInstanceOf[java.util.Map[String, Object]].asScala
                ColumnSpec(cn.toString,
                  cs.get("type").map(_.toString).getOrElse("string"),
                  cs.get("nullable").exists(_.toString.toBoolean))
              case s => ColumnSpec(cn.toString, String.valueOf(s), nullable = false)
            }
          }
        case _ => Seq.empty
      }
      DatasetSpec(
        name,
        m.get("filename_pattern").map(_.toString).getOrElse(s"$name*.csv"),
        m.get("staging_table").map(_.toString).getOrElse(s"staging_$name"),
        m.get("natural_key") match {
          case Some(l: java.util.List[_]) => l.asScala.map(_.toString).toSeq
          case _ => Seq.empty
        },
        cols)
    }
  }

  def load(path: String): Seq[DatasetSpec] =
    parse(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8"))
}
