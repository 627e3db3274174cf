package graft.sources

import java.nio.charset.StandardCharsets
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** S11: provenance JSON sidecar written next to every output
  * (code/lib/util.py:278-354 `create_json`). Driver-side utility; all IO
  * goes through the Hadoop FileSystem API so sidecars work on HDFS/S3
  * exactly like the data they describe (a local-only `java.nio` sidecar
  * would silently not resolve at cluster scale).
  */
object JsonSidecar {

  private def esc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  def write(outputPath: String, params: Map[String, String],
      inputPaths: Seq[String], caller: String,
      conf: Configuration = new Configuration()): Unit = {
    val json = new StringBuilder("{\n")
    json ++= s"""  "output": "${esc(outputPath)}",\n"""
    json ++= s"""  "caller": "${esc(caller)}",\n"""
    json ++= s"""  "inputs": [${inputPaths.map(p => "\"" + esc(p) + "\"").mkString(", ")}],\n"""
    json ++= s"""  "params": {${params.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + esc(k) + "\": \"" + esc(v) + "\"" }.mkString(", ")}}\n"""
    json ++= "}\n"
    val p = new Path(outputPath + ".json")
    val fs = p.getFileSystem(conf)
    val out = fs.create(p, true)
    try out.write(json.toString.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }

  /** Read the `params` map back from a sidecar. None when the sidecar does
    * not exist; THROWS on a present-but-unparseable sidecar (a corrupt
    * provenance record must never silently degrade to defaults). Parsed
    * with a real JSON parser (jackson, already on Spark's classpath) —
    * not a regex.
    */
  def readParams(sidecarPath: String, conf: Configuration = new Configuration()): Option[Map[String, String]] = {
    val p = new Path(sidecarPath)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val txt = try new String(in.readAllBytes(), StandardCharsets.UTF_8) finally in.close()
      val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(txt)
      val params = root.get("params")
      if (params == null || !params.isObject)
        throw new IllegalStateException(s"sidecar $sidecarPath has no params object")
      val b = Map.newBuilder[String, String]
      params.fields().forEachRemaining(e => b += (e.getKey -> e.getValue.asText()))
      Some(b.result())
    }
  }
}
