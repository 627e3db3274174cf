package graft.sources

import java.nio.file.{Files, Paths}

/** S11: provenance JSON sidecar written next to every output
  * (code/lib/util.py:278-354 `create_json`). Pure driver-side utility —
  * no Spark dependency; values are stringified (the reference dumps the
  * param/paths dicts the same way).
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
      inputPaths: Seq[String], caller: String): Unit = {
    val json = new StringBuilder("{\n")
    json ++= s"""  "output": "${esc(outputPath)}",\n"""
    json ++= s"""  "caller": "${esc(caller)}",\n"""
    json ++= s"""  "inputs": [${inputPaths.map(p => "\"" + esc(p) + "\"").mkString(", ")}],\n"""
    json ++= s"""  "params": {${params.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + esc(k) + "\": \"" + esc(v) + "\"" }.mkString(", ")}}\n"""
    json ++= "}\n"
    Files.writeString(Paths.get(outputPath + ".json"), json.toString)
  }
}
