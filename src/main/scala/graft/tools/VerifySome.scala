package graft.tools

import java.nio.file.{Files, Paths}

/** Dev loop: run ONLY the named probes through the Verify dump + oracle
  * JSON, so `tools/check_oracle.py` can gate a new query in seconds
  * instead of re-running all of them.
  *
  * Usage: runMain graft.tools.VerifySome <sfDir> <outDir> <q...>
  */
object VerifySome {
  def main(a: Array[String]): Unit = {
    require(a.length >= 3, "usage: VerifySome <sfDir> <outDir> <query...>")
    val sfDir = a(0); val outDir = a(1); val names = a.drop(2).toSeq
    val spark = graft.GraftSession.getOrCreate("verifysome")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      graft.SparkEntry.queries(name)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = graft.SparkEntry.oracleSql.filter(kv => names.contains(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    graft.VerifyMeta.write(outDir, names)
    spark.stop()
  }
}
