package graft.sources

import org.apache.spark.sql.SparkSession

/** Filesystem checks through the Hadoop FS API — correct for ANY
  * configured filesystem (local, hdfs://, s3a://…). `java.io.File` would
  * silently report false for every non-local URI, which in an upsert
  * pipeline means treating an existing table as absent and dropping
  * history. */
object FsUtil {

  /** True when the path exists AND holds at least one data file that
    * Spark's readers would actually see. Files that are hidden by name
    * ('_', '.') or that live under a hidden directory (e.g. a crashed
    * write's `_temporary/...`) don't count — the reader ignores them, so
    * treating them as data would fail schema inference on read. */
  def hasData(spark: SparkSession, path: String): Boolean = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())

    // Spark's own hidden-path rule (HadoopFsUtils): '_'/'.' prefixes are
    // hidden EXCEPT names containing '=' — partition directories like
    // `__bucket=5` are data, not metadata
    def hidden(n: String): Boolean =
      (n.startsWith("_") && !n.contains("=")) || n.startsWith(".")

    def hiddenAncestor(p: org.apache.hadoop.fs.Path): Boolean = {
      var cur = p.getParent
      while (cur != null && cur != root && cur.toUri != root.toUri) {
        if (hidden(cur.getName)) return true
        cur = cur.getParent
      }
      false
    }

    fs.exists(root) && {
      val it = fs.listFiles(root, true)
      var found = false
      while (!found && it.hasNext) {
        val f = it.next()
        if (f.isFile && f.getLen > 0 && !hidden(f.getPath.getName) &&
            !hiddenAncestor(f.getPath)) found = true
      }
      found
    }
  }
}
