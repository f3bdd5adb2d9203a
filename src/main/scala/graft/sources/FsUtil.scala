package graft.sources

import org.apache.spark.sql.SparkSession

/** Filesystem checks through the Hadoop FS API — correct for ANY
  * configured filesystem (local, hdfs://, s3a://…). `java.io.File` would
  * silently report false for every non-local URI, which in an upsert
  * pipeline means treating an existing table as absent and dropping
  * history. */
object FsUtil {
  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  /** True when the path exists AND holds at least one data file — an
    * empty directory (e.g. a pre-created output location) is not a
    * readable table. */
  def hasData(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.exists(p) && {
      val it = fs.listFiles(p, true)
      var found = false
      while (!found && it.hasNext) {
        val f = it.next()
        if (f.isFile && f.getLen > 0 && !f.getPath.getName.startsWith("_")) found = true
      }
      found
    }
  }
}
