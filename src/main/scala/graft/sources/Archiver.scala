package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** File archival (SURVEY §2.1 S6, §2.10 T3).
  *
  * The reference copies each processed `to_process` JSON file to `processed/`
  * and deletes the original (spotify-airflow-pipeline.py:166-183) — its
  * only exactly-once mechanism. The engine's streaming path gets
  * exactly-once from the checkpoint offset log instead (StreamingLoader);
  * this utility exists for the batch Runner to mirror the reference's
  * landing-dir hygiene. Pure namespace renames — no data movement —
  * driver-side metadata ops only.
  */
object Archiver {

  /** Move every file matching `glob` under `srcDir` into `dstDir`.
    * Returns the number of files moved. */
  def archive(spark: SparkSession, srcDir: String, dstDir: String,
      suffix: String = ".json"): Int = {
    val conf = spark.sparkContext.hadoopConfiguration
    val src = new Path(srcDir)
    val fs = src.getFileSystem(conf)
    if (!fs.exists(src)) return 0
    val dst = new Path(dstDir)
    if (!fs.exists(dst)) fs.mkdirs(dst)
    val files = fs.listStatus(src).filter(s => s.isFile && s.getPath.getName.endsWith(suffix))
    files.foreach(s => fs.rename(s.getPath, new Path(dst, s.getPath.getName)))
    files.length
  }
}
