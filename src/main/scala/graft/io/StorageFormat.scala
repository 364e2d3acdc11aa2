package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * THE storage-format seam. Every byte the library persists — TableIO
 * stage commits and DeltaLog delta directories — flows through these two
 * methods and nothing else; no other file calls `spark.read.parquet` or
 * `df.write.parquet` on state paths. The sandbox has no Iceberg runtime
 * jar (offline resolver), so the backing store is plain Parquet
 * directories with TableIO/DeltaLog supplying the Iceberg-shaped
 * semantics (atomic commit, manifest, snapshot reuse) one level up.
 *
 * Swapping in `iceberg-spark-runtime` therefore changes exactly these
 * two bodies (path-addressed parquet → catalog-addressed
 * `writeTo(table)` / `spark.table(table)`), plus nothing in the
 * pipeline: the atomic-rename dance in the callers collapses into
 * Iceberg's own snapshot commit. See README §"Iceberg".
 */
private[io] object StorageFormat {

  def write(df: DataFrame, path: String, partitionCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(path)
  }

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
