package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Thin table-format seam between the pipeline and storage (SURVEY.md
  * §1.2): locally the engine commits plain parquet directories with
  * `_lineage.json` sidecars; a production deployment binds the same
  * three operations to an Iceberg catalog (read = table scan at a
  * snapshot, write = transactional commit, fingerprint = snapshot id)
  * WITHOUT touching Pipeline/Lineage call sites — everything above
  * this trait is format-agnostic DataFrame code.
  */
trait TableIO {
  /** Read the committed table at `path`. */
  def read(spark: SparkSession, path: String): DataFrame

  /** Commit `df` as the table at `path` (full overwrite — stages are
    * deterministic functions of their fingerprinted inputs). */
  def write(df: DataFrame, path: String): Unit

  /** Stable fingerprint of the table's current committed state: two
    * reads observe the same data iff fingerprints are equal (parquet:
    * path + sidecar content; Iceberg: snapshot id). Stages chain on
    * each other's fingerprints for resume. */
  def fingerprint(path: String): String
}

/** Local binding: parquet directories + `_lineage.json` sidecars. */
object ParquetTableIO extends TableIO {
  override def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  override def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  override def fingerprint(path: String): String =
    Lineage.dirFingerprint(path)
}
