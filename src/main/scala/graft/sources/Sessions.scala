package graft.sources

import org.apache.spark.sql.SparkSession

/** Session configuration for object-store-backed lakehouses — config
  * parity with the reference's MinIO/S3 wiring (`src/resources.py:97-102`:
  * endpoint + access/secret key + path-style access + the S3A
  * filesystem impl, all sourced from env vars).
  *
  * Only PUBLIC Hadoop S3A keys are used (`fs.s3a.*`, documented in
  * hadoop-aws). The helper sets configuration only — it does not require
  * the hadoop-aws jar on the classpath until an `s3a://` path is actually
  * read, so every operator keeps working against local paths unchanged
  * (all of graft is FS-agnostic: paths flow through
  * `Path.getFileSystem`, never a hardcoded scheme).
  */
object Sessions {

  /** Credentials + endpoint for an S3-compatible object store. */
  final case class ObjectStore(
      endpoint: String,
      accessKey: String,
      secretKey: String,
      pathStyleAccess: Boolean = true)

  /** Read the store config from the same env vars the reference uses
    * (`S3_ENDPOINT_URL`, `AWS_ACCESS_KEY_ID`, `AWS_SECRET_ACCESS_KEY`);
    * None when any is absent — the local-FS fallback.
    */
  def fromEnv(env: Map[String, String] = sys.env): Option[ObjectStore] =
    for {
      endpoint <- env.get("S3_ENDPOINT_URL")
      access <- env.get("AWS_ACCESS_KEY_ID")
      secret <- env.get("AWS_SECRET_ACCESS_KEY")
    } yield ObjectStore(endpoint, access, secret)

  /** The single source of truth for the S3A key/value pairs — both
    * config paths (builder-time and live-session) apply exactly this
    * list, so they can never diverge. Includes the scale hygiene keys:
    * bounded retries with fail-fast on credential errors beats the
    * default unbounded backoff when a 1000-executor job hits a
    * misconfigured endpoint.
    */
  private def s3aConf(s: ObjectStore): Seq[(String, String)] = Seq(
    "fs.s3a.endpoint" -> s.endpoint,
    "fs.s3a.access.key" -> s.accessKey,
    "fs.s3a.secret.key" -> s.secretKey,
    "fs.s3a.path.style.access" -> s.pathStyleAccess.toString,
    "fs.s3a.impl" -> "org.apache.hadoop.fs.s3a.S3AFileSystem",
    "fs.s3a.attempts.maximum" -> "3",
    "fs.s3a.connection.establish.timeout" -> "5000")

  /** Apply the store's S3A configuration to a session builder. Safe to
    * call with None (no-op): the session then resolves only local /
    * default-FS paths.
    */
  def forObjectStore(
      builder: SparkSession.Builder,
      store: Option[ObjectStore]): SparkSession.Builder =
    store.fold(builder) { s =>
      s3aConf(s).foldLeft(builder) { case (b, (k, v)) =>
        b.config(s"spark.hadoop.$k", v)
      }
    }

  /** Same keys applied to a LIVE session's Hadoop conf (per-job override
    * — e.g. Retention/Lakehouse maintenance pointed at a store while the
    * analytical session stays on the default FS).
    */
  def applyTo(spark: SparkSession, s: ObjectStore): Unit = {
    val hc = spark.sparkContext.hadoopConfiguration
    s3aConf(s).foreach { case (k, v) => hc.set(k, v) }
  }
}
